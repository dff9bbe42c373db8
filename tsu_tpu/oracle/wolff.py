"""Host NumPy Wolff cluster sampler — the statistical-efficiency yardstick.

Single-spin-flip dynamics pay critical slowing down (tau ~ L^z, z ~= 2.2)
at T_c; Wolff cluster updates cut z to ~0.3 by flipping whole correlated
domains. This is a deliberately host-side reference (mask-based BFS over
NumPy): cluster growth is data-dependent and irregular — exactly the
shape of computation the checkerboard TPU kernel is NOT — and its purpose
is to MEASURE what cluster updates would buy at criticality so the
decision about building a TPU cluster kernel is quantitative
(scripts/critical_ess.py; docs/BENCHMARKS.md "Critical slowing down").

Correctness of the bond-percolation growth: each bond (i, j) is examined
at most once — from the side that enters the frontier first; the other
endpoint is already in the cluster by the time the reverse bond could be
tried — with independent activation draws at p_add = 1 - exp(-2J/T),
which is the Wolff prescription.
"""

from __future__ import annotations

import numpy as np


def wolff_chain(seed: int, L: int, T: float, n_steps: int,
                J: float = 1.0, n_burnin: int = 200):
    """Run n_steps Wolff cluster flips on an L x L periodic ferromagnet.

    Returns dict with per-step |m| series, mean cluster size, and the
    sweep-equivalent cost per step (cluster_size / N — the honest unit for
    comparing against per-sweep single-spin dynamics).
    """
    rng = np.random.default_rng(seed)
    s = np.ones((L, L), dtype=np.int8)
    p_add = 1.0 - np.exp(-2.0 * J / T)
    N = L * L
    m_abs = np.empty(n_steps, np.float64)
    sizes = np.empty(n_steps, np.float64)

    def step():
        r, c = rng.integers(L), rng.integers(L)
        target = s[r, c]
        in_cluster = np.zeros((L, L), dtype=bool)
        in_cluster[r, c] = True
        frontier = in_cluster.copy()
        while frontier.any():
            new = np.zeros((L, L), dtype=bool)
            for axis, shift in ((0, 1), (0, -1), (1, 1), (1, -1)):
                nb = np.roll(frontier, shift, axis=axis)
                cand = nb & (~in_cluster) & (s == target)
                # Independent draw per candidate bond.
                cand &= rng.random((L, L)) < p_add
                new |= cand
            in_cluster |= new
            frontier = new
        s[in_cluster] *= -1
        return in_cluster.sum()

    for _ in range(n_burnin):
        step()
    for t in range(n_steps):
        size = step()
        sizes[t] = size
        m_abs[t] = abs(float(s.sum())) / N
    return {
        "m_abs": m_abs,
        "mean_cluster_size": float(sizes.mean()),
        "sweep_equiv_per_step": float(sizes.mean()) / N,
        "final_state": s.copy(),
    }
