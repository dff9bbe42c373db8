"""Sparse Ising systems in ELL format: large-graph annealing on TPU.

The reference materializes a dense N^2 coupling matrix
(tsu/models/ising.py:64), capping it at tens of spins. Production-scale
optimization (100k-node MAX-CUT — BASELINE config 5) needs sparsity. ELL
(ELLPACK) is the TPU-friendly sparse layout: a fixed neighbor budget K per
site gives static shapes

    neighbor_idx: (N, K) int32   (padded with N -> gathers a zero slot)
    neighbor_w:   (N, K) float32 (zero-padded)

so local fields are one gather + weighted reduction — vectorizable, jittable,
shardable over the chains axis.

Update scheme: synchronous random-subset heat-bath. Each step draws an
independent Bernoulli(p_update) mask and resamples the masked sites from
their conditionals given the *current* neighbors. For p_update < 1 on sparse
graphs this is a close approximation to sequential Gibbs dynamics (adjacent
sites rarely co-update) and is the standard choice for annealed optimization
on SIMD hardware; for exact equilibrium sampling use the dense sampler or the
bipartite checkerboard kernel. Honest-metrics note: optimization results are
always reported as achieved objective values, never as samples from an
assumed equilibrium distribution.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def ell_from_edges(n: int, edges: np.ndarray, weights: np.ndarray,
                   k_max: int | None = None) -> Tuple[np.ndarray, np.ndarray]:
    """Build ELL arrays from an undirected edge list (E, 2) + weights (E,).

    Returns (neighbor_idx (N, K), neighbor_w (N, K)); K = max degree unless
    k_max is given (excess neighbors dropped by weight-magnitude rank).
    """
    adj = [[] for _ in range(n)]
    for (u, v), w in zip(np.asarray(edges), np.asarray(weights)):
        if u == v:
            continue
        adj[int(u)].append((int(v), float(w)))
        adj[int(v)].append((int(u), float(w)))
    deg = max((len(a) for a in adj), default=0)
    K = deg if k_max is None else min(deg, k_max)
    idx = np.full((n, K), n, dtype=np.int32)  # pad -> zero slot
    w = np.zeros((n, K), dtype=np.float32)
    for i, a in enumerate(adj):
        a = sorted(a, key=lambda t: -abs(t[1]))[:K]
        for k, (j, wj) in enumerate(a):
            idx[i, k] = j
            w[i, k] = wj
    return idx, w


@jax.jit
def ell_local_fields(state, neighbor_idx, neighbor_w, h):
    """(J s)_i + h_i with a padded gather; state (N,), returns (N,)."""
    padded = jnp.concatenate([state, jnp.zeros((1,), state.dtype)])
    nbr = padded[neighbor_idx]              # (N, K)
    return jnp.sum(neighbor_w * nbr, axis=1) + h


@jax.jit
def ell_energy(state, neighbor_idx, neighbor_w, h):
    """E(s) = -1/2 s^T J s - h^T s via local fields."""
    f = ell_local_fields(state, neighbor_idx, neighbor_w, jnp.zeros_like(h))
    return -0.5 * jnp.sum(state * f) - jnp.sum(h * state)


@partial(jax.jit, static_argnames=("n_steps", "n_chains", "p_update"))
def sparse_anneal(
    key,
    neighbor_idx,
    neighbor_w,
    h,
    schedule,
    *,
    n_steps: int,
    n_chains: int = 8,
    p_update: float = 0.5,
):
    """Anneal sparse Ising spins over a temperature schedule (n_steps,).

    Returns (best_state (N,), best_energy) over all chains/steps. Runs as one
    compiled scan; chains vmapped (shardable over the chains mesh axis).
    """
    N = neighbor_idx.shape[0]

    def chain(key, s0):
        def body(carry, inp):
            s, best_s, best_e = carry
            T, k = inp
            k_mask, k_flip = jax.random.split(k)
            fields = ell_local_fields(s, neighbor_idx, neighbor_w, h)
            p_up = jax.nn.sigmoid(2.0 * fields / T)
            u = jax.random.uniform(k_flip, (N,))
            proposal = jnp.where(u < p_up, 1.0, -1.0)
            mask = jax.random.bernoulli(k_mask, p_update, (N,))
            s = jnp.where(mask, proposal, s)
            e = ell_energy(s, neighbor_idx, neighbor_w, h)
            better = e < best_e
            best_s = jnp.where(better, s, best_s)
            best_e = jnp.minimum(e, best_e)
            return (s, best_s, best_e), None

        e0 = ell_energy(s0, neighbor_idx, neighbor_w, h)
        (s, best_s, best_e), _ = jax.lax.scan(
            body, (s0, s0, e0), (schedule, jax.random.split(key, n_steps))
        )
        return best_s, best_e

    k_init, k_run = jax.random.split(key)
    s0 = jnp.where(
        jax.random.bernoulli(k_init, 0.5, (n_chains, N)), 1.0, -1.0
    ).astype(jnp.float32)
    best_states, best_es = jax.vmap(chain)(jax.random.split(k_run, n_chains), s0)
    i = jnp.argmin(best_es)
    return best_states[i], best_es[i]


def maxcut_sparse(
    key,
    n: int,
    edges: np.ndarray,
    weights: np.ndarray,
    *,
    n_steps: int = 2000,
    n_chains: int = 8,
    T_initial: float = 3.0,
    T_final: float = 0.05,
) -> dict:
    """Anneal MAX-CUT on a sparse graph: J = -W (antiferromagnetic).

    Returns dict with spins, cut_value, energy. Scales to 100k+ nodes
    (memory O(N * K), not O(N^2)).
    """
    idx, w = ell_from_edges(n, edges, weights)
    w_ising = -w  # cut maximization == antiferro Ising ground state
    h = np.zeros(n, np.float32)
    schedule = jnp.asarray(
        T_initial * (T_final / T_initial) ** (np.arange(n_steps) / max(n_steps - 1, 1)),
        dtype=jnp.float32,
    )
    best_s, best_e = sparse_anneal(
        key, jnp.asarray(idx), jnp.asarray(w_ising), jnp.asarray(h), schedule,
        n_steps=n_steps, n_chains=n_chains,
    )
    s = np.asarray(best_s)
    # cut = 1/4 sum_ij W_ij (1 - s_i s_j) over the full symmetric W.
    w_total = float(np.sum(weights))          # sum over undirected edges
    bond = float(
        ell_energy(best_s, jnp.asarray(idx), jnp.asarray(w), jnp.zeros(n))
    )                                          # bond = -1/2 s^T W s
    sWs = -2.0 * bond                          # full symmetric quadratic form
    cut = 0.5 * w_total - 0.25 * sWs
    return {
        "spins": s,
        "cut_value": float(cut),
        "energy": float(best_e),
        "n_steps": n_steps,
    }
