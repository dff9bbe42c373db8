"""Host Wolff oracle (tsu_tpu/oracle/wolff.py): moment correctness vs exact
enumeration and the cluster-efficiency property the critical-ESS analysis
relies on (tau in sweep-equivalents stays O(1) at T_c while heat-bath tau
grows like L^z)."""

import numpy as np

from tsu_tpu.oracle import exact_ising_moments
from tsu_tpu.oracle.wolff import wolff_chain


def _torus_J(L):
    n = L * L
    J = np.zeros((n, n))
    for r in range(L):
        for c in range(L):
            i = r * L + c
            for rr, cc in ((r, (c + 1) % L), ((r + 1) % L, c)):
                j = rr * L + cc
                J[i, j] += 1.0
                J[j, i] += 1.0
    return J


def test_wolff_matches_exact_moments_4x4():
    L, T = 4, 2.5
    out = wolff_chain(0, L, T, n_steps=6000, n_burnin=300)
    ex = exact_ising_moments(_torus_J(L), np.zeros(L * L), temperature=T)
    assert abs(out["m_abs"].mean() - ex["abs_magnetization"]) < 0.03


def test_wolff_cluster_efficiency_at_tc():
    from tsu_tpu.ops.stats import effective_sample_size

    out = wolff_chain(1, 16, 2.269, n_steps=2000, n_burnin=200)
    n = len(out["m_abs"])
    tau_steps = n / (2.0 * effective_sample_size(out["m_abs"]))
    tau_sweq = tau_steps * out["sweep_equiv_per_step"]
    # Heat-bath tau(|M|) at L=16, T_c is ~27 sweeps (measured,
    # scripts/critical_ess.py quick row); Wolff must be O(1)
    # sweep-equivalents.
    assert tau_sweq < 8.0
    assert 0.0 < out["sweep_equiv_per_step"] <= 1.0
