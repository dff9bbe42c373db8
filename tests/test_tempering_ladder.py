"""Ladder construction + PT ground-state search (samplers/tempering_ladder).

The r4 finding these tests guard: a fixed geometric ladder that swaps
healthily at 8x8 accepts nothing at 256^2, because pair acceptance decays
with exp(-dbeta * dE) and dE is extensive. The builder must (a) hit its
target acceptance on the system it is given and (b) allocate more rungs to
larger systems; the ground-state driver must be exact on an enumerable
instance and resume bit-identically from a checkpoint.
"""

import os
import shutil
import tempfile

import jax
import jax.numpy as jnp

import numpy as np

import pytest

from tsu_tpu.ops.checkerboard_bonds import dense_from_bonds
from tsu_tpu.samplers.tempering import parallel_tempering_bonds
from tsu_tpu.samplers.tempering_ladder import (
    build_tempering_ladder,
    predict_swap_acceptance,
    pt_ground_state_search,
)


def _ea_instance(key, L):
    Jh = jnp.where(jax.random.bernoulli(jax.random.fold_in(key, 0), 0.5,
                                        (L, L)), 1.0, -1.0)
    Jv = jnp.where(jax.random.bernoulli(jax.random.fold_in(key, 1), 0.5,
                                        (L, L)), 1.0, -1.0)
    return Jh, Jv


def test_predict_acceptance_closed_form():
    # Mean energy decreasing in beta (as physics requires): acceptance
    # decays from ~1 monotonically with spacing. With equal means it would
    # floor at 0.5 (half of all fluctuation pairs are favorable) — the
    # decay below that is driven by the mean separation.
    def U(b):
        return -100.0 * b

    def V(b):
        return 400.0

    a0 = predict_swap_acceptance(1.0, 1.0 + 1e-6, U, V)
    assert a0 > 0.99
    spacings = [0.01, 0.05, 0.2, 1.0]
    accs = [predict_swap_acceptance(1.0, 1.0 + d, U, V) for d in spacings]
    assert all(a1 > a2 for a1, a2 in zip(accs, accs[1:]))
    assert 0.0 < accs[-1] < 0.01
    # Zero variance: pure mean shift, acceptance = exp(dbeta * dU).
    a = predict_swap_acceptance(1.0, 1.5, lambda b: -10.0 * b, lambda b: 0.0)
    assert a == pytest.approx(np.exp(-2.5), rel=1e-6)


def test_ladder_builder_hits_target_acceptance():
    key = jax.random.key(7)
    Jh, Jv = _ea_instance(key, 16)
    temps, info = build_tempering_ladder(
        jax.random.fold_in(key, 2), Jh, Jv, T_min=0.4, T_max=2.0,
        target_acceptance=0.3, accept_floor=0.2, n_pilot=8,
        pilot_burnin=32, pilot_measure=48, feedback_rounds=2,
        feedback_iters=64, feedback_burnin=16, pad_multiple=8)
    assert not info["capped"]
    assert np.all(np.diff(temps) > 0)
    assert temps[0] == pytest.approx(0.4, rel=1e-5)
    assert temps[-1] == pytest.approx(2.0, rel=1e-5)
    meas = info["measured_pair_acceptance"]
    assert meas is not None and len(meas) == len(temps) - 1
    # Every pair must exchange: the whole point of the builder. The floor
    # is asserted with slack for the finite attempt count (64 iters).
    assert meas.min() >= 0.1
    # Confirm on an independent PT run through the public driver.
    _, pt_info = parallel_tempering_bonds(
        jax.random.fold_in(key, 3), Jh, Jv, temperatures=temps,
        n_samples=64, n_burnin=16, swap_interval=1, n_sweeps=1)
    assert pt_info["pair_acceptance"].min() >= 0.08
    assert 0.1 <= pt_info["swap_acceptance_rate"] <= 0.9


def test_ladder_scales_with_system_size():
    key = jax.random.key(11)
    counts = {}
    for L in (8, 24):
        Jh, Jv = _ea_instance(jax.random.fold_in(key, L), L)
        temps, info = build_tempering_ladder(
            jax.random.fold_in(key, 100 + L), Jh, Jv, T_min=0.5, T_max=2.0,
            target_acceptance=0.3, n_pilot=8, pilot_burnin=32,
            pilot_measure=48, feedback_rounds=0, pad_multiple=8)
        counts[L] = info["n_rungs"]
    # dbeta ~ 1/sigma_E ~ 1/sqrt(N): 9x the sites must need more rungs.
    assert counts[24] > counts[8]


def test_pt_gs_exact_on_enumerable_instance():
    key = jax.random.key(3)
    Jh, Jv = _ea_instance(key, 4)
    # Brute-force ground energy over all 2^16 states.
    J = dense_from_bonds(Jh, Jv, periodic=True)
    n = 16
    bits = ((np.arange(2 ** n)[:, None] >> np.arange(n)[None, :]) & 1)
    s = 2.0 * bits - 1.0
    exact = float((-0.5 * np.einsum("bi,ij,bj->b", s, J, s)).min())
    out = pt_ground_state_search(
        jax.random.fold_in(key, 5), Jh, Jv,
        temperatures=np.geomspace(0.3, 2.0, 8),
        n_iters=150, n_sweeps=1, quench_sweeps=12)
    assert out["best_energy"] == pytest.approx(exact, abs=1e-3)
    # The returned state must actually have the returned energy.
    s_best = out["best_state"]
    e_check = -np.sum(np.asarray(Jh) * s_best * np.roll(s_best, -1, 1)) \
        - np.sum(np.asarray(Jv) * s_best * np.roll(s_best, -1, 0))
    assert e_check == pytest.approx(out["best_energy"], abs=1e-3)


def test_pt_gs_resume_bit_identical():
    key = jax.random.key(9)
    Jh, Jv = _ea_instance(key, 8)
    temps = np.geomspace(0.4, 2.0, 6)
    d = tempfile.mkdtemp()
    try:
        p = os.path.join(d, "ck")
        full = pt_ground_state_search(
            jax.random.fold_in(key, 1), Jh, Jv, temperatures=temps,
            n_iters=60, n_sweeps=1, quench_sweeps=6, chunk_iters=60)
        pt_ground_state_search(
            jax.random.fold_in(key, 1), Jh, Jv, temperatures=temps,
            n_iters=20, n_sweeps=1, quench_sweeps=0, chunk_iters=20,
            checkpoint_path=p)  # "killed" after 20 iterations
        resumed = pt_ground_state_search(
            jax.random.fold_in(key, 1), Jh, Jv, temperatures=temps,
            n_iters=60, n_sweeps=1, quench_sweeps=6, chunk_iters=20,
            checkpoint_path=p, resume=True)
        assert resumed["best_energy"] == full["best_energy"]
        assert np.array_equal(resumed["best_state"], full["best_state"])
        assert np.array_equal(resumed["pair_attempts"],
                              full["pair_attempts"])
        assert resumed["iters_run"] == 60
    finally:
        shutil.rmtree(d)


def test_pair_stats_identical_temperatures_always_swap():
    key = jax.random.key(13)
    Jh, Jv = _ea_instance(key, 8)
    _, info = parallel_tempering_bonds(
        jax.random.fold_in(key, 1), Jh, Jv,
        temperatures=np.array([1.0, 1.0, 1.0]),
        n_samples=32, n_burnin=8, swap_interval=1, n_sweeps=1)
    # dbeta = 0 -> Metropolis always accepts; per-pair stats must see it.
    assert info["pair_acceptance"].shape == (2,)
    assert np.all(info["pair_acceptance"] == 1.0)
    assert int(info["pair_attempts"].sum()) == info["swap_attempts"]


class TestHoudayer:
    """Isoenergetic cluster moves: exact E1+E2 conservation and correct
    connected-component extraction."""

    def _pair(self, key, L):
        s = jnp.where(jax.random.bernoulli(key, 0.5, (2, L, L)), 1.0, -1.0)
        from tsu_tpu.ops.checkerboard import split_checkerboard

        r, b = split_checkerboard(s)
        return (r[0:1], b[0:1], r[1:2], b[1:2])

    def test_total_energy_conserved_exactly(self):
        from tsu_tpu.ops.checkerboard import merge_checkerboard
        from tsu_tpu.ops.checkerboard_bonds import lattice_energy_bonds
        from tsu_tpu.samplers.tempering_ladder import houdayer_move

        key = jax.random.key(0)
        L = 16
        for periodic in (True, False):
            for trial in range(5):
                kk = jax.random.fold_in(key, 10 * periodic + trial)
                Jh = jnp.where(jax.random.bernoulli(
                    jax.random.fold_in(kk, 0), 0.5, (L, L)), 1.0, -1.0)
                Jv = jnp.where(jax.random.bernoulli(
                    jax.random.fold_in(kk, 1), 0.5, (L, L)), 1.0, -1.0)
                r1, b1, r2, b2 = self._pair(jax.random.fold_in(kk, 2), L)
                e_before = sum(
                    float(lattice_energy_bonds(
                        merge_checkerboard(r, b), Jh, Jv,
                        periodic=periodic)[0])
                    for r, b in ((r1, b1), (r2, b2)))
                r1n, b1n, r2n, b2n = houdayer_move(
                    jax.random.fold_in(kk, 3), r1, b1, r2, b2,
                    periodic=periodic)
                e_after = sum(
                    float(lattice_energy_bonds(
                        merge_checkerboard(r, b), Jh, Jv,
                        periodic=periodic)[0])
                    for r, b in ((r1n, b1n), (r2n, b2n)))
                assert e_after == pytest.approx(e_before, abs=1e-3)
                # Something actually moved (random 16^2 pairs always have
                # q = -1 sites).
                assert not np.array_equal(np.asarray(r1n), np.asarray(r1))

    def test_flips_exactly_one_connected_overlap_component(self):
        from scipy import ndimage

        from tsu_tpu.ops.checkerboard import (
            merge_checkerboard,
            split_checkerboard,
        )
        from tsu_tpu.samplers.tempering_ladder import houdayer_move

        key = jax.random.key(5)
        L = 16
        s1 = jnp.where(jax.random.bernoulli(
            jax.random.fold_in(key, 0), 0.5, (L, L)), 1.0, -1.0)
        s2 = jnp.where(jax.random.bernoulli(
            jax.random.fold_in(key, 1), 0.5, (L, L)), 1.0, -1.0)
        q_neg = np.asarray(s1 * s2) < 0
        r1, b1 = split_checkerboard(s1)
        r2, b2 = split_checkerboard(s2)
        r1n, b1n, r2n, b2n = houdayer_move(
            jax.random.fold_in(key, 2), r1[None], b1[None], r2[None],
            b2[None], periodic=False)
        flipped = np.asarray(
            merge_checkerboard(r1n[0], b1n[0]) != merge_checkerboard(r1, b1))
        # Flipped set is nonempty, within the q=-1 domain, and equals one
        # 4-connected component of it (open boundaries match ndimage).
        assert flipped.any()
        assert not (flipped & ~q_neg).any()
        labels, _ = ndimage.label(
            q_neg, structure=np.array([[0, 1, 0], [1, 1, 1], [0, 1, 0]]))
        flipped_labels = np.unique(labels[flipped])
        assert len(flipped_labels) == 1
        lab = flipped_labels[0]
        assert np.array_equal(flipped, labels == lab)
        # Both replicas flip the same set.
        flipped2 = np.asarray(
            merge_checkerboard(r2n[0], b2n[0]) != merge_checkerboard(r2, b2))
        assert np.array_equal(flipped, flipped2)

    def test_identical_replicas_are_noop(self):
        from tsu_tpu.samplers.tempering_ladder import houdayer_move

        key = jax.random.key(9)
        r1, b1, _, _ = self._pair(key, 8)
        r1n, b1n, r2n, b2n = houdayer_move(
            jax.random.fold_in(key, 1), r1, b1, r1, b1)
        assert np.array_equal(np.asarray(r1n), np.asarray(r1))
        assert np.array_equal(np.asarray(b1n), np.asarray(b1))

    def test_gs_search_with_houdayer_runs(self):
        key = jax.random.key(21)
        Jh, Jv = _ea_instance(key, 8)
        out = pt_ground_state_search(
            jax.random.fold_in(key, 1), Jh, Jv,
            temperatures=np.geomspace(0.4, 2.0, 6),
            n_iters=60, n_sweeps=1, n_copies=2, houdayer_every=5,
            quench_sweeps=6)
        assert out["houdayer_every"] == 5
        assert out["best_energy"] < 0
