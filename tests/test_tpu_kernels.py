"""Real-TPU kernel tests: Pallas vs XLA statistical agreement.

Run with TSU_TEST_TPU=1 on a TPU host (skipped on the CPU mesh); these are the
on-hardware acceptance checks for the hot kernel (SURVEY.md §8.3 item 5).
"""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    not os.environ.get("TSU_TEST_TPU") or jax.default_backend() != "tpu",
    reason="requires TSU_TEST_TPU=1 and a TPU backend",
)


@pytest.mark.tpu
@pytest.mark.parametrize("periodic", [True, False])
def test_pallas_matches_xla_statistics(periodic):
    """Same lattice, same T: Pallas and XLA sweeps must agree on <|m|> and
    <e> within MC error (identical heat-bath semantics, different PRNGs)."""
    from tsu_tpu.ops.checkerboard import (
        checkerboard_sweeps_planes,
        lattice_energy_batch,
        merge_checkerboard,
        split_checkerboard,
    )
    from tsu_tpu.ops.checkerboard_pallas import checkerboard_sweeps_planes_pallas

    R = C = 128
    T = 3.0  # disordered: fast mixing
    n_samp = 60
    planes0 = split_checkerboard(jnp.ones((R, C), jnp.float32))

    def collect(step):
        red, black = step(0, *planes0, 30)  # burn-in
        ms, es = [], []
        for i in range(1, n_samp + 1):
            red, black = step(i, red, black, 2)
            lat = merge_checkerboard(red, black)
            ms.append(float(jnp.mean(lat)))
            es.append(float(lattice_energy_batch(lat, J=1.0, field=0.0,
                                                 periodic=periodic)) / (R * C))
        return np.abs(ms).mean(), np.mean(es)

    def xla_step(i, red, black, n):
        return checkerboard_sweeps_planes(
            jax.random.fold_in(jax.random.key(7), i), red, black, T, n,
            J=1.0, field=0.0, periodic=periodic,
        )

    def pallas_step(i, red, black, n):
        return checkerboard_sweeps_planes_pallas(
            jnp.int32(13 + i * 1_000_033), red, black, T, n,
            J=1.0, field=0.0, periodic=periodic,
        )

    m_x, e_x = collect(xla_step)
    m_p, e_p = collect(pallas_step)
    assert m_p == pytest.approx(m_x, abs=0.02)
    assert e_p == pytest.approx(e_x, abs=0.03)


@pytest.mark.tpu
def test_pallas_low_temperature_orders():
    from tsu_tpu.ops.checkerboard import merge_checkerboard, split_checkerboard
    from tsu_tpu.ops.checkerboard_pallas import checkerboard_sweeps_planes_pallas

    red, black = split_checkerboard(jnp.ones((64, 64), jnp.float32))
    red, black = checkerboard_sweeps_planes_pallas(
        jnp.int32(3), red, black, 0.5, 50, J=1.0, field=0.0, periodic=True
    )
    m = float(jnp.mean(merge_checkerboard(red, black)))
    assert abs(m) > 0.95


@pytest.mark.tpu
def test_pallas_bits_are_unbiased_at_infinite_temperature():
    """T -> inf: p_up = 1/2 exactly; sampled mean must be ~0 and spins must
    not be constant (regression test for the int32-shift PRNG sign bug)."""
    from tsu_tpu.ops.checkerboard import merge_checkerboard, split_checkerboard
    from tsu_tpu.ops.checkerboard_pallas import checkerboard_sweeps_planes_pallas

    red, black = split_checkerboard(jnp.ones((256, 256), jnp.float32))
    red, black = checkerboard_sweeps_planes_pallas(
        jnp.int32(11), red, black, 1e9, 2, J=1.0, field=0.0, periodic=True
    )
    lat = np.asarray(merge_checkerboard(red, black))
    assert abs(lat.mean()) < 0.02
    assert lat.std() > 0.9


@pytest.mark.tpu
def test_pallas_under_sharding_statistics():
    """Pallas kernel inside the row-sharded shard_map on real TPU (1-shard
    mesh on a single chip): physics must match the unsharded XLA path."""
    from tsu_tpu.ops.checkerboard import (
        lattice_energy_batch,
        merge_checkerboard,
        split_checkerboard,
    )
    from tsu_tpu.parallel import make_mesh
    from tsu_tpu.parallel.lattice import sharded_checkerboard_sweeps

    R = C = 128
    T = 3.0
    mesh = make_mesh(rows=1, devices=jax.devices()[:1])
    red, black = split_checkerboard(jnp.ones((R, C), jnp.float32))
    red, black = sharded_checkerboard_sweeps(
        mesh, jax.random.key(3), red, black, T, 60, periodic=True,
        use_pallas=True,
    )
    lat = merge_checkerboard(jnp.asarray(red), jnp.asarray(black))
    m = float(jnp.mean(lat))
    e = float(lattice_energy_batch(lat)) / (R * C)
    assert abs(m) < 0.1          # disordered at T=3
    assert -0.9 < e < -0.7       # e/site ~ -0.78 at T=3


@pytest.mark.tpu
def test_pallas_under_sharding_moments_match_xla():
    """Row-sharded shard_map + Pallas kernel + HARDWARE PRNG on a 1-shard
    TPU mesh: <|m|> and <e> must match the unsharded XLA path within MC
    error (r2 verdict #7 — the exact-equality sharded test runs injected
    uniforms only; this exercises ppermute + halfsweep_pallas + prng_seed
    together on the chip)."""
    from tsu_tpu.ops.checkerboard import (
        checkerboard_sweeps_planes,
        lattice_energy_batch,
        merge_checkerboard,
        split_checkerboard,
    )
    from tsu_tpu.parallel import make_mesh
    from tsu_tpu.parallel.lattice import sharded_checkerboard_sweeps

    R = C = 128
    T = 3.0
    n_samp = 60
    mesh = make_mesh(rows=1, devices=jax.devices()[:1])
    planes0 = split_checkerboard(jnp.ones((R, C), jnp.float32))

    def collect(step):
        red, black = step(0, *planes0, 30)
        ms, es = [], []
        for i in range(1, n_samp + 1):
            red, black = step(i, red, black, 2)
            lat = merge_checkerboard(jnp.asarray(red), jnp.asarray(black))
            ms.append(float(jnp.mean(lat)))
            es.append(float(lattice_energy_batch(lat)) / (R * C))
        return np.abs(ms).mean(), np.mean(es)

    def sharded_step(i, red, black, n):
        return sharded_checkerboard_sweeps(
            mesh, jax.random.fold_in(jax.random.key(11), i), red, black,
            T, n, periodic=True, use_pallas=True,
        )

    def xla_step(i, red, black, n):
        return checkerboard_sweeps_planes(
            jax.random.fold_in(jax.random.key(7), i), red, black, T, n,
            J=1.0, field=0.0, periodic=True,
        )

    m_s, e_s = collect(sharded_step)
    m_x, e_x = collect(xla_step)
    assert m_s == pytest.approx(m_x, abs=0.02)
    assert e_s == pytest.approx(e_x, abs=0.03)


@pytest.mark.tpu
def test_seed_schedule_streams_decorrelated():
    """The (base, sweep, color) seed components must yield independent PRNG
    streams. At T -> inf the output spin is literally one bit of each site's
    uniform, so pairwise plane correlations estimate stream correlation
    directly. Regression test for the r2 additive schedules, where
    (seed s+1, sweep k) replayed (seed s, sweep k+1) and shards collided
    after ~65 sweeps (ADVICE r2 #4, VERDICT r2 weak #7)."""
    from tsu_tpu.ops.checkerboard_pallas import halfsweep_pallas

    R, C2 = 128, 64
    other = jnp.ones((R, C2), jnp.float32)
    up, down = other[-1:, :], other[:1, :]

    def plane(base, sweep, color):
        out = halfsweep_pallas(
            jnp.asarray([base, sweep, color], jnp.int32), 1e9, other, up,
            down, update_red=True, J=1.0, field=0.0, periodic=True,
        )
        return np.asarray(out).ravel()

    # Pairs that collided under the old arithmetic schedules, plus controls.
    combos = [(0, 0, 0), (0, 0, 1), (0, 1, 0), (1, 0, 0), (0, 66, 0),
              (131, 0, 0), (65537, 0, 0)]
    planes = [plane(*c) for c in combos]
    n = planes[0].size
    for a in range(len(planes)):
        for b in range(a + 1, len(planes)):
            corr = float(np.mean(planes[a] * planes[b]))
            # MC error ~ 1/sqrt(8192) ~ 0.011; identical streams give 1.0.
            assert abs(corr) < 0.06, (combos[a], combos[b], corr)
    # Determinism: the same seed vector replays the same stream.
    assert np.array_equal(planes[0], plane(0, 0, 0))


@pytest.mark.tpu
def test_pallas_col_halo_mode_statistics_on_chip():
    """The kernel's col_halo mode (2-D sharding) with the HARDWARE PRNG on a
    1x1 mesh: physics must match the unsharded XLA path within MC error
    (the interpret-mode exact test covers halo correctness; this covers the
    Mosaic compile + PRNG of the col_halo variant on the chip)."""
    from tsu_tpu.ops.checkerboard import (
        checkerboard_sweeps_planes,
        lattice_energy_batch,
        merge_checkerboard,
        split_checkerboard,
    )
    from tsu_tpu.parallel import make_mesh
    from tsu_tpu.parallel.lattice import sharded_checkerboard_sweeps

    R = C = 128
    T = 3.0
    n_samp = 60
    mesh = make_mesh(rows=1, cols=1, devices=jax.devices()[:1])
    planes0 = split_checkerboard(jnp.ones((R, C), jnp.float32))

    def collect(step):
        red, black = step(0, *planes0, 30)
        ms, es = [], []
        for i in range(1, n_samp + 1):
            red, black = step(i, red, black, 2)
            lat = merge_checkerboard(jnp.asarray(red), jnp.asarray(black))
            ms.append(float(jnp.mean(lat)))
            es.append(float(lattice_energy_batch(lat)) / (R * C))
        return np.abs(ms).mean(), np.mean(es)

    def sharded_step(i, red, black, n):
        return sharded_checkerboard_sweeps(
            mesh, jax.random.fold_in(jax.random.key(21), i), red, black,
            T, n, periodic=True, use_pallas=True, col_axis="col",
        )

    def xla_step(i, red, black, n):
        return checkerboard_sweeps_planes(
            jax.random.fold_in(jax.random.key(7), i), red, black, T, n,
            J=1.0, field=0.0, periodic=True,
        )

    m_s, e_s = collect(sharded_step)
    m_x, e_x = collect(xla_step)
    assert m_s == pytest.approx(m_x, abs=0.02)
    assert e_s == pytest.approx(e_x, abs=0.03)


@pytest.mark.tpu
def test_fused_batched_distinct_streams_and_physics():
    """Batched ensemble kernel on hardware: per-lattice seeds decorrelate
    the streams (interpret mode cannot test this — its PRNG ignores the
    seed), and every ensemble member's magnetization tracks its own
    temperature across the transition."""
    from tsu_tpu.ops.checkerboard import merge_checkerboard, split_checkerboard
    from tsu_tpu.ops.checkerboard_fused import fused_sweeps_batched

    B, R, C = 4, 256, 256
    lats = jnp.ones((B, R, C), jnp.bfloat16)
    reds, blacks = jax.vmap(split_checkerboard)(lats)
    # Two lattices share T=1.5 (ordered), two at T=3.5 (disordered).
    Ts = jnp.array([1.5, 1.5, 3.5, 3.5], jnp.float32)
    seeds = jnp.array([11, 22, 33, 44], jnp.int32)
    reds, blacks = fused_sweeps_batched(seeds, reds, blacks, Ts, 300,
                                        periodic=True)
    lat = jax.vmap(merge_checkerboard)(reds.astype(jnp.float32),
                                       blacks.astype(jnp.float32))
    m = np.asarray(jnp.mean(lat, axis=(1, 2)))
    # Same T, different seeds: different configurations.
    assert not np.array_equal(np.asarray(lat[0]), np.asarray(lat[1]))
    # Physics per member.
    assert abs(m[0]) > 0.9 and abs(m[1]) > 0.9, m
    assert abs(m[2]) < 0.2 and abs(m[3]) < 0.2, m
