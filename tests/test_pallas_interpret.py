"""Pallas kernel semantics on the CPU mesh via TPU-interpret mode.

r1 weakness #4: every kernel test skipped off-TPU, so a semantic regression
in the flagship kernels would land green. These tests run the *actual kernel
code* under ``pltpu.force_tpu_interpret_mode()`` with caller-injected
uniforms (the hardware PRNG has no interpret-mode implementation) and demand
EXACT equality against independent full-lattice oracles built on the XLA
helpers — covering neighbor gather, row parity, halo splicing, open-boundary
masking, threshold tables, and multi-block/band wiring.

The multi-band fused case is also the regression test for boundary-row
consistency: the black update at a band boundary must condition on exactly
the red row stored by the neighboring band (same uniforms), not a re-drawn
phantom copy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from tsu_tpu.ops.checkerboard import (
    neighbor_sum_half_halo,
    split_checkerboard,
    wrap_halos,
)

_U24_SCALE = 1.0 / 16777216.0


def _random_planes(key, R, C):
    lat = jnp.where(jax.random.bernoulli(key, 0.5, (R, C)), 1.0, -1.0)
    return split_checkerboard(lat)


def _oracle_halfstep_u24(other, update_red, u24, periodic, T, J, field):
    """Exact-sigmoid heat-bath halfstep thresholded on injected u24 uniforms
    (mirrors _halfsweep_kernel's arithmetic bit-for-bit)."""
    up, down = wrap_halos(other, periodic)
    nbr = neighbor_sum_half_halo(other, up, down, update_red, periodic)
    p = jax.nn.sigmoid(2.0 * (J * nbr + field) / T)
    u = u24.astype(jnp.float32) * _U24_SCALE
    return jnp.where(u < p, 1.0, -1.0)


def _oracle_halfstep_table(other, update_red, u16, periodic, table):
    """Quantized-table heat-bath halfstep (mirrors the fused kernel)."""
    up, down = wrap_halos(other, periodic)
    nbr = neighbor_sum_half_halo(other, up, down, update_red, periodic)
    thresh = table[nbr.astype(jnp.int32) + 4]
    return jnp.where(u16 < thresh, 1.0, -1.0)


@pytest.mark.parametrize("periodic", [True, False])
@pytest.mark.parametrize("block_rows", [None, 8])
def test_halfsweep_kernel_exact(periodic, block_rows):
    from tsu_tpu.ops.checkerboard_pallas import checkerboard_sweeps_planes_pallas

    R = C = 32
    red, black = _random_planes(jax.random.key(0), R, C)
    n_sweeps, T, J, field = 3, 2.269, 1.0, 0.1
    U = jax.random.randint(jax.random.key(1), (n_sweeps, 2, R, C // 2),
                           0, 1 << 24, jnp.int32)

    r_o, b_o = red, black
    for s in range(n_sweeps):
        r_o = _oracle_halfstep_u24(b_o, True, U[s, 0], periodic, T, J, field)
        b_o = _oracle_halfstep_u24(r_o, False, U[s, 1], periodic, T, J, field)

    with pltpu.force_tpu_interpret_mode():
        r_k, b_k = checkerboard_sweeps_planes_pallas(
            jnp.int32(0), red, black, T, n_sweeps, J=J, field=field,
            periodic=periodic, uniforms=U, block_rows=block_rows,
        )
    assert jnp.array_equal(r_o, r_k)
    assert jnp.array_equal(b_o, b_k)


@pytest.mark.parametrize("periodic", [True, False])
@pytest.mark.parametrize("band_rows", [None, 8])
def test_fused_kernel_exact(periodic, band_rows):
    """band_rows=8 runs 4 bands on a 32-row lattice: black rows at every
    band boundary must match the oracle (which conditions on the one global
    red plane) exactly — catches any phantom-redraw inconsistency."""
    from tsu_tpu.ops.checkerboard_fused import fused_sweeps, sigmoid_table16

    R = C = 32
    red, black = _random_planes(jax.random.key(2), R, C)
    n_sweeps, T, J, field = 3, 2.269, 1.0, 0.1
    U = jax.random.randint(jax.random.key(3), (n_sweeps, 2, R, C // 2),
                           0, 1 << 16, jnp.int32)
    table = sigmoid_table16(J, field, T)

    r_o, b_o = red, black
    for s in range(n_sweeps):
        r_o = _oracle_halfstep_table(b_o, True, U[s, 0], periodic, table)
        b_o = _oracle_halfstep_table(r_o, False, U[s, 1], periodic, table)

    with pltpu.force_tpu_interpret_mode():
        r_k, b_k = fused_sweeps(
            jnp.int32(0), red, black, T, n_sweeps, J=J, field=field,
            periodic=periodic, uniforms=U, band_rows=band_rows,
        )
    assert jnp.array_equal(r_o, r_k)
    assert jnp.array_equal(b_o, b_k)


def test_fused_kernel_bf16_exact():
    """bf16 spin storage must not change the sampled configuration."""
    from tsu_tpu.ops.checkerboard_fused import fused_sweeps, sigmoid_table16

    R = C = 16
    red, black = _random_planes(jax.random.key(4), R, C)
    T = 2.5
    U = jax.random.randint(jax.random.key(5), (2, 2, R, C // 2),
                           0, 1 << 16, jnp.int32)
    table = sigmoid_table16(1.0, 0.0, T)

    r_o, b_o = red, black
    for s in range(2):
        r_o = _oracle_halfstep_table(b_o, True, U[s, 0], True, table)
        b_o = _oracle_halfstep_table(r_o, False, U[s, 1], True, table)

    with pltpu.force_tpu_interpret_mode():
        r_k, b_k = fused_sweeps(
            jnp.int32(0), red.astype(jnp.bfloat16), black.astype(jnp.bfloat16),
            T, 2, J=1.0, field=0.0, periodic=True, uniforms=U, band_rows=8,
        )
    assert jnp.array_equal(r_o, r_k.astype(jnp.float32))
    assert jnp.array_equal(b_o, b_k.astype(jnp.float32))


def test_biased_field_pushes_up():
    """Directional sanity through the real kernel: a strong +field with
    mid-scale uniforms must produce all-up spins (table orientation)."""
    from tsu_tpu.ops.checkerboard_fused import fused_sweeps

    R = C = 16
    red, black = _random_planes(jax.random.key(6), R, C)
    # u = 2^15 == p threshold 0.5: any p_up > 0.5 + eps flips the site up.
    U = jnp.full((1, 2, R, C // 2), 1 << 15, jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        r_k, b_k = fused_sweeps(
            jnp.int32(0), red, black, 1.0, 1, J=0.0, field=5.0,
            periodic=True, uniforms=U,
        )
    assert float(jnp.mean(r_k)) == 1.0
    assert float(jnp.mean(b_k)) == 1.0


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 virtual devices")
@pytest.mark.parametrize("periodic", [True, False])
def test_pallas_under_row_sharding_exact(periodic):
    """The flagship kernel inside the flagship sharding (r1 weakness #10:
    they never ran together): halfsweep_pallas inside the row-sharded
    shard_map, with ppermute halo exchange, must reproduce the full-lattice
    oracle exactly given the same injected uniforms."""
    from tsu_tpu.parallel import make_mesh
    from tsu_tpu.parallel.lattice import sharded_checkerboard_sweeps

    R = C = 16
    red, black = _random_planes(jax.random.key(0), R, C)
    n_sweeps, T, J, field = 2, 2.269, 1.0, 0.0
    U = jax.random.randint(jax.random.key(1), (n_sweeps, 2, R, C // 2),
                           0, 1 << 24, jnp.int32)

    r_o, b_o = red, black
    for s in range(n_sweeps):
        r_o = _oracle_halfstep_u24(b_o, True, U[s, 0], periodic, T, J, field)
        b_o = _oracle_halfstep_u24(r_o, False, U[s, 1], periodic, T, J, field)

    mesh = make_mesh(rows=4)
    with pltpu.force_tpu_interpret_mode():
        r_k, b_k = sharded_checkerboard_sweeps(
            mesh, jax.random.key(9), red, black, T, n_sweeps,
            J=J, field=field, periodic=periodic, use_pallas=True, uniforms=U,
        )
    assert jnp.array_equal(r_o, jnp.asarray(r_k))
    assert jnp.array_equal(b_o, jnp.asarray(b_k))


@pytest.mark.parametrize("periodic", [True, False])
def test_bond_kernel_exact(periodic):
    """Per-bond Pallas kernel vs the XLA bond-engine arithmetic, exact
    equality on injected uniforms (random couplings + random field)."""
    from tsu_tpu.ops.checkerboard_bonds import (
        _neighbor_values,
        color_bond_weights,
    )
    from tsu_tpu.ops.checkerboard_bonds_pallas import (
        checkerboard_sweeps_bonds_pallas,
    )

    R = C = 16
    T = 1.5
    rng = np.random.default_rng(0)
    red, black = _random_planes(jax.random.key(0), R, C)
    n_sweeps = 2
    U = jax.random.randint(jax.random.key(1), (n_sweeps, 2, R, C // 2),
                           0, 1 << 24, jnp.int32)
    Jh = rng.normal(0, 1, (R, C)).astype(np.float32)
    Jv = rng.normal(0, 1, (R, C)).astype(np.float32)
    field = rng.normal(0, 0.3, (R, C)).astype(np.float32)
    weights = color_bond_weights(Jh, Jv, field, periodic)

    def oracle_half(other, w, update_red, u24):
        if periodic:
            up_row, down_row = other[-1:, :], other[:1, :]
        else:
            z = jnp.zeros_like(other[:1, :])
            up_row, down_row = z, z
        wu, wd, wl, wr, f = w
        up, down, left, right = _neighbor_values(other, up_row, down_row,
                                                 update_red)
        local = wu * up + wd * down + wl * left + wr * right + f
        p = jax.nn.sigmoid(2.0 * local / T)
        return jnp.where(u24.astype(jnp.float32) * _U24_SCALE < p, 1.0, -1.0)

    r_o, b_o = red, black
    for s in range(n_sweeps):
        r_o = oracle_half(b_o, weights["red"], True, U[s, 0])
        b_o = oracle_half(r_o, weights["black"], False, U[s, 1])

    with pltpu.force_tpu_interpret_mode():
        r_k, b_k = checkerboard_sweeps_bonds_pallas(
            jnp.int32(0), red, black, weights, T, n_sweeps,
            periodic=periodic, uniforms=U, block_rows=8,
        )
    assert jnp.array_equal(r_o, r_k)
    assert jnp.array_equal(b_o, b_k)


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 virtual devices")
@pytest.mark.parametrize("periodic", [True, False])
def test_pallas_under_2d_sharding_exact(periodic):
    """halfsweep_pallas in its col_halo mode inside the 2-D (row x col)
    shard_map: four-sided ppermute halos + the kernel must reproduce the
    full-lattice oracle exactly on injected uniforms (closes the r2
    exclusion 'pallas path supports row sharding only',
    parallel/lattice.py)."""
    from tsu_tpu.parallel import make_mesh
    from tsu_tpu.parallel.lattice import sharded_checkerboard_sweeps

    R = C = 16
    red, black = _random_planes(jax.random.key(2), R, C)
    n_sweeps, T, J, field = 2, 2.269, 1.0, 0.0
    U = jax.random.randint(jax.random.key(3), (n_sweeps, 2, R, C // 2),
                           0, 1 << 24, jnp.int32)

    r_o, b_o = red, black
    for s in range(n_sweeps):
        r_o = _oracle_halfstep_u24(b_o, True, U[s, 0], periodic, T, J, field)
        b_o = _oracle_halfstep_u24(r_o, False, U[s, 1], periodic, T, J, field)

    mesh = make_mesh(rows=2, cols=2)
    with pltpu.force_tpu_interpret_mode():
        r_k, b_k = sharded_checkerboard_sweeps(
            mesh, jax.random.key(9), red, black, T, n_sweeps,
            J=J, field=field, periodic=periodic, use_pallas=True,
            col_axis="col", uniforms=U,
        )
    assert jnp.array_equal(r_o, jnp.asarray(r_k))
    assert jnp.array_equal(b_o, jnp.asarray(b_k))


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs >=4 virtual devices")
@pytest.mark.parametrize("periodic", [True, False])
@pytest.mark.parametrize("n_shards", [2, 4])
def test_fused_under_row_sharding_exact(periodic, n_shards):
    """The FUSED kernel inside the row-sharded shard_map (the production
    sharded path since r4): 2-row ppermute halo exchange + per-shard global
    row-group offsets must reproduce the full-lattice fused oracle exactly
    on injected uniforms — shard boundaries must be indistinguishable from
    in-shard band boundaries (r3 verdict #1)."""
    from tsu_tpu.ops.checkerboard_fused import sigmoid_table16
    from tsu_tpu.parallel import make_mesh
    from tsu_tpu.parallel.lattice import sharded_checkerboard_sweeps

    R = C = 32
    red, black = _random_planes(jax.random.key(7), R, C)
    n_sweeps, T, J, field = 2, 2.269, 1.0, 0.1
    U = jax.random.randint(jax.random.key(8), (n_sweeps, 2, R, C // 2),
                           0, 1 << 16, jnp.int32)
    table = sigmoid_table16(J, field, T)

    r_o, b_o = red, black
    for s in range(n_sweeps):
        r_o = _oracle_halfstep_table(b_o, True, U[s, 0], periodic, table)
        b_o = _oracle_halfstep_table(r_o, False, U[s, 1], periodic, table)

    mesh = make_mesh(rows=n_shards)
    with pltpu.force_tpu_interpret_mode():
        r_k, b_k = sharded_checkerboard_sweeps(
            mesh, jax.random.key(9), red, black, T, n_sweeps,
            J=J, field=field, periodic=periodic, use_pallas=True,
            uniforms=U, fused=True,
        )
    assert jnp.array_equal(r_o, jnp.asarray(r_k))
    assert jnp.array_equal(b_o, jnp.asarray(b_k))


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >=2 virtual devices")
def test_fused_sharded_bf16_matches_f32():
    """The production configuration (fused + bf16 planes) must sample the
    identical configuration as f32 storage under sharding."""
    from tsu_tpu.parallel import make_mesh
    from tsu_tpu.parallel.lattice import sharded_checkerboard_sweeps

    R = C = 16
    red, black = _random_planes(jax.random.key(10), R, C)
    U = jax.random.randint(jax.random.key(11), (2, 2, R, C // 2),
                           0, 1 << 16, jnp.int32)
    mesh = make_mesh(rows=2)
    with pltpu.force_tpu_interpret_mode():
        r32, b32 = sharded_checkerboard_sweeps(
            mesh, jax.random.key(12), red, black, 2.5, 2,
            periodic=True, use_pallas=True, uniforms=U, fused=True,
        )
        r16, b16 = sharded_checkerboard_sweeps(
            mesh, jax.random.key(12), red.astype(jnp.bfloat16),
            black.astype(jnp.bfloat16), 2.5, 2,
            periodic=True, use_pallas=True, uniforms=U, fused=True,
        )
    assert jnp.array_equal(jnp.asarray(r32), jnp.asarray(r16).astype(jnp.float32))
    assert jnp.array_equal(jnp.asarray(b32), jnp.asarray(b16).astype(jnp.float32))


def test_bond_kernel_bf16_weights_exact():
    """bf16 weight planes (+-J exact in bf16) must sample the identical
    configuration as f32 weights — the EA kernel's bandwidth-roofline
    configuration (r3 verdict #5)."""
    from tsu_tpu.ops.checkerboard_bonds import color_bond_weights
    from tsu_tpu.ops.checkerboard_bonds_pallas import (
        checkerboard_sweeps_bonds_pallas,
    )

    R = C = 16
    key = jax.random.key(20)
    Jh = jnp.where(jax.random.bernoulli(jax.random.fold_in(key, 0), 0.5,
                                        (R, C)), 1.0, -1.0)
    Jv = jnp.where(jax.random.bernoulli(jax.random.fold_in(key, 1), 0.5,
                                        (R, C)), 1.0, -1.0)
    weights = color_bond_weights(Jh, Jv, 0.0, periodic=True)
    weights16 = {
        color: tuple(jnp.asarray(w, jnp.bfloat16) for w in planes)
        for color, planes in weights.items()
    }
    red, black = _random_planes(jax.random.key(21), R, C)
    U = jax.random.randint(jax.random.key(22), (2, 2, R, C // 2),
                           0, 1 << 24, jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        r32, b32 = checkerboard_sweeps_bonds_pallas(
            jnp.int32(0), red, black, weights, 1.5, 2, periodic=True,
            uniforms=U,
        )
        r16, b16 = checkerboard_sweeps_bonds_pallas(
            jnp.int32(0), red.astype(jnp.bfloat16),
            black.astype(jnp.bfloat16), weights16, 1.5, 2, periodic=True,
            uniforms=U,
        )
    assert jnp.array_equal(jnp.asarray(r32), jnp.asarray(r16).astype(jnp.float32))
    assert jnp.array_equal(jnp.asarray(b32), jnp.asarray(b16).astype(jnp.float32))


@pytest.mark.parametrize("periodic", [True, False])
def test_bond_kernel_discrete_table_exact(periodic):
    """The +-J discrete fast path (int24 threshold table instead of a
    per-site sigmoid) must reproduce the table-thresholded oracle exactly
    — including odd local-field values at open boundaries."""
    from tsu_tpu.ops.checkerboard_bonds import (
        _neighbor_values,
        color_bond_weights,
    )
    from tsu_tpu.ops.checkerboard_bonds_pallas import (
        checkerboard_sweeps_bonds_pallas,
    )
    from tsu_tpu.ops.checkerboard_fused import sigmoid_table

    R = C = 16
    T = 1.3
    key = jax.random.key(30)
    Jh = jnp.where(jax.random.bernoulli(jax.random.fold_in(key, 0), 0.5,
                                        (R, C)), 1.0, -1.0)
    Jv = jnp.where(jax.random.bernoulli(jax.random.fold_in(key, 1), 0.5,
                                        (R, C)), 1.0, -1.0)
    weights = color_bond_weights(Jh, Jv, 0.0, periodic=periodic)
    weights16 = {
        color: tuple(jnp.asarray(w, jnp.bfloat16) for w in planes)
        for color, planes in weights.items()
    }
    red, black = _random_planes(jax.random.key(31), R, C)
    n_sweeps = 2
    U = jax.random.randint(jax.random.key(32), (n_sweeps, 2, R, C // 2),
                           0, 1 << 24, jnp.int32)
    table = sigmoid_table(1.0, 0.0, T)

    def oracle_half(other, color_w, update_red, u24):
        if periodic:
            up_row, down_row = other[-1:, :], other[:1, :]
        else:
            z = jnp.zeros_like(other[:1, :])
            up_row, down_row = z, z
        wu, wd, wl, wr, f = (jnp.asarray(w, jnp.float32) for w in color_w)
        up, dn, lf, rt = _neighbor_values(other, up_row, down_row, update_red)
        local = wu * up + wd * dn + wl * lf + wr * rt + f
        thresh = table[local.astype(jnp.int32) + 4]
        return jnp.where(u24 < thresh, 1.0, -1.0)

    r_o, b_o = red, black
    for s in range(n_sweeps):
        r_o = oracle_half(b_o, weights["red"], True, U[s, 0])
        b_o = oracle_half(r_o, weights["black"], False, U[s, 1])

    with pltpu.force_tpu_interpret_mode():
        r_k, b_k = checkerboard_sweeps_bonds_pallas(
            jnp.int32(0), red.astype(jnp.bfloat16),
            black.astype(jnp.bfloat16), weights16, T, n_sweeps,
            periodic=periodic, uniforms=U, discrete=True,
        )
    assert jnp.array_equal(r_o, jnp.asarray(r_k).astype(jnp.float32))
    assert jnp.array_equal(b_o, jnp.asarray(b_k).astype(jnp.float32))


@pytest.mark.parametrize("periodic", [True, False])
def test_fused_batched_matches_unbatched(periodic):
    """The batched ensemble kernel (grid (B, bands), per-lattice SMEM
    seed/table rows) must reproduce the unbatched fused kernel
    BIT-IDENTICALLY per element, each lattice at its own temperature.

    Covers the batched band math, halo tiles, and per-lattice table
    indexing. NOTE: interpret-mode prng_random_bits ignores the seed
    (verified empirically), so per-lattice stream distinctness is asserted
    on real hardware instead (tests/test_tpu_kernels.py)."""
    from tsu_tpu.ops.checkerboard_fused import (
        fused_sweeps,
        fused_sweeps_batched,
    )

    B, R, C = 3, 16, 16
    key = jax.random.key(40)
    lats = jnp.where(jax.random.bernoulli(key, 0.5, (B, R, C)), 1.0, -1.0)
    reds, blacks = jax.vmap(split_checkerboard)(lats)
    Ts = jnp.array([1.8, 2.269, 3.2], jnp.float32)
    seeds = jnp.array([101, 202, 303], jnp.int32)
    n_sweeps = 2

    with pltpu.force_tpu_interpret_mode():
        rb, bb = fused_sweeps_batched(
            seeds, reds, blacks, Ts, n_sweeps, periodic=periodic,
            band_rows=8,
        )
        for b in range(B):
            r1, b1 = fused_sweeps(
                seeds[b], reds[b], blacks[b], Ts[b], n_sweeps,
                periodic=periodic, band_rows=8,
            )
            assert jnp.array_equal(jnp.asarray(r1), jnp.asarray(rb[b])), b
            assert jnp.array_equal(jnp.asarray(b1), jnp.asarray(bb[b])), b



def test_fused_sweeps_temperature_schedule_exact():
    """fused_sweeps with an (n_sweeps,) temperature SCHEDULE must equal
    per-sweep single-temperature calls (annealing support, r4)."""
    from tsu_tpu.ops.checkerboard_fused import fused_sweep_pallas, fused_sweeps

    R = C = 16
    red, black = _random_planes(jax.random.key(50), R, C)
    Ts = jnp.array([4.0, 2.0, 0.5], jnp.float32)
    U = jax.random.randint(jax.random.key(51), (3, 2, R, C // 2),
                           0, 1 << 16, jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        r_s, b_s = fused_sweeps(jnp.int32(5), red, black, Ts, 3,
                                uniforms=U, band_rows=8)
        r_m, b_m = red, black
        for k in range(3):
            r_m, b_m = fused_sweep_pallas(
                jnp.stack([jnp.int32(5), jnp.int32(k)]), r_m, b_m, Ts[k],
                uniforms=U[k], band_rows=8,
            )
    assert jnp.array_equal(jnp.asarray(r_s), jnp.asarray(r_m))
    assert jnp.array_equal(jnp.asarray(b_s), jnp.asarray(b_m))


def test_fused_sweeps_batched_accepts_seed_rows():
    """(B, 2) seed rows must behave exactly like (B,) seeds (the second
    column is ignored; an r4 review caught reshape(-1) interleaving them
    into colliding streams)."""
    from tsu_tpu.ops.checkerboard_fused import fused_sweeps_batched

    B, R, C = 2, 16, 16
    lats = jnp.ones((B, R, C))
    reds, blacks = jax.vmap(split_checkerboard)(lats)
    seeds = jnp.array([7, 8], jnp.int32)
    rows = jnp.stack([seeds, jnp.array([99, 77], jnp.int32)], axis=1)
    Ts = jnp.array([2.6, 2.6], jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        r1, b1 = fused_sweeps_batched(seeds, reds, blacks, Ts, 2, band_rows=8)
        r2, b2 = fused_sweeps_batched(rows, reds, blacks, Ts, 2, band_rows=8)
    assert jnp.array_equal(jnp.asarray(r1), jnp.asarray(r2))
    assert jnp.array_equal(jnp.asarray(b1), jnp.asarray(b2))


@pytest.mark.parametrize("discrete", [False, True])
def test_bond_batched_matches_unbatched(discrete):
    """The batched bond kernel (shared disorder, per-replica temperature,
    grid (B, blocks)) must reproduce the unbatched bond kernel per replica
    in interpret mode (same seedless interpret PRNG on both sides — this
    validates band math, shared-weight block indexing, and the per-replica
    table rows; stream distinctness is hardware-tested)."""
    from tsu_tpu.ops.checkerboard_bonds import color_bond_weights
    from tsu_tpu.ops.checkerboard_bonds_pallas import (
        checkerboard_sweeps_bonds_batched,
        checkerboard_sweeps_bonds_pallas,
    )

    B, R, C = 3, 16, 16
    key = jax.random.key(60)
    Jh = jnp.where(jax.random.bernoulli(jax.random.fold_in(key, 0), 0.5,
                                        (R, C)), 1.0, -1.0)
    Jv = jnp.where(jax.random.bernoulli(jax.random.fold_in(key, 1), 0.5,
                                        (R, C)), 1.0, -1.0)
    weights = color_bond_weights(Jh, Jv, 0.0, periodic=True)
    lats = jnp.where(jax.random.bernoulli(jax.random.fold_in(key, 2), 0.5,
                                          (B, R, C)), 1.0, -1.0)
    reds, blacks = jax.vmap(split_checkerboard)(lats)
    Ts = jnp.array([0.8, 1.5, 3.0], jnp.float32)
    seeds = jnp.array([11, 22, 33], jnp.int32)

    with pltpu.force_tpu_interpret_mode():
        rb, bb = checkerboard_sweeps_bonds_batched(
            seeds, reds, blacks, weights, Ts, 2, periodic=True,
            discrete=discrete,
        )
        for b in range(B):
            # Unbatched reference at the same temperature. The interpret
            # PRNG ignores seeds, so per-block draws coincide and equality
            # is exact.
            r1, b1 = checkerboard_sweeps_bonds_pallas(
                jnp.int32(int(seeds[b])), reds[b], blacks[b], weights,
                Ts[b], 2, periodic=True, discrete=discrete,
            )
            assert jnp.array_equal(jnp.asarray(r1), jnp.asarray(rb[b])), b
            assert jnp.array_equal(jnp.asarray(b1), jnp.asarray(bb[b])), b


@pytest.mark.parametrize("periodic", [True, False])
def test_bond_kernel_packed_codes_exact(periodic):
    """The packed-code discrete path (ONE bf16 code plane instead of five
    weight planes — the r5 bandwidth optimization) must reproduce the
    unpacked discrete kernel bit-for-bit under injected uniforms."""
    from tsu_tpu.ops.checkerboard_bonds import (
        color_bond_weights,
        pack_bond_codes,
    )
    from tsu_tpu.ops.checkerboard_bonds_pallas import (
        checkerboard_sweeps_bonds_pallas,
    )

    R = C = 16
    T = 1.1
    key = jax.random.key(70)
    Jh = jnp.where(jax.random.bernoulli(jax.random.fold_in(key, 0), 0.5,
                                        (R, C)), 1.0, -1.0)
    # Include zero bonds (open-boundary style) in-plane to cover w = 0.
    Jv = jnp.where(jax.random.bernoulli(jax.random.fold_in(key, 1), 0.3,
                                        (R, C)), 0.0, 1.0) * jnp.where(
        jax.random.bernoulli(jax.random.fold_in(key, 2), 0.5, (R, C)),
        1.0, -1.0)
    weights = color_bond_weights(Jh, Jv, 0.0, periodic=periodic)
    weights16 = {
        color: tuple(jnp.asarray(w, jnp.bfloat16) for w in planes)
        for color, planes in weights.items()
    }
    codes = pack_bond_codes(weights)
    red, black = _random_planes(jax.random.key(71), R, C)
    n_sweeps = 2
    U = jax.random.randint(jax.random.key(72), (n_sweeps, 2, R, C // 2),
                           0, 1 << 24, jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        r_u, b_u = checkerboard_sweeps_bonds_pallas(
            jnp.int32(0), red.astype(jnp.bfloat16),
            black.astype(jnp.bfloat16), weights16, T, n_sweeps,
            periodic=periodic, uniforms=U, discrete=True,
        )
        r_p, b_p = checkerboard_sweeps_bonds_pallas(
            jnp.int32(0), red.astype(jnp.bfloat16),
            black.astype(jnp.bfloat16), codes, T, n_sweeps,
            periodic=periodic, uniforms=U, discrete=True, packed=True,
        )
    assert jnp.array_equal(jnp.asarray(r_u), jnp.asarray(r_p))
    assert jnp.array_equal(jnp.asarray(b_u), jnp.asarray(b_p))


def test_bond_batched_packed_matches_unpacked():
    """Batched packed-code path (block-major grid, shared code block) vs
    batched weight planes: identical spins in interpret mode."""
    from tsu_tpu.ops.checkerboard_bonds import (
        color_bond_weights,
        pack_bond_codes,
    )
    from tsu_tpu.ops.checkerboard_bonds_pallas import (
        checkerboard_sweeps_bonds_batched,
    )

    B, R, C = 3, 16, 16
    key = jax.random.key(80)
    Jh = jnp.where(jax.random.bernoulli(jax.random.fold_in(key, 0), 0.5,
                                        (R, C)), 1.0, -1.0)
    Jv = jnp.where(jax.random.bernoulli(jax.random.fold_in(key, 1), 0.5,
                                        (R, C)), 1.0, -1.0)
    weights = color_bond_weights(Jh, Jv, 0.0, periodic=True)
    codes = pack_bond_codes(weights)
    lats = jnp.where(jax.random.bernoulli(jax.random.fold_in(key, 2), 0.5,
                                          (B, R, C)), 1.0, -1.0)
    reds, blacks = jax.vmap(split_checkerboard)(lats)
    Ts = jnp.array([0.7, 1.4, 2.8], jnp.float32)
    seeds = jnp.array([5, 6, 7], jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        r_u, b_u = checkerboard_sweeps_bonds_batched(
            seeds, reds.astype(jnp.bfloat16), blacks.astype(jnp.bfloat16),
            weights, Ts, 2, periodic=True, discrete=True)
        r_p, b_p = checkerboard_sweeps_bonds_batched(
            seeds, reds.astype(jnp.bfloat16), blacks.astype(jnp.bfloat16),
            codes, Ts, 2, periodic=True, discrete=True, packed=True)
    assert jnp.array_equal(jnp.asarray(r_u), jnp.asarray(r_p))
    assert jnp.array_equal(jnp.asarray(b_u), jnp.asarray(b_p))


def test_pack_bond_codes_roundtrip():
    from tsu_tpu.ops.checkerboard_bonds import (
        color_bond_weights,
        pack_bond_codes,
    )

    key = jax.random.key(90)
    Jh = jnp.where(jax.random.bernoulli(jax.random.fold_in(key, 0), 0.5,
                                        (12, 12)), 1.0, -1.0)
    Jv = jnp.where(jax.random.bernoulli(jax.random.fold_in(key, 1), 0.5,
                                        (12, 12)), 1.0, -1.0)
    weights = color_bond_weights(Jh, Jv, 0.0, periodic=False)
    codes = pack_bond_codes(weights)
    for color in ("red", "black"):
        c = np.asarray(codes[color], np.float64).astype(np.int64)
        wu, wd, wl, wr, _ = (np.asarray(w, np.float64)
                             for w in weights[color])
        assert np.array_equal((c & 3) - 1, wu)
        assert np.array_equal(((c >> 2) & 3) - 1, wd)
        assert np.array_equal(((c >> 4) & 3) - 1, wl)
        assert np.array_equal(((c >> 6) & 3) - 1, wr)


def test_bond_kernel_pure_parity_table_exact():
    """pure=True (periodic all-+-1 bonds -> even local field, 5-entry
    parity table) must equal the general 9-entry path bit-for-bit."""
    from tsu_tpu.ops.checkerboard_bonds import (
        color_bond_weights,
        pack_bond_codes,
    )
    from tsu_tpu.ops.checkerboard_bonds_pallas import (
        checkerboard_sweeps_bonds_pallas,
    )
    from tsu_tpu.samplers.annealing import pure_pm1_applicable

    R = C = 16
    key = jax.random.key(95)
    Jh = jnp.where(jax.random.bernoulli(jax.random.fold_in(key, 0), 0.5,
                                        (R, C)), 1.0, -1.0)
    Jv = jnp.where(jax.random.bernoulli(jax.random.fold_in(key, 1), 0.5,
                                        (R, C)), 1.0, -1.0)
    assert pure_pm1_applicable(Jh, Jv, 0.0, True)
    assert not pure_pm1_applicable(Jh, Jv, 0.0, False)  # open -> odd fields
    codes = pack_bond_codes(color_bond_weights(Jh, Jv, 0.0, periodic=True))
    red, black = _random_planes(jax.random.key(96), R, C)
    U = jax.random.randint(jax.random.key(97), (2, 2, R, C // 2),
                           0, 1 << 24, jnp.int32)
    with pltpu.force_tpu_interpret_mode():
        outs = [
            checkerboard_sweeps_bonds_pallas(
                jnp.int32(0), red.astype(jnp.bfloat16),
                black.astype(jnp.bfloat16), codes, 1.1, 2, periodic=True,
                uniforms=U, discrete=True, packed=True, pure=pure)
            for pure in (False, True)
        ]
    assert jnp.array_equal(jnp.asarray(outs[0][0]), jnp.asarray(outs[1][0]))
    assert jnp.array_equal(jnp.asarray(outs[0][1]), jnp.asarray(outs[1][1]))
