"""Pallas TPU kernel for checkerboard Gibbs half-sweeps.

The hot kernel of the engine (SURVEY.md §8.3 item 1). Compared to the XLA
path (tsu_tpu/ops/checkerboard.py) it fuses, per color update, entirely in
VMEM:

    neighbor gather -> local field -> sigmoid -> in-kernel PRNG -> spin select

so each half-sweep costs exactly one HBM read of the opposite-color plane and
one HBM write of the updated plane (heat-bath updates never read the spin
being resampled). Random bits come from the per-core hardware PRNG
(`pltpu.prng_random_bits`) seeded per (seed, color, row-block) — far cheaper
than threefry in the XLA path.

Layout matches tsu_tpu/ops/checkerboard.py: compact color planes (R, C/2),
grid over row blocks. Vertical halo rows are **caller-supplied** per block, so
the same kernel serves the single-chip wrapped lattice and the spatially
sharded lattice whose halos arrive by `ppermute` (tsu_tpu/parallel/lattice.py).
Vertical open boundaries are realized by zero halo rows (a zero spin
contributes nothing to the local field); horizontal open boundaries are masked
in-kernel.

Requirements: R divisible by an even row-block size, C even.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Inverse of 2^24: converts the top 24 bits of a uint32 to a uniform in [0,1).
_U24_SCALE = 1.0 / 16777216.0


def fold_seed(*components) -> jax.Array:
    """Mix int32 seed components into ONE int32 stream id (XLA-side).

    Mosaic's ``prng_seed`` accepts at most two values on current TPUs, so
    identity components (base, shard, color) are folded here with a
    splitmix32-style avalanche chain, while the within-run counter (sweep x
    blocks + block) rides the second ``prng_seed`` slot — giving
    DETERMINISTIC uniqueness inside a run (no birthday risk across sweeps)
    and only a ~(n_streams^2 / 2^33) chance of a cross-stream fold
    collision. Never combine components by plain addition: additive
    schedules let adjacent (seed, sweep) pairs replay identical streams
    shifted by one step, and shard offsets collide once sweep counts pass
    the stride (r2 advisor #4 / verdict weak #7).
    """
    h = jnp.uint32(0x9E3779B9)
    for v in components:
        x = jnp.asarray(v, jnp.int32).astype(jnp.uint32)
        h = h + x
        h = h ^ (h >> 16)
        h = h * jnp.uint32(0x85EBCA6B)
        h = h ^ (h >> 13)
        h = h * jnp.uint32(0xC2B2AE35)
        h = h ^ (h >> 16)
    return h.astype(jnp.int32)


def pick_block_rows(R: int, C2: int, itemsize: int = 4, vmem_budget: int = 2 * 2**20) -> int:
    """Largest even row-block dividing R whose block fits the VMEM budget.

    Budget is per in/out block; with double-buffered center input + output +
    halo tiles the kernel peaks around ~4.5x budget, comfortably inside the
    16 MB scoped-vmem limit.
    """
    limit = max(vmem_budget // max(C2 * itemsize, 1), 2)
    for br in (1024, 512, 256, 128, 64, 32, 16, 8, 4, 2):
        if br <= limit and R % br == 0:
            return br
    raise ValueError(f"lattice rows R={R} must be divisible by 2")


def _halfsweep_kernel(
    seed_ref,        # SMEM (2,) int32 — (folded identity, sweep counter)
    t_ref,           # SMEM (1,) f32 — temperature
    other_ref,       # VMEM (BR, C2) opposite-color center block
    up_ref,          # VMEM (8, C2) halo tile; row 0 = row above the block
    down_ref,        # VMEM (8, C2) halo tile; row 0 = row below the block
    *rest,           # [lcol_ref, rcol_ref (BR, 128) if col_halo,]
                     # [u24_ref (BR, C2) int32 if injected,] out_ref (BR, C2)
    update_red: bool,
    J: float,
    field: float,
    periodic: bool,
    injected: bool = False,
    col_halo: bool = False,
):
    rest = list(rest)
    if col_halo:
        lcol_ref, rcol_ref = rest[0], rest[1]
        rest = rest[2:]
    if injected:
        # Caller-supplied uniforms in [0, 2^24): the kernel becomes a
        # deterministic function, enabling exact-equality tests against an
        # independent oracle in interpret mode on CPU CI (the hardware PRNG
        # below has no interpret-mode implementation).
        u24_ref, out_ref = rest
    else:
        (out_ref,) = rest
        i = pl.program_id(0)
        # Two-slot schedule (Mosaic caps prng_seed at 2 values): slot 0 is
        # the fold_seed-mixed identity (base, shard, color); slot 1 is the
        # within-run counter sweep*nblocks + block — deterministically
        # unique inside a run, so no birthday collisions across sweeps.
        pltpu.prng_seed(seed_ref[0], seed_ref[1] * pl.num_programs(0) + i)

    other = other_ref[:]
    BR, C2 = other.shape

    # Vertical neighbors: shift rows down/up, splicing the halo rows.
    # (Halos arrive as 8-row tiles to satisfy TPU sublane tiling; row 0 is
    # the real halo.)
    up_nbr = jnp.concatenate([up_ref[0:1, :], other[:-1, :]], axis=0)
    down_nbr = jnp.concatenate([other[1:, :], down_ref[0:1, :]], axis=0)

    # Horizontal neighbors: compact-layout lane rolls (full rows are in-block,
    # so the roll realizes the periodic wrap exactly).
    left_shift = pltpu.roll(other, 1, 1)
    right_shift = pltpu.roll(other, C2 - 1, 1)  # shift -1 == C2-1 (must be >=0)

    if col_halo:
        # Column-sharded shard: splice the ppermute'd neighbor columns over
        # the wrapped edge lanes (lane 0 of the halo tiles is the real
        # column). Global periodic/open horizontal boundaries are realized
        # by the CALLER (wrap permute vs zeroed halos), exactly like the
        # vertical protocol, so no in-kernel edge masking applies below.
        col = jax.lax.broadcasted_iota(jnp.int32, (BR, C2), 1)
        left_shift = jnp.where(col == 0, lcol_ref[:, 0:1], left_shift)
        right_shift = jnp.where(col == C2 - 1, rcol_ref[:, 0:1], right_shift)

    # Block row size is even, so in-block row parity equals global row parity.
    row_par = jax.lax.broadcasted_iota(jnp.int32, (BR, C2), 0) % 2
    row_is_even = row_par == 0
    if update_red:
        horiz = jnp.where(row_is_even, left_shift + other, other + right_shift)
    else:
        horiz = jnp.where(row_is_even, other + right_shift, left_shift + other)

    if not periodic and not col_halo:
        col = jax.lax.broadcasted_iota(jnp.int32, (BR, C2), 1)
        if update_red:
            wrap_left = row_is_even & (col == 0)
            wrap_right = jnp.logical_not(row_is_even) & (col == C2 - 1)
        else:
            wrap_left = jnp.logical_not(row_is_even) & (col == 0)
            wrap_right = row_is_even & (col == C2 - 1)
        horiz = jnp.where(wrap_left | wrap_right, other, horiz)

    nbr = up_nbr + down_nbr + horiz
    local = J * nbr + field
    p_up = jax.nn.sigmoid(2.0 * local / t_ref[0])

    if injected:
        u24 = u24_ref[:]
    else:
        # bitcast to uint32 first: prng_random_bits yields int32 and an
        # arithmetic shift would smear the sign bit into negative "uniforms".
        # Mosaic can't cast uint32->f32, so bitcast the (non-negative) shifted
        # value back to int32 before the float conversion.
        bits = pltpu.bitcast(pltpu.prng_random_bits((BR, C2)), jnp.uint32)
        u24 = pltpu.bitcast(bits >> 8, jnp.int32)  # top 24 bits, in [0, 2^24)
    u = u24.astype(jnp.float32) * _U24_SCALE
    out_ref[:] = jnp.where(u < p_up, 1.0, -1.0).astype(out_ref.dtype)


@partial(
    jax.jit,
    static_argnames=("update_red", "J", "field", "periodic", "interpret",
                     "block_rows"),
)
def halfsweep_pallas(
    seed: jax.Array,
    temperature,
    other: jax.Array,
    up_row: jax.Array,
    down_row: jax.Array,
    *,
    update_red: bool,
    J: float = 1.0,
    field: float = 0.0,
    periodic: bool = True,
    interpret: bool = False,
    u24: jax.Array | None = None,
    block_rows: int | None = None,
    left_col: jax.Array | None = None,
    right_col: jax.Array | None = None,
) -> jax.Array:
    """One color update given the opposite plane and its external halo rows.

    Args:
        seed: int32 PRNG stream id — a scalar, or a vector of up to 3
            components (e.g. ``[base, sweep, color]``) hashed together with
            the block index in-kernel so no two half-sweeps anywhere share a
            stream.
        other: (R, C2) opposite-color plane (local shard or full lattice).
        up_row: (1, C2) vertical neighbor of local row 0 (wrap row, ppermute'd
            neighbor row, or zeros for an open boundary).
        down_row: (1, C2) vertical neighbor of local row R-1.
        u24: optional (R, C2) int32 uniforms in [0, 2^24); when given they
            replace the in-kernel hardware PRNG (deterministic mode for
            interpret-mode CI equality tests).
        block_rows: optional row-block override (tests use small blocks to
            exercise the multi-block halo splicing on small lattices).
        left_col / right_col: optional (R, 1) compact-column halos for a
            COLUMN-sharded shard (both or neither): the neighbor columns of
            compact columns 0 and C2-1, delivered by ppermute
            (tsu_tpu/parallel/lattice.py). When given, horizontal wrap/open
            boundaries are the caller's responsibility (wrap permute vs
            zeroed halos), mirroring the vertical halo protocol.
    Returns:
        the freshly resampled color plane (R, C2).
    """
    R, C2 = other.shape
    BR = block_rows or pick_block_rows(R, C2, other.dtype.itemsize)
    nblocks = R // BR

    # Per-block halo rows: block i>0 takes the last row of block i-1 from
    # `other` itself; block 0 takes the external up_row (and symmetrically
    # for down halos). Tiled x8 on the sublane axis because TPU blocks must
    # have a second-to-last dim divisible by 8; only row 0 of each tile is
    # read in the kernel. Halo traffic stays negligible (8 rows per block).
    if nblocks > 1:
        up_rows = jnp.concatenate([up_row, other[BR - 1 : R - 1 : BR]], axis=0)
        down_rows = jnp.concatenate([other[BR:R:BR], down_row], axis=0)
    else:
        up_rows = up_row
        down_rows = down_row
    up_rows = jnp.repeat(up_rows, 8, axis=0)
    down_rows = jnp.repeat(down_rows, 8, axis=0)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # seed (1,)
        pl.BlockSpec(memory_space=pltpu.SMEM),  # temperature (1,)
        pl.BlockSpec((BR, C2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, C2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, C2), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    # Seed vector convention: [base, sweep, color/shard-stream]. Identity
    # components fold into slot 0; the sweep counter stays raw in slot 1.
    seed = jnp.asarray(seed, dtype=jnp.int32).reshape(-1)
    parts = [seed[i] for i in range(seed.shape[0])]
    base = parts[0]
    sweep = parts[1] if len(parts) > 1 else jnp.int32(0)
    ident = [base] + parts[2:]
    seed = jnp.stack([fold_seed(*ident), jnp.asarray(sweep, jnp.int32)])
    inputs = [
        seed,
        jnp.asarray(temperature, dtype=jnp.float32).reshape(1),
        other,
        up_rows,
        down_rows,
    ]
    col_halo = left_col is not None
    assert (left_col is None) == (right_col is None), (
        "left_col and right_col must be given together"
    )
    if col_halo:
        # Lane 0 of a 128-lane tile carries the real halo column (lane-dim
        # tiling requirement); one tile per row block.
        def col_tile(c):
            c = jnp.asarray(c, other.dtype).reshape(R, 1)
            return jnp.pad(c, ((0, 0), (0, 127)))

        in_specs += [
            pl.BlockSpec((BR, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        inputs += [col_tile(left_col), col_tile(right_col)]
    if u24 is not None:
        in_specs.append(
            pl.BlockSpec((BR, C2), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )
        inputs.append(jnp.asarray(u24, dtype=jnp.int32))
    grid_spec = pl.GridSpec(
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((BR, C2), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )

    kernel = partial(
        _halfsweep_kernel,
        update_red=update_red,
        J=float(J),
        field=float(field),
        periodic=periodic,
        injected=u24 is not None,
        col_halo=col_halo,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, C2), other.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=12 * R * C2,
            bytes_accessed=2 * R * C2 * other.dtype.itemsize,
            transcendentals=R * C2,
        ),
    )(*inputs)


def _wrap_halos(plane: jax.Array, periodic: bool):
    """Single-device halo rows: periodic wrap or zeros (open boundary)."""
    if periodic:
        return plane[-1:, :], plane[:1, :]
    z = jnp.zeros_like(plane[:1, :])
    return z, z


@partial(
    jax.jit,
    static_argnames=("n_sweeps", "J", "field", "periodic", "interpret",
                     "block_rows"),
)
def checkerboard_sweeps_planes_pallas(
    seed: jax.Array,
    red: jax.Array,
    black: jax.Array,
    temperature,
    n_sweeps: int,
    *,
    J: float = 1.0,
    field: float = 0.0,
    periodic: bool = True,
    interpret: bool = False,
    uniforms: jax.Array | None = None,
    block_rows: int | None = None,
):
    """n_sweeps full red/black sweeps via the Pallas kernel (single device).

    ``seed`` is an int32 scalar; sweep and color indices are hashed in by
    the kernel's multi-component ``prng_seed`` so every half-sweep draws
    from a fresh stream. ``uniforms``: optional
    (n_sweeps, 2, R, C2) int32 in [0, 2^24) replacing the hardware PRNG
    ([s, 0] feeds the red update of sweep s, [s, 1] the black update) —
    deterministic mode for CI equality tests.
    """
    seed = jnp.asarray(seed, dtype=jnp.int32)

    def body(carry, inp):
        red, black = carry
        sweep_idx, u = inp
        up, down = _wrap_halos(black, periodic)
        red = halfsweep_pallas(
            jnp.stack([seed, sweep_idx, jnp.int32(0)]),
            temperature, black, up, down,
            update_red=True, J=J, field=field, periodic=periodic,
            interpret=interpret, u24=None if u is None else u[0],
            block_rows=block_rows,
        )
        up, down = _wrap_halos(red, periodic)
        black = halfsweep_pallas(
            jnp.stack([seed, sweep_idx, jnp.int32(1)]),
            temperature, red, up, down,
            update_red=False, J=J, field=field, periodic=periodic,
            interpret=interpret, u24=None if u is None else u[1],
            block_rows=block_rows,
        )
        return (red, black), None

    if uniforms is None:
        xs = (jnp.arange(n_sweeps), None)
    else:
        xs = (jnp.arange(n_sweeps), jnp.asarray(uniforms, jnp.int32))
    (red, black), _ = jax.lax.scan(body, (red, black), xs)
    return red, black
