"""VMEM-resident multi-sweep checkerboard kernel.

The streaming kernels (checkerboard_pallas/fused) pay one HBM round-trip per
sweep plus a dispatch per launch. This kernel holds BOTH color planes in VMEM
(bf16: a 4096^2 lattice is 32 MB total) and runs S sweeps inside one
pallas_call:

    HBM traffic:  read once + write once for S sweeps (amortized to ~zero)
    dispatches:   1 per S sweeps

Updates run in-place over row chunks (chunk temporaries keep peak VMEM
bounded): red chunks are resampled from the black plane, then black chunks
from the freshly-updated red plane — exact heat-bath checkerboard semantics,
same as the streaming kernels (cross-validated statistically in tests).

Constraints: R divisible by the chunk height (64), C even, planes fit VMEM
(<= ~2048^2 f32 or 4096^2 bf16 with a raised vmem limit).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tsu_tpu.ops.checkerboard_fused import _heatbath_table, sigmoid_table



_ALIGN = 16  # sublane alignment for dynamic VMEM loads (covers f32 and bf16)


def _pick_chunk(R: int, itemsize: int = 4) -> int:
    """Largest safe 16-aligned chunk height dividing R.

    bf16 chunks are capped at 32 rows: 64-row bf16 chunks miscompile on
    square lattices >= 2048^2 (verified empirically — wrong samples/hangs);
    32-row chunks are correct at every tested size and within ~10%% of the
    64-row throughput.
    """
    top = (64, 32, 16) if itemsize >= 4 else (32, 16)
    for ch in top:
        if R % ch == 0:
            return ch
    raise ValueError(f"R={R} must be divisible by 16 for the resident kernel")


def _u24(shape):
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return pltpu.bitcast(bits >> 8, jnp.int32)


def _resident_kernel(
    seed_ref,       # SMEM (1,) int32
    table_ref,      # SMEM (9,) int32
    nsweeps_ref,    # SMEM (1,) int32
    red_in_ref,     # VMEM (R, C2) — aliased to red_out
    black_in_ref,   # VMEM (R, C2) — aliased to black_out
    red_ref,        # VMEM (R, C2) out (alias of red_in)
    black_ref,      # VMEM (R, C2) out (alias of black_in)
    *,
    periodic: bool,
    R: int,
    C2: int,
    chunk: int,
):
    del red_in_ref, black_in_ref  # aliased: red_ref/black_ref hold the state
    pltpu.prng_seed(seed_ref[0])
    _CHUNK = chunk
    n_chunks = R // _CHUNK

    col = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, C2), 1)
    row_par = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, C2), 0) % 2
    row_is_even = row_par == 0  # chunk starts are even (CHUNK even)

    def halfstep_chunk(c, mine_ref, other_ref, update_red):
        a = pl.multiple_of(c * _CHUNK, _ALIGN)
        other = other_ref[pl.ds(a, _CHUNK), :].astype(jnp.float32)
        # Halo rows via ALIGNED block loads (Mosaic requires provable sublane
        # alignment for dynamic indices): row a-1 is the last row of the
        # aligned block starting at a-ALIGN; row a+CHUNK starts its block.
        up_block = other_ref[
            pl.ds(pl.multiple_of((a - _ALIGN) % R, _ALIGN), _ALIGN), :
        ]
        up_row = up_block[_ALIGN - 1 :, :].astype(jnp.float32)
        down_block = other_ref[
            pl.ds(pl.multiple_of((a + _CHUNK) % R, _ALIGN), _ALIGN), :
        ]
        down_row = down_block[0:1, :].astype(jnp.float32)
        if not periodic:
            up_row = jnp.where(c == 0, 0.0, up_row)
            down_row = jnp.where(c == n_chunks - 1, 0.0, down_row)

        up = jnp.concatenate([up_row, other[:-1, :]], axis=0)
        down = jnp.concatenate([other[1:, :], down_row], axis=0)
        left_shift = pltpu.roll(other, 1, 1)
        right_shift = pltpu.roll(other, C2 - 1, 1)
        if update_red:
            horiz = other + jnp.where(row_is_even, left_shift, right_shift)
        else:
            horiz = other + jnp.where(row_is_even, right_shift, left_shift)
        if not periodic:
            if update_red:
                wrap_left = row_is_even & (col == 0)
                wrap_right = jnp.logical_not(row_is_even) & (col == C2 - 1)
            else:
                wrap_left = jnp.logical_not(row_is_even) & (col == 0)
                wrap_right = row_is_even & (col == C2 - 1)
            horiz = jnp.where(wrap_left | wrap_right, other, horiz)

        nbr = up + down + horiz
        u = _u24((_CHUNK, C2))
        mine_ref[pl.ds(a, _CHUNK), :] = _heatbath_table(
            nbr, u, table_ref, mine_ref.dtype, even_only=periodic
        )

    def sweep_body(s, _):
        def red_chunks(c, _):
            halfstep_chunk(c, red_ref, black_ref, True)
            return 0

        jax.lax.fori_loop(0, n_chunks, red_chunks, 0)

        def black_chunks(c, _):
            halfstep_chunk(c, black_ref, red_ref, False)
            return 0

        jax.lax.fori_loop(0, n_chunks, black_chunks, 0)
        return 0

    jax.lax.fori_loop(0, nsweeps_ref[0], sweep_body, 0)


@partial(jax.jit, static_argnames=("J", "field", "periodic"))
def resident_sweeps(
    seed: jax.Array,
    red: jax.Array,
    black: jax.Array,
    temperature,
    n_sweeps,
    *,
    J: float = 1.0,
    field: float = 0.0,
    periodic: bool = True,
):
    """n_sweeps full sweeps with both planes resident in VMEM.

    n_sweeps may be a traced int32 (dynamic): the whole schedule runs in one
    launch. Returns (red, black).
    """
    R, C2 = red.shape
    chunk = _pick_chunk(R, red.dtype.itemsize)

    plane_bytes = R * C2 * red.dtype.itemsize
    vmem_limit = min(int(2.5 * 2 * plane_bytes) + 8 * 2**20, 100 * 2**20)

    kernel = partial(_resident_kernel, periodic=periodic, R=R, C2=C2,
                     chunk=chunk)
    new_red, new_black = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((R, C2), red.dtype),
            jax.ShapeDtypeStruct((R, C2), black.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit,
        ),
        cost_estimate=pl.CostEstimate(
            flops=100 * R * C2,
            bytes_accessed=4 * plane_bytes,
            transcendentals=0,
        ),
    )(
        jnp.asarray(seed, dtype=jnp.int32).reshape(1),
        sigmoid_table(J, field, temperature),
        jnp.asarray(n_sweeps, dtype=jnp.int32).reshape(1),
        red,
        black,
    )
    return new_red, new_black


def resident_fits(R: int, C2: int, itemsize: int) -> bool:
    """True when this (shape, dtype) is safe AND fits VMEM.

    Two empirical constraints on a v5e through the tunneled runtime:
    * capacity — v5e has 128 MB VMEM; two f32 4096^2-lattice planes (64 MB)
      plus chunk temporaries overflow it (measured 128.9 MB). Gate plane
      storage at 48 MB.
    * miscompile guard — bf16 square lattices (R == 2*C2) at R >= 2048
      produce wrong samples (or hang) regardless of chunk size at 4096;
      validated-good shapes are non-square bf16, any f32 that fits, and
      bf16 squares < 2048. Excluded here; callers fall back to the fused
      streaming kernel.
    """
    if itemsize < 4 and R == 2 * C2 and R >= 2048:
        return False
    return 2 * R * C2 * itemsize <= 48 * 2**20


# -- annealing variant: per-sweep temperature schedule -----------------------


def _resident_anneal_kernel(
    seed_ref,       # SMEM (1,) int32
    tables_ref,     # SMEM (S*9,) int32 — one 9-entry table per sweep
    nsweeps_ref,    # SMEM (1,) int32
    red_in_ref,
    black_in_ref,
    red_ref,
    black_ref,
    *,
    periodic: bool,
    R: int,
    C2: int,
    chunk: int,
):
    del red_in_ref, black_in_ref
    pltpu.prng_seed(seed_ref[0])
    _CHUNK = chunk
    n_chunks = R // _CHUNK

    col = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, C2), 1)
    row_par = jax.lax.broadcasted_iota(jnp.int32, (_CHUNK, C2), 0) % 2
    row_is_even = row_par == 0

    def halfstep_chunk(s, c, mine_ref, other_ref, update_red):
        a = pl.multiple_of(c * _CHUNK, _ALIGN)
        other = other_ref[pl.ds(a, _CHUNK), :].astype(jnp.float32)
        up_block = other_ref[
            pl.ds(pl.multiple_of((a - _ALIGN) % R, _ALIGN), _ALIGN), :
        ]
        up_row = up_block[_ALIGN - 1 :, :].astype(jnp.float32)
        down_block = other_ref[
            pl.ds(pl.multiple_of((a + _CHUNK) % R, _ALIGN), _ALIGN), :
        ]
        down_row = down_block[0:1, :].astype(jnp.float32)
        if not periodic:
            up_row = jnp.where(c == 0, 0.0, up_row)
            down_row = jnp.where(c == n_chunks - 1, 0.0, down_row)

        up = jnp.concatenate([up_row, other[:-1, :]], axis=0)
        down = jnp.concatenate([other[1:, :], down_row], axis=0)
        left_shift = pltpu.roll(other, 1, 1)
        right_shift = pltpu.roll(other, C2 - 1, 1)
        if update_red:
            horiz = other + jnp.where(row_is_even, left_shift, right_shift)
        else:
            horiz = other + jnp.where(row_is_even, right_shift, left_shift)
        if not periodic:
            if update_red:
                wrap_left = row_is_even & (col == 0)
                wrap_right = jnp.logical_not(row_is_even) & (col == C2 - 1)
            else:
                wrap_left = jnp.logical_not(row_is_even) & (col == 0)
                wrap_right = row_is_even & (col == C2 - 1)
            horiz = jnp.where(wrap_left | wrap_right, other, horiz)

        nbr = up + down + horiz
        thresh = jnp.full((_CHUNK, C2), tables_ref[s * 9], dtype=jnp.int32)
        if periodic:
            for k in (2, 4, 6, 8):
                thresh = jnp.where(nbr == float(k - 4), tables_ref[s * 9 + k],
                                   thresh)
        else:
            nbr_i = nbr.astype(jnp.int32) + 4
            for k in range(1, 9):
                thresh = jnp.where(nbr_i == k, tables_ref[s * 9 + k], thresh)
        u = _u24((_CHUNK, C2))
        mine_ref[pl.ds(a, _CHUNK), :] = jnp.where(u < thresh, 1.0, -1.0).astype(
            mine_ref.dtype
        )

    def sweep_body(s, _):
        def red_chunks(c, _):
            halfstep_chunk(s, c, red_ref, black_ref, True)
            return 0

        jax.lax.fori_loop(0, n_chunks, red_chunks, 0)

        def black_chunks(c, _):
            halfstep_chunk(s, c, black_ref, red_ref, False)
            return 0

        jax.lax.fori_loop(0, n_chunks, black_chunks, 0)
        return 0

    jax.lax.fori_loop(0, nsweeps_ref[0], sweep_body, 0)


@partial(jax.jit, static_argnames=("J", "field", "periodic"))
def resident_anneal(
    seed: jax.Array,
    red: jax.Array,
    black: jax.Array,
    schedule: jax.Array,
    *,
    J: float = 1.0,
    field: float = 0.0,
    periodic: bool = True,
):
    """Anneal over a (S,) temperature schedule entirely inside one launch.

    Every sweep uses its own precomputed heat-bath threshold table; the whole
    cooling run costs a single dispatch and zero intermediate HBM traffic.
    """
    R, C2 = red.shape
    chunk = _pick_chunk(R, red.dtype.itemsize)
    S = schedule.shape[0]

    tables = jax.vmap(lambda t: sigmoid_table(J, field, t))(schedule)  # (S, 9)

    plane_bytes = R * C2 * red.dtype.itemsize
    vmem_limit = min(int(2.5 * 2 * plane_bytes) + 8 * 2**20, 100 * 2**20)

    kernel = partial(_resident_anneal_kernel, periodic=periodic, R=R, C2=C2,
                     chunk=chunk)
    new_red, new_black = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((R, C2), red.dtype),
            jax.ShapeDtypeStruct((R, C2), black.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit,
        ),
        cost_estimate=pl.CostEstimate(
            flops=100 * R * C2 * S,
            bytes_accessed=4 * plane_bytes,
            transcendentals=0,
        ),
    )(
        jnp.asarray(seed, dtype=jnp.int32).reshape(1),
        tables.reshape(-1),
        jnp.asarray(S, dtype=jnp.int32).reshape(1),
        red,
        black,
    )
    return new_red, new_black
