"""Fused full-sweep Pallas kernel: both checkerboard colors in ONE pass.

The two-call kernel (tsu_tpu/ops/checkerboard_pallas.py) moves
4 * N * itemsize bytes per sweep (read opposite plane + write plane, twice).
This kernel updates red AND black in a single grid pass over row bands:

    per band: read black (+4 halo rows) -> compute new red extended by one
    row each side (stays in VMEM) -> compute new black from the new red ->
    write new red band + new black band.

Traffic per sweep: read black + write red + write black = 3 * N/2 * itemsize
bytes x 2 planes-worth = 25% less than the two-call kernel, with half the
kernel dispatches. With bf16 spin storage traffic halves again (all compute
stays f32; spins and +-1 sums are exact in bf16).

Correctness notes:
* The extended red band starts at global row i*BR - 1, so its row-parity mask
  is the complement of the band's (BR even).
* Open vertical boundaries: the caller zeroes the black halo tiles AND the
  kernel zeroes the out-of-lattice rows of the new-red extension (a sampled
  spin is +-1, never 0, so it must be masked explicitly).
Validated against the XLA path statistically on TPU (tests/test_tpu_kernels.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_U24_SCALE = 1.0 / 16777216.0


def _u24(shape):
    """int32 uniforms in [0, 2^24) from the hardware PRNG (sign-safe)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return pltpu.bitcast(bits >> 8, jnp.int32)


def _u16_pair(shape):
    """Two independent int32 uniforms in [0, 2^16) from ONE PRNG draw.

    The kernel is VPU-bound, and random-bit generation is a large slice of
    the per-site work; splitting each 32-bit draw into two 16-bit uniforms
    (low half -> red update, high half -> black update) halves it. 16-bit
    thresholds quantize probabilities to 2^-16 (abs err <= 7.6e-6) — far
    below the statistical resolution of any physics observable here.
    """
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    lo = pltpu.bitcast(bits & jnp.uint32(0xFFFF), jnp.int32)
    hi = pltpu.bitcast(bits >> 16, jnp.int32)
    return lo, hi


def _heatbath_table(nbr, u24, table_ref, dtype, even_only=False):
    """Heat-bath draw via integer threshold table — no transcendentals.

    For a uniform stencil the local field takes only the 9 values
    J*k + field, k = nbr in {-4..4}; the caller precomputes int24 thresholds
    t[k+4] = round(sigmoid(2(Jk+field)/T) * 2^24) so the update is a pure
    integer compare against raw PRNG bits. Exact to ~6e-8 in probability.

    ``even_only``: on a periodic lattice every site has exactly 4 neighbors,
    so the sum of four +-1 spins is always even — only {-4,-2,0,2,4} occur
    and 4 compare+selects suffice (open boundaries produce odd sums via
    zeroed halo spins, so they need the full 9-entry path). ``nbr`` holds
    exact small integers in f32; the equality compares are exact.
    """
    thresh = jnp.full(nbr.shape, table_ref[0], dtype=jnp.int32)
    if even_only:
        for k in (2, 4, 6, 8):
            thresh = jnp.where(nbr == float(k - 4), table_ref[k], thresh)
    else:
        nbr_i = nbr.astype(jnp.int32) + 4  # 0..8
        for k in range(1, 9):
            thresh = jnp.where(nbr_i == k, table_ref[k], thresh)
    return jnp.where(u24 < thresh, 1.0, -1.0).astype(dtype)


def sigmoid_table(J: float, field: float, temperature) -> jax.Array:
    """(9,) int32 thresholds for nbr sums -4..4 (computed outside the kernel,
    so temperature stays a traced argument)."""
    k = jnp.arange(-4, 5, dtype=jnp.float32)
    p = jax.nn.sigmoid(2.0 * (J * k + field) / temperature)
    return jnp.clip((p * 16777216.0), 0, 16777215).astype(jnp.int32)


def sigmoid_table16(J: float, field: float, temperature) -> jax.Array:
    """(9,) int32 16-bit thresholds matching the :func:`_u16_pair` uniforms."""
    k = jnp.arange(-4, 5, dtype=jnp.float32)
    p = jax.nn.sigmoid(2.0 * (J * k + field) / temperature)
    return jnp.clip((p * 65536.0), 0, 65535).astype(jnp.int32)


def _row_is_even(shape, row_parity_offset):
    """Boolean mask: rows with even global parity.

    row_parity_offset: 0 if row 0 of the array has even global parity,
    1 otherwise (the extended red band starts one row early).
    """
    row_par = (jax.lax.broadcasted_iota(jnp.int32, shape, 0)
               + row_parity_offset) % 2
    return row_par == 0


def _horiz(other_f32, row_is_even, update_red, periodic):
    """Horizontal neighbor sums in the compact layout.

    The compact-layout identity ``horiz = other + select(parity, left_shift,
    right_shift)`` costs one add + one select instead of two adds + one
    select. ``row_is_even`` is precomputed by the caller (red and black
    bands share one iota; their masks are row-shifted views of each other).
    """
    R, C2 = other_f32.shape
    left_shift = pltpu.roll(other_f32, 1, 1)
    right_shift = pltpu.roll(other_f32, C2 - 1, 1)
    if update_red:
        horiz = other_f32 + jnp.where(row_is_even, left_shift, right_shift)
    else:
        horiz = other_f32 + jnp.where(row_is_even, right_shift, left_shift)
    if not periodic:
        col = jax.lax.broadcasted_iota(jnp.int32, (R, C2), 1)
        if update_red:
            wrap_left = row_is_even & (col == 0)
            wrap_right = jnp.logical_not(row_is_even) & (col == C2 - 1)
        else:
            wrap_left = jnp.logical_not(row_is_even) & (col == 0)
            wrap_right = row_is_even & (col == C2 - 1)
        horiz = jnp.where(wrap_left | wrap_right, other_f32, horiz)
    return horiz


def _fused_sweep_kernel(
    seed_ref,        # SMEM (6,) int32 — (folded base, sweep counter,
                     #  global row-group offset, total global row groups,
                     #  is-global-top flag, is-global-bottom flag)
    table_ref,       # SMEM (9,) int32 heat-bath thresholds (see sigmoid_table)
    black_ref,       # VMEM (BR, C2) black center band
    up_ref,          # VMEM (8, C2): rows 0,1 = black rows i*BR-2, i*BR-1
    down_ref,        # VMEM (8, C2): rows 0,1 = black rows (i+1)*BR, +1
    *rest,           # [injected uniforms: u_red center/top/bottom, u_black,]
                     # red_out_ref, black_out_ref — both VMEM (BR, C2)
    periodic: bool,
    injected: bool = False,
):
    i = pl.program_id(0)
    nb = pl.num_programs(0)

    # Compute in f32: Mosaic's lane rotate (pltpu.roll in _horiz) requires
    # 32-bit data, so spins are widened once on load and narrowed on store.
    dtype = jnp.float32
    black = black_ref[:].astype(dtype)
    BR, C2 = black.shape
    up2 = up_ref[0:2, :].astype(dtype)
    down2 = down_ref[0:2, :].astype(dtype)

    if injected:
        # Caller-supplied 16-bit uniforms keyed by GLOBAL row: center band +
        # one-row tiles for the red extension rows (deterministic mode for
        # interpret-mode CI equality tests against a full-lattice oracle).
        ur_ref, ur_top_ref, ur_bot_ref, ub_ref, red_out_ref, black_out_ref = rest
        u_red = jnp.concatenate(
            [ur_top_ref[0:1, :], ur_ref[:], ur_bot_ref[0:1, :]], axis=0
        )
        u_black = ub_ref[:]
    else:
        red_out_ref, black_out_ref = rest
        # Row-group-keyed PRNG: the uniforms for GLOBAL rows [8g, 8g+8) come
        # from the stream seeded (seed, sweep, g), regardless of which band
        # — or which SHARD (tsu_tpu/parallel/lattice.py) — draws them. The
        # red extension rows (global i*BR-1 and (i+1)*BR) are thereby
        # recomputed bit-identically to the center rows stored by the
        # neighboring bands/shards, so the black update at band and shard
        # boundaries conditions on exactly the stored red plane. (Per-band
        # seeding would *re-draw* those rows with fresh uniforms — a subtle
        # detailed-balance violation at two rows per band boundary.)
        # Two-slot stream schedule (Mosaic caps prng_seed at 2 values):
        # slot 0 = fold_seed-hashed base seed, slot 1 = sweep * total_groups
        # + row group — deterministically unique within a run, never
        # additive on the base (an additive schedule lets adjacent integer
        # seeds s, s+1 replay identical streams shifted by one sweep — r2
        # advisor finding). One 32-bit draw per site feeds BOTH color
        # updates (lo16 -> red, hi16 -> black).
        # seed_ref[2]/[3] carry the shard's global row-group offset and the
        # GLOBAL group count (== R_global/8): on a spatially-sharded lattice
        # the group key and its wrap are global, which is exactly what makes
        # shard boundaries indistinguishable from band boundaries.
        gpb = BR // 8  # row groups per band (BR divisible by 8)
        goff = seed_ref[2]
        total_groups = seed_ref[3]
        draws = []
        for j in range(gpb + 2):
            g = (goff + i * gpb - 1 + j) % total_groups
            pltpu.prng_seed(seed_ref[0], seed_ref[1] * total_groups + g)
            draws.append(pltpu.prng_random_bits((8, C2)))
        # Row 0 of buf = global row i*BR - 8.
        buf = pltpu.bitcast(jnp.concatenate(draws, axis=0), jnp.uint32)
        lo = pltpu.bitcast(buf & jnp.uint32(0xFFFF), jnp.int32)
        hi = pltpu.bitcast(buf >> 16, jnp.int32)
        u_red = lo[7 : BR + 9, :]     # global rows i*BR-1 .. (i+1)*BR
        u_black = hi[8 : BR + 8, :]   # global rows i*BR .. (i+1)*BR-1

    # black extended: rows = global [i*BR-2, (i+1)*BR+1], shape (BR+4, C2).
    black_ext = jnp.concatenate([up2, black, down2], axis=0)

    # ---- red update on the extended band: global rows i*BR-1..(i+1)*BR ----
    # target rows j (0..BR+1) map to black_ext rows j+1; vertical neighbors
    # are black_ext rows j and j+2.
    up_nbr_r = black_ext[:-2, :]
    down_nbr_r = black_ext[2:, :]
    center_r = black_ext[1:-1, :]
    # Row 0 of the target has global row i*BR-1: parity offset 1 (BR even).
    # Masks are built per color: slicing one shared (BR+2, C2) mask at an
    # unaligned row offset trips a Mosaic layout check at large band sizes.
    even_r = _row_is_even((BR + 2, C2), 1)
    even_b = _row_is_even((BR, C2), 0)
    horiz_r = _horiz(center_r, even_r, True, periodic)
    nbr_r = up_nbr_r + down_nbr_r + horiz_r
    red_ext = _heatbath_table(nbr_r, u_red, table_ref,
                              dtype, even_only=periodic)

    if not periodic:
        # Out-of-lattice extension rows must read as 0 for the black update.
        # seed_ref[4]/[5] flag whether this program's band 0 / band nb-1 sit
        # at the GLOBAL lattice boundary (always 1 unsharded; per-shard
        # axis_index tests under spatial sharding).
        grow = jax.lax.broadcasted_iota(jnp.int32, (BR + 2, C2), 0)
        red_ext = jnp.where(
            (seed_ref[4] > 0) & (i == 0) & (grow == 0), 0.0, red_ext
        ).astype(dtype)
        red_ext = jnp.where(
            (seed_ref[5] > 0) & (i == nb - 1) & (grow == BR + 1), 0.0, red_ext
        ).astype(dtype)

    red_out_ref[:] = red_ext[1:-1, :].astype(red_out_ref.dtype)

    # ---- black update from the NEW red: global rows i*BR..(i+1)*BR-1 ------
    up_nbr_b = red_ext[:-2, :]
    down_nbr_b = red_ext[2:, :]
    center_b = red_ext[1:-1, :]
    horiz_b = _horiz(center_b, even_b, False, periodic)
    nbr_b = up_nbr_b + down_nbr_b + horiz_b
    black_out_ref[:] = _heatbath_table(nbr_b, u_black, table_ref,
                                       black_out_ref.dtype,
                                       even_only=periodic)


def _pick_band(R: int, C2: int, itemsize: int) -> int:
    """Row band height: keep in+2x out+ext buffers within ~12MB scoped vmem."""
    # Rough peak: (5 bands + 2 uniform f32 planes) per band-size.
    budget = 12 * 2**20
    per_row = C2 * (3 * itemsize + 2 * 4 + 2 * 4)  # spins + f32 temps/uniforms
    limit = max(budget // (2 * per_row), 8)  # /2 for double buffering
    for br in (512, 256, 128, 64, 32, 16, 8):
        if br <= limit and R % br == 0:
            return br
    raise ValueError(f"R={R} must be divisible by 8 for the fused kernel")


@partial(jax.jit, static_argnames=("J", "field", "periodic", "band_rows",
                                   "interpret"))
def fused_sweep_pallas(
    seed: jax.Array,
    red: jax.Array,
    black: jax.Array,
    temperature,
    *,
    J: float = 1.0,
    field: float = 0.0,
    periodic: bool = True,
    uniforms: jax.Array | None = None,
    band_rows: int | None = None,
    interpret: bool = False,
    up2: jax.Array | None = None,
    down2: jax.Array | None = None,
    shard_info=None,
    uniforms_halo=None,
):
    """One full checkerboard sweep (red then black) in a single pallas_call.

    ``red`` is accepted for API symmetry but not read (heat-bath red update
    depends only on black). ``seed`` is an int32 scalar, or a (2,) vector
    ``[base, sweep]`` whose components are hashed (not added) into the
    per-row-group PRNG streams. Returns (new_red, new_black) in the input
    dtype (float32 or bfloat16). ``uniforms``: optional (2, R, C2) int32 in
    [0, 2^16) replacing the hardware PRNG ([0] -> red update, [1] -> black);
    ``band_rows`` overrides the row-band height (CI tests use small bands to
    exercise multi-band boundary consistency on small lattices).

    Spatial-sharding support (tsu_tpu/parallel/lattice.py): when this call
    runs on a SHARD of a row-sharded lattice,
      * ``up2``/``down2`` are the (2, C2) external black halo rows (global
        rows start-2, start-1 / end, end+1) delivered by ppermute (zeroed
        for an open global boundary) — they replace the in-plane wrap;
      * ``shard_info`` = (group_offset, total_groups, is_top, is_bot)
        traced int32 scalars: this shard's first global row group
        (row_start/8), the GLOBAL group count (R_global/8), and whether the
        shard owns the global top/bottom boundary (open lattices only);
      * ``uniforms_halo`` = (u_red_top, u_red_bot), each (1, C2): injected
        red-update uniforms of global rows start-1 / end (deterministic
        mode only), owned/stored by the neighboring shards.
    The row-group-keyed in-kernel PRNG then regenerates the red extension
    rows bit-identically to the rows the neighbor shards store, so shard
    boundaries are indistinguishable from in-shard band boundaries.
    """
    R, C2 = black.shape
    BR = band_rows or _pick_band(R, C2, black.dtype.itemsize)
    nblocks = R // BR
    assert (up2 is None) == (down2 is None), (
        "up2 and down2 must be given together"
    )
    ext_halo = up2 is not None

    # Black halo tiles per band: rows (i*BR-2, i*BR-1) and ((i+1)*BR, +1),
    # wrapped for periodic lattices (or supplied by the sharded caller),
    # zeroed at open boundaries. Built as (nblocks*8, C2) so each (8, C2)
    # block satisfies sublane tiling.
    if ext_halo:
        top2 = up2.astype(black.dtype).reshape(2, C2)
        bot2 = down2.astype(black.dtype).reshape(2, C2)
    else:
        top2 = jnp.roll(black, 2, axis=0)[0:2]      # rows -2, -1 (wrapped)
        bot2 = black[0:2]                           # wrap rows 0, 1
    if nblocks > 1:
        ups = jnp.concatenate(
            [top2[None], jnp.stack([black[i * BR - 2 : i * BR]
                                    for i in range(1, nblocks)])], axis=0
        )  # (nblocks, 2, C2)
        downs = jnp.concatenate(
            [jnp.stack([black[(i + 1) * BR : (i + 1) * BR + 2]
                        for i in range(nblocks - 1)]),
             bot2[None]], axis=0
        )
    else:
        ups = top2[None]
        downs = bot2[None]

    if not periodic and not ext_halo:
        # Zero the halo rows that would wrap around the lattice. (The
        # sharded caller zeroes its ppermute'd halos at the global boundary
        # itself.)
        ups = ups.at[0].set(0.0)
        downs = downs.at[-1].set(0.0)

    pad = jnp.zeros((nblocks, 6, C2), dtype=black.dtype)
    ups = jnp.concatenate([ups.astype(black.dtype), pad], axis=1).reshape(
        nblocks * 8, C2
    )
    downs = jnp.concatenate([downs.astype(black.dtype), pad], axis=1).reshape(
        nblocks * 8, C2
    )

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((BR, C2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, C2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, C2), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    from tsu_tpu.ops.checkerboard_pallas import fold_seed

    seed = jnp.asarray(seed, dtype=jnp.int32).reshape(-1)
    sweep = seed[1] if seed.shape[0] > 1 else jnp.int32(0)
    if shard_info is None:
        # Unsharded: this call covers the whole lattice, groups 0..R/8.
        shard_info = (0, R // 8, 1, 1)
    goff, tgroups, is_top, is_bot = (
        jnp.asarray(v, jnp.int32) for v in shard_info
    )
    seed = jnp.stack([fold_seed(seed[0]), jnp.asarray(sweep, jnp.int32),
                      goff, tgroups, is_top, is_bot])
    inputs = [
        seed,
        sigmoid_table16(J, field, temperature),
        black,
        ups,
        downs,
    ]
    if uniforms is not None:
        uniforms = jnp.asarray(uniforms, jnp.int32)
        u_red_full, u_black = uniforms[0], uniforms[1]
        # Red-extension uniforms as one-row 8-tiles: global rows i*BR-1 and
        # (i+1)*BR of u_red (wrapped; irrelevant rows are masked for open
        # boundaries by the kernel's extension-row zeroing). A sharded
        # caller supplies the two boundary rows (owned by its neighbors)
        # via ``uniforms_halo``.
        top_rows = [u_red_full[(i * BR - 1) % R] for i in range(nblocks)]
        bot_rows = [u_red_full[((i + 1) * BR) % R] for i in range(nblocks)]
        if uniforms_halo is not None:
            top_rows[0] = jnp.asarray(uniforms_halo[0], jnp.int32).reshape(C2)
            bot_rows[-1] = jnp.asarray(uniforms_halo[1], jnp.int32).reshape(C2)
        tops = jnp.stack(top_rows)
        bots = jnp.stack(bot_rows)
        zpad = jnp.zeros((nblocks, 7, C2), jnp.int32)
        tops = jnp.concatenate([tops[:, None, :], zpad], axis=1).reshape(
            nblocks * 8, C2
        )
        bots = jnp.concatenate([bots[:, None, :], zpad], axis=1).reshape(
            nblocks * 8, C2
        )
        in_specs += [
            pl.BlockSpec((BR, C2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, C2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, C2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, C2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        inputs += [u_red_full, tops, bots, u_black]
    grid_spec = pl.GridSpec(
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((BR, C2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, C2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
    )
    kernel = partial(_fused_sweep_kernel, periodic=periodic,
                     injected=uniforms is not None)
    new_red, new_black = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((R, C2), black.dtype),
            jax.ShapeDtypeStruct((R, C2), black.dtype),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
        # Donate the black input into the black output: band i reads only
        # its own center block (halo rows arrive via the prematerialized
        # `ups`/`downs` tiles) and loads it fully before writing, so
        # in-place update is race-free — and the scan carry in
        # fused_sweeps stops copying a plane every sweep (~3% of the
        # device loop in the r4 trace).
        input_output_aliases={2: 1},
        cost_estimate=pl.CostEstimate(
            flops=30 * R * C2,
            bytes_accessed=3 * R * C2 * black.dtype.itemsize,
            transcendentals=0,
        ),
    )(*inputs)
    return new_red, new_black


@partial(jax.jit, static_argnames=("n_sweeps", "J", "field", "periodic",
                                   "band_rows", "interpret"))
def fused_sweeps(
    seed: jax.Array,
    red: jax.Array,
    black: jax.Array,
    temperature,
    n_sweeps: int,
    *,
    J: float = 1.0,
    field: float = 0.0,
    periodic: bool = True,
    uniforms: jax.Array | None = None,
    band_rows: int | None = None,
    interpret: bool = False,
):
    """n_sweeps full sweeps with the fused kernel.

    ``temperature``: a scalar, or an (n_sweeps,) SCHEDULE — sweep k runs at
    temperature[k] (annealing at full kernel speed; the per-sweep threshold
    table costs 9 scalar sigmoids). ``uniforms``: optional
    (n_sweeps, 2, R, C2) int32 in [0, 2^16) (deterministic mode; see
    :func:`fused_sweep_pallas`).
    """
    seed = jnp.asarray(seed, dtype=jnp.int32)
    temps = jnp.broadcast_to(
        jnp.asarray(temperature, jnp.float32).reshape(-1), (n_sweeps,)
    )

    def body(carry, inp):
        red, black = carry
        k, u, T = inp
        red, black = fused_sweep_pallas(
            jnp.stack([seed, k]), red, black, T,
            J=J, field=field, periodic=periodic, uniforms=u,
            band_rows=band_rows, interpret=interpret,
        )
        return (red, black), None

    xs = (jnp.arange(n_sweeps),
          None if uniforms is None else jnp.asarray(uniforms, jnp.int32),
          temps)
    (red, black), _ = jax.lax.scan(body, (red, black), xs)
    return red, black


# -- batched ensembles: many lattices, many temperatures, one launch --------


def _fused_sweep_kernel_batched(
    seed_ref,        # SMEM (B, 2) int32 — per-lattice (folded seed, sweep)
    table_ref,       # SMEM (B, 9) int32 per-lattice heat-bath thresholds
    black_ref,       # VMEM (1, BR, C2) black center band of lattice b
    up_ref,          # VMEM (1, 8, C2)
    down_ref,        # VMEM (1, 8, C2)
    red_out_ref,     # VMEM (1, BR, C2)
    black_out_ref,   # VMEM (1, BR, C2)
    *,
    periodic: bool,
):
    """Batched variant of :func:`_fused_sweep_kernel`: grid (B, nblocks),
    per-lattice scalars indexed by the batch program id. Same band math,
    same row-group-keyed PRNG (per-lattice streams differ via the folded
    seed). No shard/injected modes — ensembles are whole lattices on one
    device; sharding an ensemble rides the ``chains`` mesh axis instead.
    """
    b = pl.program_id(0)
    i = pl.program_id(1)
    nb = pl.num_programs(1)

    dtype = jnp.float32
    black = black_ref[0].astype(dtype)
    BR, C2 = black.shape
    up2 = up_ref[0, 0:2, :].astype(dtype)
    down2 = down_ref[0, 0:2, :].astype(dtype)

    gpb = BR // 8
    total_groups = nb * gpb
    draws = []
    for j in range(gpb + 2):
        g = (i * gpb - 1 + j) % total_groups
        pltpu.prng_seed(seed_ref[b, 0], seed_ref[b, 1] * total_groups + g)
        draws.append(pltpu.prng_random_bits((8, C2)))
    buf = pltpu.bitcast(jnp.concatenate(draws, axis=0), jnp.uint32)
    lo = pltpu.bitcast(buf & jnp.uint32(0xFFFF), jnp.int32)
    hi = pltpu.bitcast(buf >> 16, jnp.int32)
    u_red = lo[7 : BR + 9, :]
    u_black = hi[8 : BR + 8, :]

    # Per-lattice threshold row as a plain indexable of 9 SMEM scalars —
    # _heatbath_table only ever indexes table[k] with literal k.
    table = [table_ref[b, k] for k in range(9)]

    black_ext = jnp.concatenate([up2, black, down2], axis=0)
    up_nbr_r = black_ext[:-2, :]
    down_nbr_r = black_ext[2:, :]
    center_r = black_ext[1:-1, :]
    even_r = _row_is_even((BR + 2, C2), 1)
    even_b = _row_is_even((BR, C2), 0)
    horiz_r = _horiz(center_r, even_r, True, periodic)
    nbr_r = up_nbr_r + down_nbr_r + horiz_r
    red_ext = _heatbath_table(nbr_r, u_red, table, dtype, even_only=periodic)

    if not periodic:
        grow = jax.lax.broadcasted_iota(jnp.int32, (BR + 2, C2), 0)
        red_ext = jnp.where((i == 0) & (grow == 0), 0.0, red_ext).astype(dtype)
        red_ext = jnp.where(
            (i == nb - 1) & (grow == BR + 1), 0.0, red_ext
        ).astype(dtype)

    red_out_ref[0] = red_ext[1:-1, :].astype(red_out_ref.dtype)

    up_nbr_b = red_ext[:-2, :]
    down_nbr_b = red_ext[2:, :]
    center_b = red_ext[1:-1, :]
    horiz_b = _horiz(center_b, even_b, False, periodic)
    nbr_b = up_nbr_b + down_nbr_b + horiz_b
    black_out_ref[0] = _heatbath_table(nbr_b, u_black, table,
                                       black_out_ref.dtype,
                                       even_only=periodic)


def _black_halo_tiles(black, BR, periodic):
    """(nblocks*8, C2) top/bottom black halo tiles for one lattice (the
    same construction fused_sweep_pallas performs inline)."""
    R, C2 = black.shape
    nblocks = R // BR
    top2 = jnp.roll(black, 2, axis=0)[0:2]
    if nblocks > 1:
        ups = jnp.concatenate(
            [top2[None], jnp.stack([black[i * BR - 2 : i * BR]
                                    for i in range(1, nblocks)])], axis=0
        )
        downs = jnp.concatenate(
            [jnp.stack([black[(i + 1) * BR : (i + 1) * BR + 2]
                        for i in range(nblocks - 1)]),
             black[None, 0:2]], axis=0
        )
    else:
        ups = top2[None]
        downs = black[None, 0:2]
    if not periodic:
        ups = ups.at[0].set(0.0)
        downs = downs.at[-1].set(0.0)
    pad = jnp.zeros((nblocks, 6, C2), dtype=black.dtype)
    ups = jnp.concatenate([ups, pad], axis=1).reshape(nblocks * 8, C2)
    downs = jnp.concatenate([downs, pad], axis=1).reshape(nblocks * 8, C2)
    return ups, downs


@partial(jax.jit, static_argnames=("J", "field", "periodic", "band_rows",
                                   "interpret"))
def fused_sweep_batched(
    seeds: jax.Array,
    reds: jax.Array,
    blacks: jax.Array,
    temperatures,
    *,
    J: float = 1.0,
    field: float = 0.0,
    periodic: bool = True,
    band_rows: int | None = None,
    interpret: bool = False,
):
    """One full sweep on a BATCH of lattices in a single pallas_call.

    ``seeds``: (B,) int32, or (B, 2) ``[seed, sweep]`` rows — MUST be
    distinct per lattice (fold a lattice index in; identical seeds replay
    identical streams across the ensemble). ``reds``/``blacks``:
    (B, R, C2) compact color planes. ``temperatures``: (B,) — each lattice
    sweeps at its own temperature (phase sweeps, tempering ladders,
    independent-ensemble error bars in ONE launch).

    Element b is bit-identical to ``fused_sweep_pallas(seeds[b], ...)`` on
    the same backend (exact-equality test in tests/test_pallas_interpret.py).
    """
    B, R, C2 = blacks.shape
    BR = band_rows or _pick_band(R, C2, blacks.dtype.itemsize)
    nblocks = R // BR

    from tsu_tpu.ops.checkerboard_pallas import fold_seed

    seeds = jnp.asarray(seeds, jnp.int32)
    if seeds.ndim == 1:
        seeds = jnp.stack([seeds, jnp.zeros_like(seeds)], axis=1)
    folded = jax.vmap(lambda s: fold_seed(s))(seeds[:, 0])
    seed_rows = jnp.stack([folded, seeds[:, 1]], axis=1)  # (B, 2)

    temperatures = jnp.broadcast_to(
        jnp.asarray(temperatures, jnp.float32).reshape(-1), (B,)
    )
    tables = jax.vmap(lambda t: sigmoid_table16(J, field, t))(temperatures)

    ups, downs = jax.vmap(
        lambda blk: _black_halo_tiles(blk, BR, periodic)
    )(blacks)

    vblk = pl.BlockSpec((1, BR, C2), lambda b, i: (b, i, 0),
                        memory_space=pltpu.VMEM)
    hblk = pl.BlockSpec((1, 8, C2), lambda b, i: (b, i, 0),
                        memory_space=pltpu.VMEM)
    grid_spec = pl.GridSpec(
        grid=(B, nblocks),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            vblk, hblk, hblk,
        ],
        out_specs=(vblk, vblk),
    )
    new_red, new_black = pl.pallas_call(
        partial(_fused_sweep_kernel_batched, periodic=periodic),
        out_shape=(
            jax.ShapeDtypeStruct((B, R, C2), blacks.dtype),
            jax.ShapeDtypeStruct((B, R, C2), blacks.dtype),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
        input_output_aliases={2: 1},
        cost_estimate=pl.CostEstimate(
            flops=30 * B * R * C2,
            bytes_accessed=3 * B * R * C2 * blacks.dtype.itemsize,
            transcendentals=0,
        ),
    )(seed_rows, tables, blacks, ups, downs)
    return new_red, new_black


@partial(jax.jit, static_argnames=("n_sweeps", "J", "field", "periodic",
                                   "band_rows", "interpret"))
def fused_sweeps_batched(
    seeds: jax.Array,
    reds: jax.Array,
    blacks: jax.Array,
    temperatures,
    n_sweeps: int,
    *,
    J: float = 1.0,
    field: float = 0.0,
    periodic: bool = True,
    band_rows: int | None = None,
    interpret: bool = False,
):
    """n_sweeps full sweeps on a batch of lattices (one launch per sweep).

    ``seeds``: (B,) distinct per-lattice stream ids, or (B, 2) rows whose
    second column is IGNORED (this scan supplies the per-sweep counter
    itself — see :func:`fused_sweep_batched`). An r4 review caught the
    first version flattening (B, 2) input into 2B interleaved seeds,
    which silently put lattices on colliding streams.
    """
    seeds = jnp.asarray(seeds, jnp.int32)
    if seeds.ndim == 2:
        seeds = seeds[:, 0]
    seeds = seeds.reshape(-1)

    def body(carry, k):
        reds, blacks = carry
        reds, blacks = fused_sweep_batched(
            jnp.stack([seeds, jnp.full_like(seeds, k)], axis=1),
            reds, blacks, temperatures,
            J=J, field=field, periodic=periodic, band_rows=band_rows,
            interpret=interpret,
        )
        return (reds, blacks), None

    (reds, blacks), _ = jax.lax.scan(body, (reds, blacks),
                                     jnp.arange(n_sweeps))
    return reds, blacks
