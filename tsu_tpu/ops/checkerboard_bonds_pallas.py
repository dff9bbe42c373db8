"""Pallas TPU kernel for per-bond (disordered) checkerboard half-sweeps.

The XLA bond path (tsu_tpu/ops/checkerboard_bonds.py) reaches ~7e8 flips/s
on a 4096^2 spin glass — bounded by threefry uniforms and per-sweep HBM
round-trips. This kernel fuses, per color update and entirely in VMEM:

    neighbor gather -> 4-weight local field -> sigmoid -> hardware PRNG ->
    spin select

HBM traffic per site update: 4 weight planes + field (f32) + opposite-color
spins in/out — ~26 B/site, so the v5e roofline is ~3e10 site-updates/s
(~40x the XLA path). Unlike the uniform kernel there is no threshold table:
bond values are continuous, so the sigmoid runs on the VPU.

Layout and halo protocol match tsu_tpu/ops/checkerboard_pallas.py exactly
(compact color planes, caller-supplied 8-row halo tiles, row-blocks). Weight
planes come from checkerboard_bonds.color_bond_weights — open boundaries are
already zeroed there, so the kernel needs no edge masking. Uniform injection
(``u24``) enables exact interpret-mode CI tests against the XLA bond oracle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tsu_tpu.ops.checkerboard_pallas import fold_seed, pick_block_rows

_U24_SCALE = 1.0 / 16777216.0


def _local_field_packed(code_ref, up, down, left, right):
    """Local field from ONE bf16 code plane (pack_bond_codes): bits
    (2i, 2i+1) of the integer code hold w_i + 1. Decode is a dozen VPU
    int ops — far cheaper than the 8 B/site of weight reads it replaces
    (the discrete path measured exactly at the HBM roofline)."""
    c = code_ref[:].astype(jnp.int32)
    wu = ((c & 3) - 1).astype(jnp.float32)
    wd = (((c >> 2) & 3) - 1).astype(jnp.float32)
    wl = (((c >> 4) & 3) - 1).astype(jnp.float32)
    wr = (((c >> 6) & 3) - 1).astype(jnp.float32)
    # Discrete contract: zero field, so no field term.
    return wu * up + wd * down + wl * left + wr * right




def _discrete_threshold(local, t, pure: bool):
    """int24 threshold from the 9-entry sigmoid table ``t`` (a list of
    scalars). ``pure``: every bond is +-1 and the lattice periodic, so the
    4-term local field is EVEN — only the 5 even entries can occur and the
    select chain halves (the same parity trick that bought the uniform
    fused kernel +19..41%)."""
    if pure:
        idx = (local.astype(jnp.int32) + 4) >> 1  # 0..4
        thresh = jnp.full(local.shape, t[0], dtype=jnp.int32)
        for k in range(1, 5):
            thresh = jnp.where(idx == k, t[2 * k], thresh)
    else:
        idx = local.astype(jnp.int32) + 4  # 0..8
        thresh = jnp.full(local.shape, t[0], dtype=jnp.int32)
        for k in range(1, 9):
            thresh = jnp.where(idx == k, t[k], thresh)
    return thresh


def _halfsweep_bonds_kernel(
    seed_ref,     # SMEM (2,) int32 — (folded identity, sweep counter)
    t_ref,        # SMEM (1,) f32 — temperature, or (9,) int32 thresholds
                  #   when ``discrete`` (see halfsweep_bonds_pallas)
    other_ref,    # VMEM (BR, C2) opposite-color center block
    up_ref,       # VMEM (8, C2) halo tile; row 0 = row above the block
    down_ref,     # VMEM (8, C2) halo tile; row 0 = row below the block
    *rest,        # packed: code_ref | else: wu,wd,wl,wr,f refs;
                  #   then [u24_ref,] out_ref
    update_red: bool,
    injected: bool = False,
    discrete: bool = False,
    packed: bool = False,
    pure: bool = False,
):
    if packed:
        code_ref, *rest = rest
    else:
        wu_ref, wd_ref, wl_ref, wr_ref, f_ref, *rest = rest
    if injected:
        u24_ref, out_ref = rest
    else:
        (out_ref,) = rest
        i = pl.program_id(0)
        # Two-slot schedule: folded identity + within-run counter (see
        # checkerboard_pallas._halfsweep_kernel).
        pltpu.prng_seed(seed_ref[0], seed_ref[1] * pl.num_programs(0) + i)

    other = other_ref[:].astype(jnp.float32)
    BR, C2 = other.shape

    up = jnp.concatenate([up_ref[0:1, :].astype(jnp.float32), other[:-1, :]],
                         axis=0)
    down = jnp.concatenate([other[1:, :], down_ref[0:1, :].astype(jnp.float32)],
                           axis=0)
    left_shift = pltpu.roll(other, 1, 1)
    right_shift = pltpu.roll(other, C2 - 1, 1)
    row_par = jax.lax.broadcasted_iota(jnp.int32, (BR, C2), 0) % 2
    pick = (row_par == 0) if update_red else (row_par == 1)
    left = jnp.where(pick, left_shift, other)
    right = jnp.where(pick, other, right_shift)

    if packed:
        local = _local_field_packed(code_ref, up, down, left, right)
    else:
        # Weight planes load in their STORED dtype and widen to f32 for the
        # field sum: +-J spin-glass couplings (and zero open-boundary pads)
        # are exact in bf16, which halves the dominant HBM stream of this
        # kernel (4 weight planes + field ~= 26 B/site in f32 -> ~14 B/site
        # mixed).
        local = (wu_ref[:].astype(jnp.float32) * up
                 + wd_ref[:].astype(jnp.float32) * down
                 + wl_ref[:].astype(jnp.float32) * left
                 + wr_ref[:].astype(jnp.float32) * right
                 + f_ref[:].astype(jnp.float32))

    if injected:
        u24 = u24_ref[:]
    else:
        bits = pltpu.bitcast(pltpu.prng_random_bits((BR, C2)), jnp.uint32)
        u24 = pltpu.bitcast(bits >> 8, jnp.int32)

    if discrete:
        # +-J / integer-field path: ``local`` takes only the 9 integer
        # values -4..4 (exact in f32 and bf16), so the heat-bath draw is a
        # pure int24 threshold compare against a precomputed 9-entry
        # sigmoid table (t_ref) — no per-site transcendental. Same trick
        # as the uniform fused kernel (checkerboard_fused._heatbath_table);
        # open boundaries (a zeroed weight) just land on odd entries.
        thresh = _discrete_threshold(
            local, [t_ref[k] for k in range(9)], pure)
        out_ref[:] = jnp.where(u24 < thresh, 1.0, -1.0).astype(out_ref.dtype)
    else:
        p_up = jax.nn.sigmoid(2.0 * local / t_ref[0])
        u = u24.astype(jnp.float32) * _U24_SCALE
        out_ref[:] = jnp.where(u < p_up, 1.0, -1.0).astype(out_ref.dtype)


@partial(
    jax.jit,
    static_argnames=("update_red", "interpret", "block_rows", "discrete",
                     "packed", "pure"),
)
def halfsweep_bonds_pallas(
    seed: jax.Array,
    temperature,
    other: jax.Array,
    up_row: jax.Array,
    down_row: jax.Array,
    weights,
    *,
    update_red: bool,
    interpret: bool = False,
    u24: jax.Array | None = None,
    block_rows: int | None = None,
    discrete: bool = False,
    packed: bool = False,
    pure: bool = False,
) -> jax.Array:
    """One weighted color update given the opposite plane + halo rows.

    ``weights``: the 5-tuple (w_up, w_down, w_left, w_right, field) of
    (R, C2) planes from color_bond_weights for the color being updated —
    or, with ``packed=True``, the single bf16 code plane from
    pack_bond_codes (discrete only; zero field by contract).

    ``discrete``: the +-J fast path — REQUIRES every weight in {-1, 0, +1}
    and an integer-valued field plane, so the local field is one of the 9
    integers -4..4 and the sigmoid becomes a precomputed int24 threshold
    table (no per-site transcendental). The caller is responsible for the
    integrality contract; results are exact to ~6e-8 in probability
    (table quantization), same as the uniform fused kernel.
    """
    assert not packed or discrete, "packed codes imply the discrete path"
    R, C2 = other.shape
    BR = block_rows or pick_block_rows(R, C2, 4, vmem_budget=2**19)
    nblocks = R // BR

    if nblocks > 1:
        up_rows = jnp.concatenate([up_row, other[BR - 1 : R - 1 : BR]], axis=0)
        down_rows = jnp.concatenate([other[BR:R:BR], down_row], axis=0)
    else:
        up_rows = up_row
        down_rows = down_row
    up_rows = jnp.repeat(up_rows, 8, axis=0)
    down_rows = jnp.repeat(down_rows, 8, axis=0)

    blk = pl.BlockSpec((BR, C2), lambda i: (i, 0), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        blk,
        pl.BlockSpec((8, C2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, C2), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    in_specs += [blk] if packed else [blk, blk, blk, blk, blk]
    seed = jnp.asarray(seed, dtype=jnp.int32).reshape(-1)
    parts = [seed[i] for i in range(seed.shape[0])]
    sweep = parts[1] if len(parts) > 1 else jnp.int32(0)
    ident = [parts[0]] + parts[2:]
    seed = jnp.stack([fold_seed(*ident), jnp.asarray(sweep, jnp.int32)])
    if discrete:
        from tsu_tpu.ops.checkerboard_fused import sigmoid_table

        t_arg = sigmoid_table(1.0, 0.0, temperature)  # (9,) int24 thresholds
    else:
        t_arg = jnp.asarray(temperature, dtype=jnp.float32).reshape(1)
    if packed:
        w_inputs = [jnp.asarray(weights, jnp.bfloat16)]
    else:
        # Weights keep their caller-chosen dtype (bf16 for exact +-J spin
        # glasses — the roofline win; f32 for continuous couplings).
        w_inputs = [jnp.asarray(w) for w in weights]
    inputs = [seed, t_arg, other, up_rows, down_rows, *w_inputs]
    if u24 is not None:
        in_specs.append(blk)
        inputs.append(jnp.asarray(u24, jnp.int32))

    kernel = partial(_halfsweep_bonds_kernel, update_red=update_red,
                     injected=u24 is not None, discrete=discrete,
                     packed=packed, pure=pure)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, C2), other.dtype),
        grid_spec=pl.GridSpec(grid=(nblocks,), in_specs=in_specs,
                              out_specs=blk),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=16 * R * C2,
            bytes_accessed=7 * R * C2 * 4,
            transcendentals=R * C2,
        ),
    )(*inputs)


@partial(
    jax.jit,
    static_argnames=("n_sweeps", "periodic", "interpret", "block_rows",
                     "discrete", "packed", "pure"),
)
def checkerboard_sweeps_bonds_pallas(
    seed: jax.Array,
    red: jax.Array,
    black: jax.Array,
    weights,
    temperature,
    n_sweeps: int,
    *,
    periodic: bool = True,
    interpret: bool = False,
    uniforms: jax.Array | None = None,
    block_rows: int | None = None,
    discrete: bool = False,
    packed: bool = False,
    pure: bool = False,
):
    """n_sweeps full weighted sweeps via the Pallas bond kernel.

    ``weights``: dict from color_bond_weights — or from pack_bond_codes
    with ``packed=True`` (discrete +-J only; one bf16 code plane per
    color instead of five weight planes). ``uniforms``: optional
    (n_sweeps, 2, R, C2) int32 in [0, 2^24) for deterministic CI tests.
    ``discrete``: the +-J threshold-table fast path (weights must be in
    {-1, 0, +1} with an integer field — see halfsweep_bonds_pallas).
    ``temperature``: a scalar, or an (n_sweeps,) per-sweep SCHEDULE
    (spin-glass annealing at kernel speed).
    """
    seed = jnp.asarray(seed, dtype=jnp.int32)
    temps = jnp.broadcast_to(
        jnp.asarray(temperature, jnp.float32).reshape(-1), (n_sweeps,)
    )

    def wrap(plane):
        if periodic:
            return plane[-1:, :], plane[:1, :]
        z = jnp.zeros_like(plane[:1, :])
        return z, z

    def body(carry, inp):
        red, black = carry
        sweep_idx, u, T = inp
        up, down = wrap(black)
        red = halfsweep_bonds_pallas(
            jnp.stack([seed, sweep_idx, jnp.int32(0)]),
            T, black, up, down, weights["red"],
            update_red=True, interpret=interpret,
            u24=None if u is None else u[0], block_rows=block_rows,
            discrete=discrete, packed=packed, pure=pure,
        )
        up, down = wrap(red)
        black = halfsweep_bonds_pallas(
            jnp.stack([seed, sweep_idx, jnp.int32(1)]),
            T, red, up, down, weights["black"],
            update_red=False, interpret=interpret,
            u24=None if u is None else u[1], block_rows=block_rows,
            discrete=discrete, packed=packed, pure=pure,
        )
        return (red, black), None

    xs = (jnp.arange(n_sweeps),
          None if uniforms is None else jnp.asarray(uniforms, jnp.int32),
          temps)
    (red, black), _ = jax.lax.scan(body, (red, black), xs)
    return red, black


# -- batched replicas: shared disorder, per-replica temperatures ------------


def _halfsweep_bonds_kernel_batched(
    seed_ref,     # SMEM (B, 2) int32 — per-replica (folded seed, counter)
    t_ref,        # SMEM (B,) f32 temperatures, or (B, 9) int32 tables
                  #   when ``discrete``
    other_ref,    # VMEM (1, BR, C2) opposite-color block of replica b
    up_ref,       # VMEM (1, 8, C2)
    down_ref,     # VMEM (1, 8, C2)
    *rest,        # packed: code_ref (BR, C2) | else wu,wd,wl,wr,f refs —
                  #   weights/codes SHARED across replicas (same disorder
                  #   realization), so their index map ignores b; then
                  #   out_ref (1, BR, C2)
    update_red: bool,
    discrete: bool,
    packed: bool = False,
    pure: bool = False,
):
    """Batched variant of :func:`_halfsweep_bonds_kernel`: grid
    (nblocks, B) — block-major so the SHARED weight/code block for band i
    stays resident while every replica sweeps it (Pallas skips the copy
    when a block index repeats between consecutive grid steps), which
    amortizes the disorder stream over the whole ladder. The
    replica-exchange workhorse for disordered lattices — every rung of a
    tempering ladder sweeps the SAME bond realization at its own
    temperature in one launch."""
    if packed:
        code_ref, out_ref = rest
    else:
        wu_ref, wd_ref, wl_ref, wr_ref, f_ref, out_ref = rest
    i = pl.program_id(0)
    b = pl.program_id(1)
    nb = pl.num_programs(0)
    pltpu.prng_seed(seed_ref[b, 0], seed_ref[b, 1] * nb + i)

    other = other_ref[0].astype(jnp.float32)
    BR, C2 = other.shape

    up = jnp.concatenate([up_ref[0, 0:1, :].astype(jnp.float32),
                          other[:-1, :]], axis=0)
    down = jnp.concatenate([other[1:, :],
                            down_ref[0, 0:1, :].astype(jnp.float32)], axis=0)
    left_shift = pltpu.roll(other, 1, 1)
    right_shift = pltpu.roll(other, C2 - 1, 1)
    row_par = jax.lax.broadcasted_iota(jnp.int32, (BR, C2), 0) % 2
    pick = (row_par == 0) if update_red else (row_par == 1)
    left = jnp.where(pick, left_shift, other)
    right = jnp.where(pick, other, right_shift)

    if packed:
        local = _local_field_packed(code_ref, up, down, left, right)
    else:
        local = (wu_ref[:].astype(jnp.float32) * up
                 + wd_ref[:].astype(jnp.float32) * down
                 + wl_ref[:].astype(jnp.float32) * left
                 + wr_ref[:].astype(jnp.float32) * right
                 + f_ref[:].astype(jnp.float32))

    bits = pltpu.bitcast(pltpu.prng_random_bits((BR, C2)), jnp.uint32)
    u24 = pltpu.bitcast(bits >> 8, jnp.int32)

    if discrete:
        thresh = _discrete_threshold(
            local, [t_ref[b, k] for k in range(9)], pure)
        out_ref[0] = jnp.where(u24 < thresh, 1.0, -1.0).astype(out_ref.dtype)
    else:
        p_up = jax.nn.sigmoid(2.0 * local / t_ref[b])
        u = u24.astype(jnp.float32) * _U24_SCALE
        out_ref[0] = jnp.where(u < p_up, 1.0, -1.0).astype(out_ref.dtype)


@partial(
    jax.jit,
    static_argnames=("update_red", "interpret", "block_rows", "discrete",
                     "packed", "pure"),
)
def halfsweep_bonds_batched(
    seeds: jax.Array,
    temperatures,
    others: jax.Array,
    up_rows: jax.Array,
    down_rows: jax.Array,
    weights,
    *,
    update_red: bool,
    interpret: bool = False,
    block_rows: int | None = None,
    discrete: bool = False,
    packed: bool = False,
    pure: bool = False,
) -> jax.Array:
    """One weighted color update on a BATCH of replicas sharing one bond
    realization, each at its own temperature.

    ``seeds``: (B, 2) int32 (folded via fold_seed here; distinct per
    replica). ``others``: (B, R, C2). ``up_rows``/``down_rows``: (B, 1, C2)
    external halo rows per replica. ``weights``: the 5-tuple for the color
    being updated (shared across replicas) — or, with ``packed=True``, its
    single bf16 code plane from pack_bond_codes (discrete only).
    """
    assert not packed or discrete, "packed codes imply the discrete path"
    B, R, C2 = others.shape
    BR = block_rows or pick_block_rows(R, C2, 4, vmem_budget=2**19)
    nblocks = R // BR

    # Per-replica per-block halo tiles (8-row sublane tiling).
    def build(halos, others, top: bool):
        def one(h, o):
            if nblocks > 1:
                if top:
                    rows = jnp.concatenate([h, o[BR - 1: R - 1: BR]], axis=0)
                else:
                    rows = jnp.concatenate([o[BR:R:BR], h], axis=0)
            else:
                rows = h
            return jnp.repeat(rows, 8, axis=0)

        return jax.vmap(one)(halos, others)

    ups = build(up_rows, others, True)      # (B, nblocks*8, C2)
    downs = build(down_rows, others, False)

    seeds = jnp.asarray(seeds, jnp.int32)
    folded = jax.vmap(lambda s: fold_seed(s))(seeds[:, 0])
    seed_rows = jnp.stack([folded, seeds[:, 1]], axis=1)

    if discrete:
        from tsu_tpu.ops.checkerboard_fused import sigmoid_table

        t_arg = jax.vmap(lambda t: sigmoid_table(1.0, 0.0, t))(
            jnp.asarray(temperatures, jnp.float32).reshape(-1))
    else:
        t_arg = jnp.asarray(temperatures, jnp.float32).reshape(-1)

    # Grid is (nblocks, B) — block-major, replicas innermost — so the
    # shared weight/code block index repeats across consecutive steps and
    # Pallas keeps it resident instead of re-fetching it per replica.
    vblk = pl.BlockSpec((1, BR, C2), lambda i, b: (b, i, 0),
                        memory_space=pltpu.VMEM)
    hblk = pl.BlockSpec((1, 8, C2), lambda i, b: (b, i, 0),
                        memory_space=pltpu.VMEM)
    wblk = pl.BlockSpec((BR, C2), lambda i, b: (i, 0),
                        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        vblk, hblk, hblk,
    ]
    in_specs += [wblk] if packed else [wblk, wblk, wblk, wblk, wblk]
    if packed:
        w_inputs = [jnp.asarray(weights, jnp.bfloat16)]
    else:
        w_inputs = [jnp.asarray(w) for w in weights]
    kernel = partial(_halfsweep_bonds_kernel_batched, update_red=update_red,
                     discrete=discrete, packed=packed, pure=pure)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, R, C2), others.dtype),
        grid_spec=pl.GridSpec(grid=(nblocks, B), in_specs=in_specs,
                              out_specs=vblk),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=16 * B * R * C2,
            bytes_accessed=(2 + 5) * B * R * C2 * 4,
            transcendentals=0 if discrete else B * R * C2,
        ),
    )(seed_rows, t_arg, others, ups, downs, *w_inputs)


@partial(
    jax.jit,
    static_argnames=("n_sweeps", "periodic", "interpret", "block_rows",
                     "discrete", "packed", "pure"),
)
def checkerboard_sweeps_bonds_batched(
    seeds: jax.Array,
    reds: jax.Array,
    blacks: jax.Array,
    weights,
    temperatures,
    n_sweeps: int,
    *,
    periodic: bool = True,
    interpret: bool = False,
    block_rows: int | None = None,
    discrete: bool = False,
    packed: bool = False,
    pure: bool = False,
):
    """n_sweeps full weighted sweeps on a batch of replicas sharing one
    bond realization, each at its own temperature (tempering ladders over
    a spin glass in ONE launch per half-sweep).

    ``seeds``: (B,) distinct per-replica stream ids. ``weights``: dict
    from color_bond_weights, or from pack_bond_codes with ``packed=True``
    (discrete +-J only).
    """
    seeds = jnp.asarray(seeds, jnp.int32).reshape(-1)
    B = seeds.shape[0]

    def wrap(planes):
        if periodic:
            return planes[:, -1:, :], planes[:, :1, :]
        z = jnp.zeros_like(planes[:, :1, :])
        return z, z

    def body(carry, k):
        reds, blacks = carry
        up, down = wrap(blacks)
        reds = halfsweep_bonds_batched(
            jnp.stack([seeds, jnp.full_like(seeds, 2 * k)], axis=1),
            temperatures, blacks, up, down, weights["red"],
            update_red=True, interpret=interpret, block_rows=block_rows,
            discrete=discrete, packed=packed, pure=pure,
        )
        up, down = wrap(reds)
        blacks = halfsweep_bonds_batched(
            jnp.stack([seeds, jnp.full_like(seeds, 2 * k + 1)], axis=1),
            temperatures, reds, up, down, weights["black"],
            update_red=False, interpret=interpret, block_rows=block_rows,
            discrete=discrete, packed=packed, pure=pure,
        )
        return (reds, blacks), None

    (reds, blacks), _ = jax.lax.scan(body, (reds, blacks),
                                     jnp.arange(n_sweeps))
    return reds, blacks
