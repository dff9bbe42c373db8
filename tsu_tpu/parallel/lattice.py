"""Spatially-sharded 2-D Ising lattice: checkerboard Gibbs with halo exchange.

The structural analog of sequence parallelism for this workload (SURVEY.md
§5.7): one big lattice state sharded over the ``row`` mesh axis, with
1-row-wide boundary strips exchanged between neighboring shards via
``jax.lax.ppermute`` before each half-sweep — the same neighbor-to-neighbor
torus-shift communication pattern as ring attention, riding ICI.

The whole run (burn-in, thinning, observable collection) is ONE jitted
``shard_map``: sweeps scan on-device, observables reduce with ``psum``, and
nothing returns to the host until the per-sample scalars.

Correctness notes (SURVEY.md §8.3 item 2):
* Each shard must hold an even number of rows so checkerboard parity is
  identical on every shard (global row = shard_idx * R_local + r with
  R_local even ⇒ parity(global row) == parity(local row)).
* Periodic vertical boundaries map to the mesh-wrap permute (last shard sends
  to shard 0); open boundaries zero the outermost halos, which contributes
  nothing to the local field.
* Per-shard PRNG streams are decorrelated by folding the shard index into the
  key/seed.
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp

import numpy as np

from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P
from jax import shard_map

from tsu_tpu.ops.checkerboard import (
    halfstep_with_halo,
    halfstep_with_halo2d,
    merge_checkerboard,
    split_checkerboard,
)


def _halo_exchange(plane, axis_name: str, periodic: bool):
    """Exchange boundary rows with the two neighbor shards along ``axis_name``.

    Returns (up_row, down_row): the vertical neighbors of local rows 0 and
    R_local-1. One ppermute per direction; zeroed at the global boundary for
    open lattices.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]   # my last row -> next shard's up halo
    bwd = [(i, (i - 1) % n) for i in range(n)]   # my first row -> prev shard's down halo
    up_row = jax.lax.ppermute(plane[-1:, :], axis_name, fwd)
    down_row = jax.lax.ppermute(plane[:1, :], axis_name, bwd)
    if not periodic:
        up_row = jnp.where(idx == 0, 0.0, up_row)
        down_row = jnp.where(idx == n - 1, 0.0, down_row)
    return up_row, down_row


def _halo_exchange2(plane, axis_name: str, periodic: bool):
    """Two-row halo exchange for the FUSED sharded path.

    The fused kernel consumes 2-row black halos (global rows start-2,
    start-1 above and end, end+1 below) because it recomputes a one-row red
    extension on each side of every band. Returns (up2, down2), each
    (2, C2); zeroed at the global boundary for open lattices.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    up2 = jax.lax.ppermute(plane[-2:, :], axis_name, fwd)
    down2 = jax.lax.ppermute(plane[:2, :], axis_name, bwd)
    if not periodic:
        up2 = jnp.where(idx == 0, 0.0, up2)
        down2 = jnp.where(idx == n - 1, 0.0, down2)
    return up2, down2


def _halo_exchange_cols(plane, axis_name: str, periodic: bool):
    """Column analog of :func:`_halo_exchange` on compact color planes.

    Returns (left_col, right_col) of shape (R_local, 1): the compact columns
    j2-1 / j2+1 adjacent to this column shard's block. Compact-column
    adjacency is offset-independent (the red/black horizontal-neighbor rule
    only depends on row parity), so the wrap permute realises periodic
    horizontal boundaries exactly as jnp.roll does on an unsharded plane.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % n) for i in range(n)]
    bwd = [(i, (i - 1) % n) for i in range(n)]
    left_col = jax.lax.ppermute(plane[:, -1:], axis_name, fwd)
    right_col = jax.lax.ppermute(plane[:, :1], axis_name, bwd)
    if not periodic:
        left_col = jnp.where(idx == 0, 0.0, left_col)
        right_col = jnp.where(idx == n - 1, 0.0, right_col)
    return left_col, right_col


def _make_local_halfstep(
    axis_name, periodic, use_pallas, J, field, col_axis=None
):
    """Build the per-shard half-sweep: halo exchange + color update.

    The returned function takes temperature as an ARGUMENT (not a closure
    capture) so one compiled program serves every temperature — and so the
    whole sharded program can be built once per static configuration and
    cached (see :func:`_sharded_sweeps_fn`).
    """

    if col_axis is not None:
        if use_pallas:
            from tsu_tpu.ops.checkerboard_pallas import halfsweep_pallas

            def one_halfstep2d_pallas(k, seed, other, update_red, T,
                                      u24=None):
                up, down = _halo_exchange(other, axis_name, periodic)
                left, right = _halo_exchange_cols(other, col_axis, periodic)
                # Horizontal wrap/open boundaries are realized by the
                # exchanged (or zeroed) halo columns, so the kernel runs in
                # its col_halo mode with no in-kernel edge masking.
                return halfsweep_pallas(
                    seed, T, other, up, down,
                    update_red=update_red, J=J, field=field, periodic=True,
                    left_col=left, right_col=right, u24=u24,
                )

            return one_halfstep2d_pallas

        def one_halfstep2d(k, seed, other, update_red, T, u24=None):
            up, down = _halo_exchange(other, axis_name, periodic)
            left, right = _halo_exchange_cols(other, col_axis, periodic)
            return halfstep_with_halo2d(
                k, other, up, down, left, right, update_red, T, J, field,
            )

        return one_halfstep2d

    def one_halfstep(k, seed, other, update_red, T, u24=None):
        up, down = _halo_exchange(other, axis_name, periodic)
        if use_pallas:
            from tsu_tpu.ops.checkerboard_pallas import halfsweep_pallas

            # Horizontal wrap stays in-shard under row sharding, so
            # ``periodic`` only governs the kernel's column masking; the
            # vertical boundary is realized by the exchanged halo rows.
            return halfsweep_pallas(
                seed, T, other, up, down,
                update_red=update_red, J=J, field=field, periodic=periodic,
                u24=u24,
            )
        return halfstep_with_halo(
            k, other, up, down, update_red, T, J, field, periodic
        )

    return one_halfstep


def _make_local_fused_sweep(axis_name, periodic, J, field):
    """Build the per-shard FULL sweep on the fused kernel: one 2-row halo
    exchange + ONE kernel launch per sweep per shard — the same program the
    single-chip headline runs (ops/checkerboard_fused.py), so the sharded
    path pays only the ppermute, not a slower kernel (r3 verdict weak #1:
    the streaming 2-launch path ran at ~24% of the fused headline).

    Shard boundaries ride the kernel's row-group-keyed PRNG: every shard
    passes the SAME base seed plus its global row-group offset, so the red
    extension rows recomputed at a shard edge are bit-identical to the rows
    the neighbor shard stores.
    """
    from tsu_tpu.ops.checkerboard_fused import fused_sweep_pallas

    def one_sweep(base, sweep_idx, red_l, black_l, T, u=None):
        n = jax.lax.axis_size(axis_name)
        idx = jax.lax.axis_index(axis_name)
        gpb_shard = red_l.shape[0] // 8
        shard_info = (
            idx * gpb_shard,
            n * gpb_shard,
            (idx == 0).astype(jnp.int32),
            (idx == n - 1).astype(jnp.int32),
        )
        up2, down2 = _halo_exchange2(black_l, axis_name, periodic)
        u_halo = None
        if u is not None:
            # Red-update uniforms of the extension rows (global rows
            # start-1 / end) are stored by the neighbor shards; wrap-permute
            # them alongside the spin halos. (At an open global boundary
            # the kernel zeroes those extension rows, so the wrapped values
            # are never read into the lattice.)
            fwd = [(i, (i + 1) % n) for i in range(n)]
            bwd = [(i, (i - 1) % n) for i in range(n)]
            u_halo = (
                jax.lax.ppermute(u[0][-1:, :], axis_name, fwd),
                jax.lax.ppermute(u[0][:1, :], axis_name, bwd),
            )
        return fused_sweep_pallas(
            jnp.stack([base, sweep_idx]), red_l, black_l, T,
            J=J, field=field, periodic=periodic,
            up2=up2, down2=down2, shard_info=shard_info,
            uniforms=u, uniforms_halo=u_halo,
        )

    return one_sweep


def _local_observables(red, black, axis_name, periodic, J, field, col_axis=None):
    """Per-shard (M, E) partial sums reduced with psum over the mesh axes.

    Bonds crossing a shard boundary are attributed to the shard that owns the
    upper row / left column (its "down"/"right" bond), delivered by halo
    exchange of the merged local lattice's first row / column.
    """
    # f32 accumulation: the fused path stores bf16 planes, and summing
    # millions of +-1 spins in bf16 would lose whole integer counts.
    lat = merge_checkerboard(red, black).astype(jnp.float32)
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    fwd = [(i, (i - 1) % n) for i in range(n)]
    down_halo = jax.lax.ppermute(lat[:1, :], axis_name, fwd)  # next shard's row 0
    if not periodic:
        down_halo = jnp.where(idx == n - 1, 0.0, down_halo)

    horiz = jnp.sum(lat[:, :-1] * lat[:, 1:])
    if col_axis is None:
        if periodic:
            horiz = horiz + jnp.sum(lat[:, -1] * lat[:, 0])
    else:
        nc = jax.lax.axis_size(col_axis)
        cidx = jax.lax.axis_index(col_axis)
        cfwd = [(i, (i - 1) % nc) for i in range(nc)]
        right_halo = jax.lax.ppermute(lat[:, :1], col_axis, cfwd)
        if not periodic:
            right_halo = jnp.where(cidx == nc - 1, 0.0, right_halo)
        horiz = horiz + jnp.sum(lat[:, -1:] * right_halo)
    vert = jnp.sum(lat[:-1, :] * lat[1:, :]) + jnp.sum(lat[-1:, :] * down_halo)
    e_local = -J * (horiz + vert) - field * jnp.sum(lat)
    m_local = jnp.sum(lat)
    axes = (axis_name,) if col_axis is None else (axis_name, col_axis)
    return (
        jax.lax.psum(m_local, axes),
        jax.lax.psum(e_local, axes),
    )


@lru_cache(maxsize=64)
def _sharded_sweeps_fn(mesh, n_sweeps, J, field, periodic, use_pallas,
                       axis_name, col_axis, fused):
    """Build + jit the sharded sweeps program ONCE per static configuration.

    The r3 scaling run exposed ~200 ms of Python re-trace per call when the
    shard_map closure was rebuilt inside the entry function; caching the
    jitted program (keyed on mesh + statics; temperature is an argument)
    makes repeat calls pure dispatch.
    """
    spec = P(axis_name, col_axis)
    uspec = P(None, None, axis_name, col_axis)
    if fused:
        local_fused = _make_local_fused_sweep(axis_name, periodic, J, field)

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), spec, spec, P(), uspec),
            out_specs=(spec, spec),
            check_vma=False,
        )
        def run(key, red_l, black_l, T, uniforms_l):
            # The fused kernel's row-group-keyed PRNG requires the SAME base
            # seed on every shard (streams are decorrelated by global row
            # group, and boundary bit-equality depends on shards agreeing);
            # the replicated key gives exactly that. No shard fold here.
            base = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)

            def body(carry, inp):
                red_l, black_l = carry
                sweep_idx, u = inp
                red_l, black_l = local_fused(
                    base, sweep_idx, red_l, black_l, T, u)
                return (red_l, black_l), None

            (red_l, black_l), _ = jax.lax.scan(
                body, (red_l, black_l), (jnp.arange(n_sweeps), uniforms_l)
            )
            return red_l, black_l

        return jax.jit(run)

    local_halfstep = _make_local_halfstep(
        axis_name, periodic, use_pallas, J, field, col_axis
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), spec, spec, P(), uspec),
        out_specs=(spec, spec),
        check_vma=False,
    )
    def run(key, red_l, black_l, T, uniforms_l):
        shard = jax.lax.axis_index(axis_name)
        if col_axis is not None:
            shard = shard * jax.lax.axis_size(col_axis) + jax.lax.axis_index(col_axis)
        # Pallas seed schedule: identity components (base, shard*2+color)
        # fold in-kernel via fold_seed; the sweep index rides the second
        # prng_seed slot as a within-run counter. The r2 additive schedule
        # ((sweep*2 + shard*131) * 65537) collided across shards once sweep
        # counts passed ~65: shard s at sweep i and shard s' at sweep
        # i + 65.5*(s'-s) replayed identical streams.
        base = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
        key = jax.random.fold_in(key, shard)

        def body(carry, inp):
            red_l, black_l = carry
            sweep_idx, k, u = inp
            k_r, k_b = jax.random.split(k)
            sc = shard * 2
            red_l = local_halfstep(
                k_r, jnp.stack([base, sweep_idx, sc]), black_l, True, T,
                None if u is None else u[0])
            black_l = local_halfstep(
                k_b, jnp.stack([base, sweep_idx, sc + 1]), red_l, False, T,
                None if u is None else u[1])
            return (red_l, black_l), None

        keys = jax.random.split(key, n_sweeps)
        (red_l, black_l), _ = jax.lax.scan(
            body, (red_l, black_l), (jnp.arange(n_sweeps), keys, uniforms_l)
        )
        return red_l, black_l

    return jax.jit(run)


def sharded_checkerboard_sweeps(
    mesh: Mesh,
    key: jax.Array,
    red: jax.Array,
    black: jax.Array,
    temperature,
    n_sweeps: int,
    *,
    J: float = 1.0,
    field: float = 0.0,
    periodic: bool = True,
    use_pallas: bool = False,
    axis_name: str = "row",
    col_axis: str | None = None,
    uniforms: jax.Array | None = None,
    fused: bool | None = None,
):
    """n_sweeps full sweeps on compact color planes sharded over ``axis_name``
    (rows) and optionally ``col_axis`` (compact columns — 2-D sharding).

    ``red``/``black`` have global shape (R, C/2), sharded
    (axis_name, col_axis). Returns updated (red, black), same sharding.
    ``uniforms``: optional (n_sweeps, 2, R, C2) int32, sharded like the
    planes — deterministic mode for the Pallas paths (interpret-mode CI
    equality tests of kernel + halo exchange together). Values are in
    [0, 2^24) for the streaming kernel, [0, 2^16) for the fused kernel.

    ``fused``: run the single-launch fused kernel per sweep (the single-chip
    headline program) instead of the 2-launch streaming kernel. Default
    (None) auto-selects it whenever it applies: Pallas path, row-only
    sharding, shards a multiple of 8 rows, no injected uniforms (injected
    callers choose the kernel explicitly because the two consume different
    uniform widths).
    """
    n_shards = mesh.shape[axis_name]
    R, C2 = red.shape
    assert R % n_shards == 0 and (R // n_shards) % 2 == 0, (
        f"rows per shard must be even: R={R}, shards={n_shards}"
    )
    if fused is None:
        fused = (use_pallas and col_axis is None and uniforms is None
                 and (R // n_shards) % 8 == 0)
        if use_pallas and not fused and uniforms is None:
            # Not an error — but never a silent 4x: the caller asked for
            # the kernel path and is getting the 2-launch streaming kernel
            # because of column sharding or a non-multiple-of-8 shard
            # height (r4 verdict weak #3). plan_lattice_mesh picks a
            # topology that keeps the fused path whenever one exists.
            import warnings

            reason = ("column sharding" if col_axis is not None else
                      f"rows-per-shard {R // n_shards} % 8 != 0")
            warnings.warn(
                f"sharded sweeps fall back to the ~4x slower streaming "
                f"kernel ({reason}); row-only sharding with "
                "rows-per-shard % 8 == 0 runs the fused headline kernel "
                "(docs/DISTRIBUTED.md)", RuntimeWarning, stacklevel=2)
    if fused:
        assert use_pallas, "fused path is a Pallas kernel"
        assert col_axis is None, "fused path supports row sharding only"
        assert (R // n_shards) % 8 == 0, (
            f"fused path needs rows-per-shard % 8 == 0: R={R}, "
            f"shards={n_shards}"
        )
    if col_axis is not None:
        assert C2 % mesh.shape[col_axis] == 0, (
            f"compact columns must divide evenly: C/2={C2}, "
            f"shards={mesh.shape[col_axis]}"
        )
    # Injected uniforms are consumed only by the Pallas kernels; the XLA
    # paths would silently ignore them (r2 advisor finding), so reject that
    # combination loudly.
    assert uniforms is None or use_pallas, "uniforms require the pallas path"
    fn = _sharded_sweeps_fn(mesh, n_sweeps, float(J), float(field), periodic,
                            use_pallas, axis_name, col_axis, fused)
    if uniforms is not None:
        uniforms = jax.device_put(
            jnp.asarray(uniforms, jnp.int32),
            NamedSharding(mesh, P(None, None, axis_name, col_axis)),
        )
    return fn(key, red, black, jnp.asarray(temperature, jnp.float32),
              uniforms)


def sharded_lattice_sample(
    mesh: Mesh,
    key: jax.Array,
    lattice0: jax.Array,
    *,
    n_samples: int,
    temperature,
    J: float = 1.0,
    field: float = 0.0,
    n_burnin: int = 100,
    n_sweeps: int = 1,
    periodic: bool = True,
    use_pallas: bool = False,
    axis_name: str = "row",
    col_axis: str | None = None,
    fused: bool | None = None,
    dtype=None,
    checkpoint_path: str | None = None,
    checkpoint_every: int = 0,
    resume: bool = False,
):
    """Sample observables from a spatially-sharded lattice in ONE compiled
    program (row sharding, or 2-D row×column sharding when ``col_axis`` is
    given).

    Returns dict of per-sample global magnetization (per spin) and energy plus
    the final sharded planes. Full states stay sharded on device; only
    (n_samples,) scalars come back.

    ``fused`` (default auto, see :func:`sharded_checkerboard_sweeps`) runs
    the single-launch fused kernel per sweep. ``dtype`` sets the plane
    storage dtype: default bfloat16 on the fused path (the headline-kernel
    configuration; +-1 spins are exact in bf16, observables accumulate in
    f32), float32 otherwise.

    ``checkpoint_path`` + ``checkpoint_every`` (in samples) run the program
    in chunks and snapshot the sharded planes + collected observables after
    each chunk (SURVEY.md §5.4: the 4096^2 multi-host runs are exactly the
    runs that must survive preemption); ``resume=True`` continues a killed
    run. The seed/counter schedule is keyed by GLOBAL sample index, so the
    resumed run is bit-identical to the uninterrupted one.
    """
    n_shards = mesh.shape[axis_name]
    R, C = lattice0.shape
    assert R % n_shards == 0 and (R // n_shards) % 2 == 0, (
        f"rows per shard must be even: R={R}, shards={n_shards}"
    )
    if fused is None:
        fused = (use_pallas and col_axis is None
                 and (R // n_shards) % 8 == 0)
    if fused:
        assert use_pallas and col_axis is None
        assert (R // n_shards) % 8 == 0, (
            f"fused path needs rows-per-shard % 8 == 0: R={R}, "
            f"shards={n_shards}"
        )
    if col_axis is not None:
        assert (C // 2) % mesh.shape[col_axis] == 0, (
            f"compact columns must divide evenly: C/2={C // 2}, "
            f"shards={mesh.shape[col_axis]}"
        )
    if dtype is None:
        dtype = jnp.bfloat16 if fused else jnp.float32
    red, black = split_checkerboard(jnp.asarray(lattice0, dtype=dtype))
    sharding = NamedSharding(mesh, P(axis_name, col_axis))
    red = jax.device_put(red, sharding)
    black = jax.device_put(black, sharding)
    T = jnp.asarray(temperature, jnp.float32)
    burn_offset = jnp.int32(n_burnin)

    if checkpoint_path is None or checkpoint_every <= 0:
        fn = _sharded_sample_fn(mesh, n_samples, n_burnin, n_sweeps,
                                float(J), float(field), periodic, use_pallas,
                                axis_name, col_axis, fused)
        ms, es, red, black = fn(key, red, black, T, jnp.int32(0),
                                burn_offset)
        return {
            "magnetization": ms,
            "energy": es,
            "final_planes": (red, black),
        }

    # Chunked + checkpointed: identical seed/counter schedule (global
    # sample indices), sharded planes snapshotted after every chunk.
    from tsu_tpu.checkpoint import restore_state, save_state

    import os as _os

    obs_path = checkpoint_path + "_obs.npz"
    done = 0
    ms_parts: list = []
    es_parts: list = []
    if resume and _os.path.exists(obs_path):
        # Planes + the authoritative ``done`` ride the (sharded-aware)
        # checkpointer; the growing observable arrays live in a plain npz
        # side file so their shape never has to match a restore example.
        # The obs file is written BEFORE the planes snapshot, so on a
        # crash between the two writes the planes' ``done`` is the older
        # one and the obs arrays are simply sliced back to it.
        st = restore_state(checkpoint_path,
                           {"red": red, "black": black, "done": jnp.int32(0)})
        done = int(st["done"])
        red = jax.device_put(jnp.asarray(st["red"], dtype), sharding)
        black = jax.device_put(jnp.asarray(st["black"], dtype), sharding)
        if done > 0:
            obs = np.load(obs_path)
            ms_parts = [np.asarray(obs["ms"])[:done]]
            es_parts = [np.asarray(obs["es"])[:done]]

    while done < n_samples:
        n = min(checkpoint_every, n_samples - done)
        fn = _sharded_sample_fn(mesh, n, n_burnin if done == 0 else 0,
                                n_sweeps, float(J), float(field), periodic,
                                use_pallas, axis_name, col_axis, fused)
        ms, es, red, black = fn(key, red, black, T, jnp.int32(done),
                                burn_offset)
        ms_parts.append(np.asarray(ms))
        es_parts.append(np.asarray(es))
        done += n
        np.savez(obs_path, ms=np.concatenate(ms_parts),
                 es=np.concatenate(es_parts))
        save_state(checkpoint_path,
                   {"red": red, "black": black, "done": jnp.int32(done)})
    return {
        "magnetization": jnp.asarray(np.concatenate(ms_parts)),
        "energy": jnp.asarray(np.concatenate(es_parts)),
        "final_planes": (red, black),
    }


@lru_cache(maxsize=64)
def _sharded_sample_fn(mesh, n_samples, n_burnin, n_sweeps, J, field,
                       periodic, use_pallas, axis_name, col_axis, fused):
    """Cached jitted builder for :func:`sharded_lattice_sample` (one trace
    per static configuration; temperature is an argument)."""
    spec = P(axis_name, col_axis)
    if fused:
        local_fused = _make_local_fused_sweep(axis_name, periodic, J, field)
    else:
        local_halfstep = _make_local_halfstep(
            axis_name, periodic, use_pallas, J, field, col_axis
        )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), spec, spec, P(), P(), P()),
        out_specs=(P(), P(), spec, spec),
        check_vma=False,
    )
    def run(key, red_l, black_l, T, start, burn_offset):
        # ``start``: global index of the first sample this call produces;
        # ``burn_offset``: the run's total burn-in sweeps. Both traced so a
        # checkpointed continuation replays the exact seed/counter schedule
        # of the uninterrupted program (sample i always folds 1 + i and
        # sweeps from burn_offset + i * n_sweeps, no matter which chunk
        # executes it).
        shard = jax.lax.axis_index(axis_name)
        n_sites = 2 * red_l.shape[0] * red_l.shape[1] * jax.lax.axis_size(axis_name)
        if col_axis is not None:
            shard = shard * jax.lax.axis_size(col_axis) + jax.lax.axis_index(col_axis)
            n_sites = n_sites * jax.lax.axis_size(col_axis)
        # Folded-identity + sweep-counter seed schedule — see
        # _sharded_sweeps_fn. The fused path keeps the base replicated (no
        # shard fold): its streams are keyed by global row group.
        base = jax.random.randint(key, (), 0, 2**31 - 1, dtype=jnp.int32)
        if not fused:
            key = jax.random.fold_in(key, shard)

        def sweeps(carry, step_base, k, n):
            def body(c, inp):
                red_l, black_l = c
                i, kk = inp
                if fused:
                    return local_fused(base, i, red_l, black_l, T), None
                k_r, k_b = jax.random.split(kk)
                sc = shard * 2
                red_l = local_halfstep(
                    k_r, jnp.stack([base, i, sc]), black_l, True, T)
                black_l = local_halfstep(
                    k_b, jnp.stack([base, i, sc + 1]), red_l, False, T)
                return (red_l, black_l), None

            idxs = step_base + jnp.arange(n)
            (red_l, black_l), _ = jax.lax.scan(
                body, carry, (idxs, jax.random.split(k, n))
            )
            return red_l, black_l

        if n_burnin > 0:  # continuation chunks build with n_burnin == 0
            red_l, black_l = sweeps(
                (red_l, black_l), jnp.int32(0), jax.random.fold_in(key, 0),
                n_burnin
            )

        def collect(carry, i):
            red_l, black_l = carry
            red_l, black_l = sweeps(
                (red_l, black_l),
                burn_offset + i * n_sweeps,
                jax.random.fold_in(key, 1 + i),
                n_sweeps,
            )
            m, e = _local_observables(
                red_l, black_l, axis_name, periodic, J, field, col_axis
            )
            return (red_l, black_l), (m / n_sites, e)

        (red_l, black_l), (ms, es) = jax.lax.scan(
            collect, (red_l, black_l), start + jnp.arange(n_samples)
        )
        return ms, es, red_l, black_l

    return jax.jit(run)
