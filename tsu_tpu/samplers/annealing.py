"""Simulated annealing as a compiled temperature-schedule scan.

The reference anneals by mutating its config each step and re-entering the
Python sweep loop (tsu/gibbs.py:340-393, quirk Q8). Here the schedule is a
traced array consumed by one ``lax.scan``; multiple chains anneal in parallel
(vmapped / shardable on the ``chains`` mesh axis) and the best state is a
running on-device reduction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

import numpy as np

from tsu_tpu.samplers.gibbs import (
    blocked_sweeps,
    boltzmann_energy_batch,
    color_groups,
)


def make_schedule(T_initial: float, T_final: float, n_steps: int, kind: str = "exponential"):
    """Temperature schedule array (n_steps,) (cf. tsu/gibbs.py:370-379).

    Built host-side (NumPy): schedules feed both the compiled scan and the
    native host SA loop, and must not cost a device round-trip."""
    t = np.arange(n_steps, dtype=np.float32) / max(n_steps - 1, 1)
    if kind == "exponential":
        return np.float32(T_initial) * np.float32(T_final / T_initial) ** t
    if kind == "linear":
        return np.float32(T_initial) + np.float32(T_final - T_initial) * t
    raise ValueError(f"unknown cooling schedule {kind!r}")


@partial(jax.jit, static_argnames=("n_steps", "n_chains"))
def _sa_dense_scan(key, J, h, colors, schedule, *, n_steps: int, n_chains: int):
    n = J.shape[0]
    k_init, k_run = jax.random.split(key)
    states = jax.random.bernoulli(k_init, 0.5, (n_chains, n)).astype(jnp.float32)

    def body(carry, inp):
        states, best_states, best_e = carry
        T, k = inp
        states = blocked_sweeps(k, states, J, h, T, colors, 1)
        e = boltzmann_energy_batch(states, J, h)  # (chains,)
        better = e < best_e
        best_states = jnp.where(better[:, None], states, best_states)
        best_e = jnp.minimum(e, best_e)
        return (states, best_states, best_e), None

    e0 = boltzmann_energy_batch(states, J, h)
    (_, best_states, best_e), _ = jax.lax.scan(
        body, (states, states, e0), (schedule, jax.random.split(k_run, n_steps))
    )
    i = jnp.argmin(best_e)
    return best_states[i], best_e[i]


def simulated_annealing_dense(
    key,
    J,
    h,
    *,
    T_initial: float = 10.0,
    T_final: float = 0.1,
    n_steps: int = 1000,
    cooling_schedule: str = "exponential",
    n_chains: int = 1,
):
    """Anneal bit states on dense J; returns (best_state, best_energy) over
    all chains and steps (cf. tsu/gibbs.py:340-393).

    All chains advance together through colored block sweeps — one compiled
    scan over the temperature schedule, batched matmul local fields.

    ``key`` may be a jax PRNG key or a plain integer seed. Small problems
    (n_vars <= 256 and modest total work) with an integer seed route to the
    native C++ host loop: a single tunneled-accelerator dispatch costs
    ~50 ms round-trip, more than the whole anneal (r2: maxcut rows timed
    dispatch latency, not annealing).
    """
    J_np = np.asarray(J, np.float32)
    n = J_np.shape[0]
    small = (n <= 256
             and n * n * n_steps * max(n_chains, 1) <= (1 << 31))
    if small and isinstance(key, (int, np.integer)):
        from tsu_tpu.native import sa_dense_native

        schedule_np = np.asarray(
            make_schedule(T_initial, T_final, n_steps, cooling_schedule)
        )
        out = sa_dense_native(J_np, np.asarray(h, np.float32), schedule_np,
                              n_chains, int(key))
        if out is not None:
            # Host arrays out: wrapping in jnp.asarray would ship the result
            # to the accelerator only for the caller to fetch it back.
            return out[0], np.float32(out[1])
    if isinstance(key, (int, np.integer)):
        from tsu_tpu.rng import as_key

        key = as_key(int(key))
    schedule = make_schedule(T_initial, T_final, n_steps, cooling_schedule)
    colors = jnp.asarray(color_groups(J_np))
    return _sa_dense_scan(
        key, jnp.asarray(J, jnp.float32), jnp.asarray(h, jnp.float32),
        colors, schedule, n_steps=n_steps, n_chains=n_chains,
    )


def anneal_lattice(
    key,
    shape,
    *,
    J: float = 1.0,
    field: float = 0.0,
    T_initial: float = 5.0,
    T_final: float = 0.05,
    n_steps: int = 1000,
    cooling_schedule: str = "exponential",
    n_chains: int = 1,
    periodic: bool = True,
    use_pallas: bool | None = None,
    track_every: int = 10,
):
    """Anneal 2-D lattices with checkerboard sweeps; returns
    (best_state (R, C), best_energy).

    ``use_pallas`` (default auto: TPU + rows divisible by 8) anneals ALL
    chains through the batched fused kernel — one kernel call per sweep of
    the whole ensemble, per-sweep schedule temperatures via the threshold
    table — with best-energy tracking every ``track_every`` sweeps (an
    energy evaluation costs about one sweep, so per-sweep tracking would
    halve throughput; heat-bath at the low end of the schedule is
    monotone-greedy, so chunked tracking loses nothing in practice).
    """
    from tsu_tpu.ops.checkerboard import checkerboard_sweeps, lattice_energy_batch

    if use_pallas is None:
        use_pallas = (jax.default_backend() == "tpu" and shape[0] % 8 == 0)

    schedule = make_schedule(T_initial, T_final, n_steps, cooling_schedule)
    k_init, k_run = jax.random.split(key)
    states = jnp.where(
        jax.random.bernoulli(k_init, 0.5, (n_chains,) + tuple(shape)), 1.0, -1.0
    ).astype(jnp.float32)

    if use_pallas:
        from tsu_tpu.ops.checkerboard import (
            merge_checkerboard,
            split_checkerboard,
        )
        from tsu_tpu.ops.checkerboard_fused import fused_sweep_batched

        # Exactly n_steps sweeps: full chunks through the scan plus one
        # remainder chunk (r4 review finding: padding the schedule to a
        # track_every multiple silently ran up to track_every-1 extra
        # sweeps, making cross-backend comparisons and flips/s accounting
        # inexact).
        n_full = n_steps // track_every
        rem = n_steps % track_every
        sched = jnp.asarray(
            schedule[: n_full * track_every]
        ).reshape(n_full, track_every)
        seeds = jax.random.randint(k_run, (n_chains,), 0, 2**30,
                                   dtype=jnp.int32)

        @jax.jit
        def run(states):
            reds, blacks = jax.vmap(split_checkerboard)(
                states.astype(jnp.bfloat16))
            e0 = lattice_energy_batch(states, J=J, field=field,
                                      periodic=periodic)

            def sweeps(reds, blacks, step_base, temps, n):
                def sweep(c, inp2):
                    reds, blacks = c
                    j, T = inp2
                    g = step_base + j  # global sweep counter
                    reds, blacks = fused_sweep_batched(
                        jnp.stack([seeds, jnp.full_like(seeds, g)], axis=1),
                        reds, blacks, jnp.full((n_chains,), T),
                        J=J, field=field, periodic=periodic,
                    )
                    return (reds, blacks), None

                (reds, blacks), _ = jax.lax.scan(
                    sweep, (reds, blacks), (jnp.arange(n), temps)
                )
                return reds, blacks

            def track(reds, blacks, best_r, best_b, best_e):
                lat = jax.vmap(merge_checkerboard)(
                    reds.astype(jnp.float32), blacks.astype(jnp.float32))
                e = lattice_energy_batch(lat, J=J, field=field,
                                         periodic=periodic)
                better = e < best_e
                best_r = jnp.where(better[:, None, None], reds, best_r)
                best_b = jnp.where(better[:, None, None], blacks, best_b)
                return best_r, best_b, jnp.minimum(e, best_e)

            def chunk(carry, inp):
                reds, blacks, best_r, best_b, best_e = carry
                chunk_idx, temps = inp
                reds, blacks = sweeps(reds, blacks,
                                      chunk_idx * track_every, temps,
                                      track_every)
                best_r, best_b, best_e = track(reds, blacks,
                                               best_r, best_b, best_e)
                return (reds, blacks, best_r, best_b, best_e), None

            carry = (reds, blacks, reds, blacks, e0)
            if n_full > 0:
                carry, _ = jax.lax.scan(
                    chunk, carry, (jnp.arange(n_full), sched)
                )
            reds, blacks, best_r, best_b, best_e = carry
            if rem > 0:
                reds, blacks = sweeps(
                    reds, blacks, n_full * track_every,
                    jnp.asarray(schedule[-rem:]), rem)
                best_r, best_b, best_e = track(reds, blacks,
                                               best_r, best_b, best_e)
            best = jax.vmap(merge_checkerboard)(
                best_r.astype(jnp.float32), best_b.astype(jnp.float32))
            return best, best_e

        best_states, best_es = run(states)
        i = int(jnp.argmin(best_es))
        return best_states[i], float(best_es[i])

    @jax.jit
    def run(states, keys):
        def chain(key, state):
            def body(carry, inp):
                state, best_state, best_e = carry
                T, k = inp
                state = checkerboard_sweeps(k, state, T, 1, J=J, field=field, periodic=periodic)
                e = lattice_energy_batch(state, J=J, field=field, periodic=periodic)
                better = e < best_e
                best_state = jnp.where(better, state, best_state)
                best_e = jnp.minimum(e, best_e)
                return (state, best_state, best_e), None

            e0 = lattice_energy_batch(state, J=J, field=field, periodic=periodic)
            (_, best_state, best_e), _ = jax.lax.scan(
                body, (state, state, e0), (schedule, jax.random.split(key, n_steps))
            )
            return best_state, best_e

        return jax.vmap(chain)(keys, states)

    best_states, best_es = run(states, jax.random.split(k_run, n_chains))
    i = int(jnp.argmin(best_es))
    return best_states[i], float(best_es[i])


def discrete_table_applicable(Jh, Jv, field) -> bool:
    """True when the +-J threshold-table kernel path is EXACT: the per-site
    local field must stay on the 9 integers -4..4 the table covers, i.e.
    every bond in {-1, 0, +1} AND zero field. A nonzero field — even an
    integer one — pushes the local field to +-5, which would silently fall
    through to the wrong table entry (r4 review finding #1).
    """
    Jh = jnp.asarray(Jh)
    Jv = jnp.asarray(Jv)
    return bool(
        jnp.all(jnp.isin(Jh, jnp.array([-1.0, 0.0, 1.0])))
        and jnp.all(jnp.isin(Jv, jnp.array([-1.0, 0.0, 1.0])))
        and float(field) == 0.0
    )


def pure_pm1_applicable(Jh, Jv, field, periodic: bool) -> bool:
    """True when the 5-entry even-parity threshold path is EXACT: every
    bond +-1 (no zeros), zero field, periodic lattice — the 4-term local
    field is then always even, halving the kernel's select chain (the
    fused uniform kernel's parity trick). Zero bonds or open boundaries
    produce odd local fields and need the full 9-entry table."""
    Jh = jnp.asarray(Jh)
    Jv = jnp.asarray(Jv)
    return bool(
        periodic
        and float(field) == 0.0
        and jnp.all(jnp.abs(Jh) == 1.0)
        and jnp.all(jnp.abs(Jv) == 1.0)
    )


def anneal_spin_glass(
    key,
    Jh,
    Jv,
    *,
    field: float = 0.0,
    T_initial: float = 3.0,
    T_final: float = 0.05,
    n_steps: int = 2000,
    cooling_schedule: str = "exponential",
    n_restarts: int = 1,
    periodic: bool = True,
    use_pallas: bool | None = None,
    checkpoint_path: str | None = None,
    resume: bool = False,
):
    """Ground-state search on a DISORDERED lattice (per-bond couplings, e.g.
    the +-J Edwards-Anderson spin glass): annealed checkerboard sweeps with
    a per-sweep temperature schedule, best state over ``n_restarts``
    independent anneals. Returns (best_state (R, C), best_energy).

    ``checkpoint_path`` snapshots (best state, best energy, restarts done)
    after every completed restart; ``resume=True`` skips finished restarts.
    Each restart's stream is fold_in(key, restart), so the resumed search
    returns exactly what the uninterrupted one would (SURVEY §5.4).

    On TPU the schedule runs through the Pallas bond kernel; +-1 bonds with
    an integer field auto-select the discrete threshold-table path
    (~6.5e10 flips/s — a 4096^2 spin-glass anneal of 2000 sweeps is ~0.5 s
    of device time). Off-TPU (or for continuous bonds at small sizes) the
    XLA engine's on-device best-tracking anneal runs instead
    (ops/checkerboard_bonds.anneal_lattice_bonds).
    """
    from tsu_tpu.ops.checkerboard import merge_checkerboard, split_checkerboard
    from tsu_tpu.ops.checkerboard_bonds import (
        anneal_lattice_bonds,
        color_bond_weights,
        lattice_energy_bonds,
    )

    Jh = jnp.asarray(Jh, jnp.float32)
    Jv = jnp.asarray(Jv, jnp.float32)
    R, C = Jh.shape
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu" and R % 8 == 0
    discrete = discrete_table_applicable(Jh, Jv, field)
    pure = discrete and pure_pm1_applicable(Jh, Jv, field, periodic)
    weights = color_bond_weights(Jh, Jv, field, periodic=periodic)
    packed = bool(use_pallas and discrete)
    if packed:
        # One bf16 code plane per color instead of five weight planes:
        # the discrete kernel measured at the HBM roofline, so packing is
        # a direct throughput win (pack_bond_codes).
        from tsu_tpu.ops.checkerboard_bonds import pack_bond_codes

        kernel_weights = pack_bond_codes(weights)
    else:
        kernel_weights = weights
    schedule = jnp.asarray(
        make_schedule(T_initial, T_final, n_steps, cooling_schedule))

    if use_pallas:
        from tsu_tpu.ops.checkerboard_bonds_pallas import (
            checkerboard_sweeps_bonds_pallas,
        )

        dtype = jnp.bfloat16 if discrete else jnp.float32
        # Chunked best-state tracking entirely ON DEVICE in one jitted
        # program per restart (r4 review: the first draft host-looped the
        # chunks with a blocking energy sync per chunk — ~20 dispatches
        # and host round-trips per restart; this is the anneal_lattice
        # pattern). The XLA anneal tracks best per sweep; an energy eval
        # costs ~one sweep, so the kernel path checks every ~n_steps/20
        # sweeps. With n_steps=0 the initial lattice + its energy return.
        track_every = max(1, n_steps // 20)
        n_full = n_steps // track_every
        rem = n_steps % track_every
        sched_full = schedule[: n_full * track_every].reshape(
            n_full, track_every) if n_full else schedule[:0]

        @jax.jit
        def run_pallas(lat0, seed):
            red, black = split_checkerboard(lat0.astype(dtype))
            e0 = lattice_energy_bonds(lat0, Jh, Jv, field, periodic=periodic)

            def track(red, black, br, bb, be):
                lat = merge_checkerboard(red.astype(jnp.float32),
                                         black.astype(jnp.float32))
                e = lattice_energy_bonds(lat, Jh, Jv, field,
                                         periodic=periodic)
                better = e < be
                br = jnp.where(better, red, br)
                bb = jnp.where(better, black, bb)
                return br, bb, jnp.minimum(e, be)

            def chunk(carry, inp):
                red, black, br, bb, be = carry
                ci, temps = inp
                # Per-chunk seed stride: the in-call sweep counter restarts
                # each chunk, so the base seed must differ (fold_seed
                # avalanches the addition into an independent stream).
                red, black = checkerboard_sweeps_bonds_pallas(
                    seed + ci * jnp.int32(1_000_033), red, black,
                    kernel_weights, temps, track_every, periodic=periodic,
                    discrete=discrete, packed=packed, pure=pure,
                )
                br, bb, be = track(red, black, br, bb, be)
                return (red, black, br, bb, be), None

            carry = (red, black, red, black, e0)
            if n_full > 0:
                carry, _ = jax.lax.scan(
                    chunk, carry, (jnp.arange(n_full), sched_full))
            red, black, br, bb, be = carry
            if rem > 0:
                red, black = checkerboard_sweeps_bonds_pallas(
                    seed + jnp.int32(n_full * 1_000_033), red, black,
                    kernel_weights, schedule[-rem:], rem, periodic=periodic,
                    discrete=discrete, packed=packed, pure=pure,
                )
                br, bb, be = track(red, black, br, bb, be)
            return merge_checkerboard(br.astype(jnp.float32),
                                      bb.astype(jnp.float32)), be

    best_state, best_e = None, float("inf")
    r_start = 0
    if resume and checkpoint_path is not None:
        import os

        from tsu_tpu.checkpoint import restore_state

        ckpt_file = checkpoint_path if checkpoint_path.endswith(".npz") \
            else checkpoint_path + ".npz"
        if os.path.exists(ckpt_file) or os.path.exists(checkpoint_path):
            st = restore_state(checkpoint_path, {
                "best_state": jnp.zeros((R, C), jnp.float32),
                "best_e": jnp.float32(0.0),
                "restarts_done": jnp.int32(0)})
            r_start = int(st["restarts_done"])
            if r_start > 0:
                best_state = np.asarray(st["best_state"])
                best_e = float(st["best_e"])
    for r in range(r_start, n_restarts):
        k_init, k_run = jax.random.split(jax.random.fold_in(key, r))
        lat0 = jnp.where(jax.random.bernoulli(k_init, 0.5, (R, C)), 1.0, -1.0)
        if use_pallas:
            seed = jax.random.randint(k_run, (), 0, 2**30, dtype=jnp.int32)
            lat, e = run_pallas(lat0, seed)
            lat, e = jnp.asarray(lat), float(e)
        else:
            lat, e = anneal_lattice_bonds(
                k_run, lat0, Jh, Jv, T_initial=T_initial, T_final=T_final,
                n_steps=n_steps, field=field, periodic=periodic,
            )
            lat, e = jnp.asarray(lat), float(e)
        if e < best_e:
            best_state, best_e = np.asarray(lat), e
        if checkpoint_path is not None:
            from tsu_tpu.checkpoint import save_state

            save_state(checkpoint_path, {
                "best_state": jnp.asarray(best_state, jnp.float32),
                "best_e": jnp.float32(best_e),
                "restarts_done": jnp.int32(r + 1)})
    return best_state, best_e
