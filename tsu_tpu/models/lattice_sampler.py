"""Single-device lattice sampling entry: picks the Pallas or XLA backend.

Thin glue between IsingGrid (tsu_tpu/models/ising.py) and the checkerboard
engines (tsu_tpu/ops/). Both backends implement identical heat-bath
semantics; tests cross-validate them statistically.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tsu_tpu.ops.checkerboard import (
    checkerboard_sweeps_planes,
    merge_checkerboard,
    split_checkerboard,
)


@partial(
    jax.jit,
    static_argnames=("n_samples", "n_burnin", "n_sweeps", "J", "field",
                     "periodic", "use_pallas"),
)
def sample_grid(
    key,
    lattice0,
    *,
    n_samples: int,
    temperature,
    J: float = 1.0,
    field: float = 0.0,
    n_burnin: int = 100,
    n_sweeps: int = 1,
    periodic: bool = False,
    use_pallas: bool = False,
):
    """Checkerboard-Gibbs sample a (R, C) lattice; returns (n_samples, R, C)."""
    red, black = split_checkerboard(lattice0)

    if use_pallas:
        # Derive disjoint int32 seed ranges from the key: each sweeps-call
        # consumes O(nblocks) seeds per sweep; stride generously.
        base = jax.random.randint(key, (), 0, 2**30, dtype=jnp.int32)
        R, C = lattice0.shape

        if R % 8 == 0:
            # Fastest path: the fused kernel (red+black in one grid pass,
            # bf16 storage — spins are exact in bf16). Its row-band grid
            # pipelines HBM traffic against compute, which beats the
            # VMEM-resident kernel's serial chunk loop at every measured
            # size (docs/BENCHMARKS.md).
            from tsu_tpu.ops.checkerboard_fused import fused_sweeps

            def sweeps(i, red, black, n):
                red16, black16 = fused_sweeps(
                    base + i * jnp.int32(1_000_033),
                    red.astype(jnp.bfloat16), black.astype(jnp.bfloat16),
                    temperature, n, J=J, field=field, periodic=periodic,
                )
                return red16.astype(red.dtype), black16.astype(black.dtype)
        else:
            from tsu_tpu.ops.checkerboard_pallas import (
                checkerboard_sweeps_planes_pallas,
            )

            def sweeps(i, red, black, n):
                return checkerboard_sweeps_planes_pallas(
                    base + i * jnp.int32(1_000_033), red, black, temperature, n,
                    J=J, field=field, periodic=periodic,
                )
    else:

        def sweeps(i, red, black, n):
            return checkerboard_sweeps_planes(
                jax.random.fold_in(key, i), red, black, temperature, n,
                J=J, field=field, periodic=periodic,
            )

    red, black = sweeps(0, red, black, n_burnin)

    def collect(carry, i):
        red, black = carry
        red, black = sweeps(1 + i, red, black, n_sweeps)
        return (red, black), merge_checkerboard(red, black)

    _, states = jax.lax.scan(collect, (red, black), jnp.arange(n_samples))
    return states


@partial(
    jax.jit,
    static_argnames=("n_samples", "n_burnin", "n_sweeps", "J", "field",
                     "periodic", "use_pallas"),
)
def sample_grid_ensemble(
    key,
    lattices0,
    temperatures,
    *,
    n_samples: int,
    J: float = 1.0,
    field: float = 0.0,
    n_burnin: int = 100,
    n_sweeps: int = 1,
    periodic: bool = True,
    use_pallas: bool | None = None,
):
    """Sample an ENSEMBLE of lattices, each at its own temperature, in one
    compiled program — every sweep of every member is a single batched
    fused-kernel launch (ops/checkerboard_fused.fused_sweeps_batched).

    The TPU-native replacement for per-temperature Python loops: a whole
    phase-transition scan (B temperature points x one lattice each) or an
    independent-replica error-bar ensemble runs at fused-kernel speed.
    Per-member PRNG streams are decorrelated by member-indexed seeds
    (hardware-verified in tests/test_tpu_kernels.py).

    Args:
        lattices0: (B, R, C) initial spin configurations (+-1).
        temperatures: scalar or (B,) — per-member temperatures.
    Returns:
        dict with per-sample per-member observables, shapes (n_samples, B):
        ``magnetization`` (per spin) and ``energy`` (total), matching
        ops/checkerboard.sample_lattice conventions.
    """
    from tsu_tpu.ops.checkerboard import lattice_energy_batch

    B, R, C = lattices0.shape
    n_sites = R * C
    if use_pallas is None:
        # The fused batched kernel's hardware PRNG has no CPU lowering
        # outside interpret mode, so the default must be backend-aware
        # (r4 review finding: a bare use_pallas=True default crashed CPU
        # callers).
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and R % 8 == 0:
        from tsu_tpu.ops.checkerboard_fused import fused_sweeps_batched

        dtype = jnp.bfloat16
        reds, blacks = jax.vmap(split_checkerboard)(
            lattices0.astype(dtype))
        seeds = jax.random.randint(key, (B,), 0, 2**30, dtype=jnp.int32)

        def sweeps(i, reds, blacks, n):
            # Per-call seed stride keeps streams fresh across burn-in and
            # every thinning block (the in-call sweep counter restarts).
            return fused_sweeps_batched(
                seeds + i * jnp.int32(1_000_033), reds, blacks,
                temperatures, n, J=J, field=field, periodic=periodic,
            )
    else:
        from tsu_tpu.ops.checkerboard import checkerboard_sweeps_planes

        dtype = jnp.float32
        reds, blacks = jax.vmap(split_checkerboard)(
            lattices0.astype(dtype))
        Ts = jnp.broadcast_to(
            jnp.asarray(temperatures, jnp.float32).reshape(-1), (B,))

        def sweeps(i, reds, blacks, n):
            ks = jax.random.split(jax.random.fold_in(key, i), B)
            return jax.vmap(
                lambda k, r, b, T: checkerboard_sweeps_planes(
                    k, r, b, T, n, J=J, field=field, periodic=periodic)
            )(ks, reds, blacks, Ts)

    reds, blacks = sweeps(0, reds, blacks, n_burnin)

    def collect(carry, i):
        reds, blacks = carry
        reds, blacks = sweeps(1 + i, reds, blacks, n_sweeps)
        lat = jax.vmap(merge_checkerboard)(
            reds.astype(jnp.float32), blacks.astype(jnp.float32))
        m = jnp.sum(lat, axis=(-2, -1)) / n_sites
        e = lattice_energy_batch(lat, J=J, field=field, periodic=periodic)
        return (reds, blacks), (m, e)

    _, (ms, es) = jax.lax.scan(collect, (reds, blacks),
                               jnp.arange(n_samples))
    return {"magnetization": ms, "energy": es}
