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
