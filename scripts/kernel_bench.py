"""Microbenchmark + correctness probe for the checkerboard kernels.

Usage: python scripts/kernel_bench.py [fused|resident|xla|all] [--size N]
       [--sweeps S] [--dtype bf16|f32] [--check]

Times flips/s at the given size and optionally cross-checks moments against
the XLA path at 128^2 (statistical: <|m|> and <e> within MC error). This is a
developer tool; the driver-facing headline bench stays in bench.py.
"""

import argparse
import time

import numpy as np
import jax
import jax.numpy as jnp

from tsu_tpu.ops.checkerboard import (
    checkerboard_sweeps_planes,
    lattice_energy_batch,
    merge_checkerboard,
    split_checkerboard,
)


def throughput(step_fn, planes, n_iters, sweeps_per_iter):
    red, black = planes
    red, black = step_fn(red, black, 0)
    np.asarray(red[:2, :2])
    t0 = time.perf_counter()
    for i in range(1, n_iters + 1):
        red, black = step_fn(red, black, i)
    np.asarray(red[:2, :2])
    np.asarray(black[:2, :2])
    dt = time.perf_counter() - t0
    n_sites = red.shape[0] * red.shape[1] * 2
    return n_sites * n_iters * sweeps_per_iter / dt


def moments(step_fn, R=128, C=128, T=2.5, n_samp=400, thin=2, dtype=jnp.float32):
    @jax.jit
    def run(red, black):
        def body(carry, i):
            red, black = carry
            red, black = step_fn(red, black, 1 + i)
            lat = merge_checkerboard(red.astype(jnp.float32),
                                     black.astype(jnp.float32))
            return (red, black), (
                jnp.mean(lat),
                lattice_energy_batch(lat, J=1.0, field=0.0, periodic=True)
                / (R * C),
            )

        red, black = step_fn(red, black, 0)
        (_, _), (ms, es) = jax.lax.scan(body, (red, black), jnp.arange(n_samp))
        return ms, es

    red, black = split_checkerboard(jnp.ones((R, C), dtype))
    ms, es = run(red, black)
    return float(np.abs(np.asarray(ms)).mean()), float(np.asarray(es).mean())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", nargs="?", default="all")
    ap.add_argument("--size", type=int, default=4096)
    ap.add_argument("--sweeps", type=int, default=500)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "f32"])
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    R = C = args.size
    T = 2.269
    S = args.sweeps

    steps = {}

    def xla_step(red, black, i, n=10):
        return checkerboard_sweeps_planes(
            jax.random.fold_in(jax.random.key(0), i), red, black, T, n,
            J=1.0, field=0.0, periodic=True)

    if args.which in ("xla", "all"):
        steps["xla(10/launch)"] = (
            lambda r, b, i: xla_step(r, b, i), 10, jnp.float32)

    if args.which in ("fused", "all"):
        from tsu_tpu.ops.checkerboard_fused import fused_sweeps

        steps["fused"] = (
            lambda r, b, i: fused_sweeps(jnp.int32(1 + i * 7919), r, b, T, S,
                                         J=1.0, field=0.0, periodic=True),
            S, dtype)

    if args.which in ("resident", "all"):
        from tsu_tpu.ops.checkerboard_resident import resident_sweeps

        steps["resident"] = (
            lambda r, b, i: resident_sweeps(jnp.int32(1 + i * 7919), r, b, T,
                                            jnp.int32(S), J=1.0, field=0.0,
                                            periodic=True),
            S, dtype)

    for name, (fn, spl, dt) in steps.items():
        if args.check:
            m, e = moments(fn, dtype=dt)
            print(f"{name:24s} 128^2 T=2.5: <|m|>={m:.4f} <e>={e:.4f}")
        planes = split_checkerboard(jnp.ones((R, C), dt))
        try:
            fl = throughput(fn, planes, args.iters, spl)
            print(f"{name:24s} {R}x{C} {args.dtype}: {fl:.3e} flips/s")
        except Exception as ex:  # noqa: BLE001
            print(f"{name:24s} {R}x{C} {args.dtype}: FAILED {str(ex)[:160]}")


if __name__ == "__main__":
    main()
