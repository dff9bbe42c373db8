"""Empirical decomposition of the fused kernel's per-site cost on the TPU.

Evidence behind the single-chip ceiling analysis in docs/BENCHMARKS.md:
kernel variants with the SAME memory traffic but progressively less
compute attribute the steady-state time to PRNG generation, neighbor
math, and the heat-bath select chain. Measured r4 (one v5e via tunnel,
best of trials, 4096^2, 500 sweeps/launch; committed artifact
visual_output/kernel_decomposition.json):

    baseline_fused  ~0.95e11 flips/s  (production kernel)
    nomath          ~1.6e11           (+ drop 2nd color, horiz rolls, table)
    prng_grouped    ~1.9e11           (+ drop neighbor reads/adds)
    prng_only       ~2.0e11           (PRNG + threshold + writes floor)

Conclusion: VPU-compute-bound (HBM sits at ~48% of the v5e bound at the
device rate), with an exact-heat-bath floor of ~5.3 ps/flip from PRNG +
16-bit threshold + plane writes alone. Run: python scripts/kernel_decomposition.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
from functools import partial

import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tsu_tpu.profiling import enable_compilation_cache
enable_compilation_cache()
from tsu_tpu.ops.checkerboard import split_checkerboard

SIZE, S = 4096, 500
R = SIZE
C2 = SIZE // 2
BR = 512
NB = R // BR


def make_kernel(mode):
    def kern(seed_ref, black_ref, up_ref, down_ref, red_out_ref, black_out_ref):
        i = pl.program_id(0)
        nb = pl.num_programs(0)
        black = black_ref[:].astype(jnp.float32)
        BR, C2 = black.shape
        gpb = BR // 8
        total_groups = nb * gpb
        if mode == "prng_only":
            # seed once per band, draw center-band bits, threshold at const
            pltpu.prng_seed(seed_ref[0], seed_ref[1] * nb + i)
            bits = pltpu.bitcast(pltpu.prng_random_bits((BR, C2)), jnp.uint32)
            lo = pltpu.bitcast(bits & jnp.uint32(0xFFFF), jnp.int32)
            hi = pltpu.bitcast(bits >> 16, jnp.int32)
            red_out_ref[:] = jnp.where(lo < 32768, 1.0, -1.0).astype(red_out_ref.dtype)
            black_out_ref[:] = jnp.where(hi < 32768, 1.0, -1.0).astype(black_out_ref.dtype)
            return
        if mode == "prng_grouped":
            # row-group seeding incl. extension groups (the production draw
            # pattern), threshold at const — isolates the seeding overhead
            draws = []
            for j in range(gpb + 2):
                g = (i * gpb - 1 + j) % total_groups
                pltpu.prng_seed(seed_ref[0], seed_ref[1] * total_groups + g)
                draws.append(pltpu.prng_random_bits((8, C2)))
            buf = pltpu.bitcast(jnp.concatenate(draws, axis=0), jnp.uint32)
            lo = pltpu.bitcast(buf & jnp.uint32(0xFFFF), jnp.int32)
            hi = pltpu.bitcast(buf >> 16, jnp.int32)
            red_out_ref[:] = jnp.where(lo[8:BR+8] < 32768, 1.0, -1.0).astype(red_out_ref.dtype)
            black_out_ref[:] = jnp.where(hi[8:BR+8] < 32768, 1.0, -1.0).astype(black_out_ref.dtype)
            return
        if mode == "nomath":
            # full draw pattern + neighbor reads, no heat-bath select chain
            draws = []
            for j in range(gpb + 2):
                g = (i * gpb - 1 + j) % total_groups
                pltpu.prng_seed(seed_ref[0], seed_ref[1] * total_groups + g)
                draws.append(pltpu.prng_random_bits((8, C2)))
            buf = pltpu.bitcast(jnp.concatenate(draws, axis=0), jnp.uint32)
            lo = pltpu.bitcast(buf & jnp.uint32(0xFFFF), jnp.int32)
            up2 = up_ref[0:2, :].astype(jnp.float32)
            down2 = down_ref[0:2, :].astype(jnp.float32)
            black_ext = jnp.concatenate([up2, black, down2], axis=0)
            nbr = black_ext[:-4, :] + black_ext[2:-2, :] + black_ext[4:, :]
            red_out_ref[:] = jnp.where(
                lo[8:BR+8].astype(jnp.float32) < nbr * 1000.0 + 32768.0,
                1.0, -1.0).astype(red_out_ref.dtype)
            black_out_ref[:] = red_out_ref[:]
            return
        raise ValueError(mode)
    return kern


def run_variant(mode, planes):
    red, black = planes
    kern = make_kernel(mode)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((BR, C2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, C2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((8, C2), lambda i: (i, 0), memory_space=pltpu.VMEM),
    ]
    grid_spec = pl.GridSpec(
        grid=(NB,), in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((BR, C2), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((BR, C2), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
    )

    @partial(jax.jit, static_argnames=())
    def sweeps(seed, red, black):
        halo = jnp.zeros((NB * 8, C2), black.dtype)
        def body(carry, k):
            red, black = carry
            out = pl.pallas_call(
                kern,
                out_shape=(jax.ShapeDtypeStruct((R, C2), black.dtype),
                           jax.ShapeDtypeStruct((R, C2), black.dtype)),
                grid_spec=grid_spec,
            )(jnp.stack([seed, k]), black, halo, halo)
            return out, None
        (red, black), _ = jax.lax.scan(body, (red, black), jnp.arange(S))
        return red, black

    red, black = sweeps(jnp.int32(1), red, black)
    np.asarray(red[:2, :2])
    best = 0.0
    for t in range(2):
        t0 = time.perf_counter()
        red, black = sweeps(jnp.int32(2 + t), red, black)
        np.asarray(red[:2, :2])
        dt = time.perf_counter() - t0
        best = max(best, R * C2 * 2 * S / dt)
    return best


def main():
    import json

    from tsu_tpu.ops.checkerboard_fused import fused_sweeps
    planes = split_checkerboard(jnp.ones((SIZE, SIZE), jnp.bfloat16))
    # Baseline: production fused kernel
    red, black = planes
    def step(red, black, i):
        return fused_sweeps(jnp.int32(1 + i * 7919), red, black, 2.269, S)
    red, black = step(red, black, 0)
    np.asarray(red[:2, :2])
    base = 0.0
    for i in range(1, 3):
        t0 = time.perf_counter()
        red, black = step(red, black, i)
        np.asarray(red[:2, :2])
        base = max(base, SIZE * SIZE * S / (time.perf_counter() - t0))
    print(f"baseline_fused: {base:.3e} flips/s")
    results = {"size": SIZE, "sweeps_per_launch": S,
               "baseline_fused": base}
    for mode in ("prng_only", "prng_grouped", "nomath"):
        try:
            f = run_variant(mode, planes)
            print(f"{mode}: {f:.3e} flips/s")
            results[mode] = f
        except Exception as e:
            print(f"{mode}: FAILED {repr(e)[:200]}")
            results[mode + "_error"] = str(e)[:200]
    # Committed evidence artifact behind the docs/BENCHMARKS.md ceiling
    # analysis; TPU runs only (a CPU smoke run must not clobber it).
    if jax.default_backend() == "tpu":
        os.makedirs("visual_output", exist_ok=True)
        with open("visual_output/kernel_decomposition.json", "w") as f:
            json.dump(results, f, indent=2)
        print("wrote visual_output/kernel_decomposition.json")


if __name__ == "__main__":
    main()
