"""Probe: engineered-ladder PT ground-state search on the real chip.

Calibrates the spin_glass_ea benchmark row (r5 verdict #1): ladder size,
swap acceptance, gap vs the literature GS density -1.4015, wall time.
Run: python scripts/pt_spin_glass_probe.py [L] [n_iters]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import numpy as np

from tsu_tpu.profiling import enable_compilation_cache
from tsu_tpu.samplers.tempering_ladder import (
    build_tempering_ladder,
    pt_ground_state_search,
)

EA_GS_DENSITY = -1.4015


def main():
    enable_compilation_cache()
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n_iters = int(sys.argv[2]) if len(sys.argv) > 2 else 2000
    n_copies = int(sys.argv[3]) if len(sys.argv) > 3 else 1
    n_sweeps = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    key = jax.random.key(7)
    Jh = jnp.where(jax.random.bernoulli(jax.random.fold_in(key, 0), 0.5,
                                        (L, L)), 1.0, -1.0)
    Jv = jnp.where(jax.random.bernoulli(jax.random.fold_in(key, 1), 0.5,
                                        (L, L)), 1.0, -1.0)

    T_min = float(os.environ.get("PT_TMIN", "0.4"))
    fb_iters = int(os.environ.get("PT_FB_ITERS", "512"))
    t0 = time.perf_counter()
    temps, info = build_tempering_ladder(
        jax.random.fold_in(key, 2), Jh, Jv, T_min=T_min, T_max=2.0,
        target_acceptance=0.3, accept_floor=0.2,
        feedback_iters=fb_iters, feedback_burnin=fb_iters // 4)
    t_build = time.perf_counter() - t0
    meas = info["measured_pair_acceptance"]
    print(json.dumps({
        "stage": "ladder", "n_rungs": info["n_rungs"],
        "capped": bool(info["capped"]),
        "build_time_s": round(t_build, 1),
        "measured_acc_min": float(meas.min()) if meas is not None else None,
        "measured_acc_mean": float(meas.mean()) if meas is not None else None,
        "feedback_rounds": info["feedback_rounds_run"],
    }), flush=True)

    hd_every = int(os.environ.get("PT_HD_EVERY", "0"))
    chunk = int(os.environ.get("PT_CHUNK", "0")) or None
    t0 = time.perf_counter()
    out = pt_ground_state_search(
        jax.random.fold_in(key, 3), Jh, Jv, temperatures=temps,
        n_iters=n_iters, n_sweeps=n_sweeps, n_copies=n_copies,
        houdayer_every=hd_every, quench_sweeps=256, chunk_iters=chunk)
    t_run = time.perf_counter() - t0
    gap = (out["energy_per_site"] - EA_GS_DENSITY) / abs(EA_GS_DENSITY)
    print(json.dumps({
        "stage": "gs", "L": L, "n_iters": n_iters,
        "n_copies": n_copies, "n_sweeps": n_sweeps,
        "houdayer_every": hd_every,
        "energy_per_site": round(out["energy_per_site"], 5),
        "gap_vs_lit": round(gap, 5),
        "swap_acc": round(out["swap_acceptance_rate"], 3),
        "pair_acc_min": round(float(out["pair_acceptance"].min()), 3),
        "run_time_s": round(t_run, 1),
        "discrete": out["discrete_table_path"],
    }), flush=True)


if __name__ == "__main__":
    main()
