"""Multi-host weak-scaling projection from single-chip measurements.

BASELINE.md demands measured samples/s at 1 chip / 1 host / N>=2 hosts with
>= 80% scaling efficiency. This environment has ONE tunneled chip, so the
N-chip rows cannot be *measured* here; this tool commits the honest
projection instead (r3 verdict #3) — the defensible analog of the
reference's fictional-hardware projection (/root/reference/tsu/hardware.py:
16-199), built from measured quantities plus published interconnect
bandwidths, with the methodology written down:

  1. MEASURED: the production sharded lattice path's per-sweep wall time on
     the real chip at the headline size (parallel/lattice.py fused path,
     4096^2, bf16) — includes the shard_map + in-shard halo machinery.
  2. ANALYTIC:  halo traffic per sweep per shard boundary is exactly
     2 boundary row-pairs x C columns x itemsize x 2 directions (the fused
     kernel consumes 2-row black halos; uniforms are regenerated, never
     shipped).
  3. PUBLISHED: interconnect bandwidth per chip-neighbor link. Defaults:
     ICI (intra-slice) 1.0e11 B/s conservative (v5e lists 1,600 Gbps
     aggregate ICI per chip over 4 links; one neighbor link sustains well
     over 100 GB/s each way), DCN (cross-host fallback) 2.5e10 B/s. A
     per-collective latency of 5 us covers ppermute launch overhead.
  4. Weak scaling: each added chip holds the same rows-per-device, so
     compute time per sweep is constant and only halo time + collective
     latency are added; efficiency = t_compute / (t_compute + t_halo).

Run on the chip: ``python scripts/scaling_projection.py`` writes
``visual_output/scaling_projection.json``. Pod hardware turns these rows
into one-command confirmations (scripts/pod_scaling.sh).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

ICI_BYTES_PER_S = 1.0e11   # conservative per-neighbor-link ICI bandwidth
DCN_BYTES_PER_S = 2.5e10   # conservative cross-host fallback
COLLECTIVE_LATENCY_S = 5e-6  # per ppermute pair launch overhead


def measure_sharded_sweep_time(size: int = 4096, n_sweeps: int = 2500,
                               trials: int = 3) -> dict:
    """Measured per-sweep wall time of the PRODUCTION sharded path on the
    visible chip (1-device mesh, fused kernel, bf16 — the program every
    multi-chip row would scale).

    Delegates to the ONE sharded-path measurement harness
    (tsu_tpu/benchmarks/scaling.py:measure_lattice_matched) so this
    artifact and the committed matched-size scaling row can never diverge
    in methodology (r4 review finding: two hand-rolled copies).
    """
    from tsu_tpu.benchmarks.scaling import measure_lattice_matched

    m = measure_lattice_matched(size=size, n_sweeps=n_sweeps,
                                n_iters=trials)
    itemsize = jnp.dtype(m["dtype"]).itemsize
    return {
        "size": m["size"],
        "n_sweeps": m["n_sweeps"],
        "dtype": m["dtype"],
        "itemsize": itemsize,
        "sweep_time_s": m["size"] * m["size"] / m["flips_per_s"],
        "flips_per_s": m["flips_per_s"],
        "backend": jax.default_backend(),
    }


def project(measured: dict, n_chips: int, link_bytes_per_s: float) -> dict:
    """Weak-scaling projection: n_chips shards, same rows/chip as measured.

    Halo per sweep per shard: the fused path exchanges the 2 boundary rows
    of the black plane in each direction (compact width C/2), plus the
    1-row observable halo amortized over thinning (ignored, <2%).
    """
    size = measured["size"]
    item = measured["itemsize"]
    halo_bytes = 2 * (size // 2) * item * 2  # 2 rows x C/2 cols x 2 dirs
    t_halo = halo_bytes / link_bytes_per_s + 2 * COLLECTIVE_LATENCY_S
    t_compute = measured["sweep_time_s"]
    eff = t_compute / (t_compute + t_halo)
    return {
        "n_chips": n_chips,
        "rows_per_chip": size,
        "lattice": f"{size * n_chips}x{size}",
        "halo_bytes_per_sweep_per_shard": halo_bytes,
        "halo_time_s": t_halo,
        "compute_time_s": t_compute,
        "projected_efficiency": round(eff, 4),
        "projected_aggregate_flips_per_s": measured["flips_per_s"] * n_chips * eff,
    }


def main():
    from tsu_tpu.profiling import enable_compilation_cache

    enable_compilation_cache()
    measured = measure_sharded_sweep_time()
    out = {
        "methodology": (
            "weak scaling projected from the measured 1-chip sharded-path "
            "sweep time; halo traffic analytic (2-row black halos x 2 "
            "directions); link bandwidths published/conservative; "
            "efficiency = t_compute / (t_compute + t_halo + latency)"
        ),
        "assumptions": {
            "ici_bytes_per_s_per_link": ICI_BYTES_PER_S,
            "dcn_bytes_per_s": DCN_BYTES_PER_S,
            "collective_latency_s": COLLECTIVE_LATENCY_S,
        },
        "measured_1chip": measured,
        "projected_ici": [project(measured, n, ICI_BYTES_PER_S)
                          for n in (2, 4, 8)],
        "projected_dcn_2host": project(measured, 2, DCN_BYTES_PER_S),
    }
    print(json.dumps(out, indent=2))
    os.makedirs("visual_output", exist_ok=True)
    path = os.path.join("visual_output", "scaling_projection.json")
    # A CPU smoke run must not clobber the committed chip measurement.
    if jax.default_backend() == "tpu" or "--force-write" in sys.argv:
        with open(path, "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
