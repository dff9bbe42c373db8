#!/bin/sh
# One-command multi-host scaling run (BASELINE.md: 1 chip / 1 host / N hosts
# rows at >= 80% efficiency).
#
# Run THIS SAME COMMAND on every host of the pod slice (e.g. via
# `gcloud compute tpus tpu-vm ssh $TPU --worker=all --command=...`).
# jax.distributed.initialize() discovers the topology from the TPU runtime
# environment; no flags are needed on Cloud TPU VMs. For other clusters set
# the standard JAX env (COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID).
#
# Artifacts: visual_output/scaling_<backend><n_devices>_h<n_hosts>.json on
# host 0 only. Commit the artifact beside scaling_cpu8.json.
#
# Usage: sh scripts/pod_scaling.sh [output_dir]
set -e
cd "$(dirname "$0")/.."
OUT_DIR="${1:-visual_output}"
python - "$OUT_DIR" <<'EOF'
import json
import os
import sys

import jax

os.makedirs(sys.argv[1], exist_ok=True)

try:
    jax.distributed.initialize()  # no-op args on Cloud TPU VMs
except Exception as e:  # single-host fallback: still produces the 1-host row
    print(f"jax.distributed.initialize skipped: {e}", file=sys.stderr)

from tsu_tpu.benchmarks.scaling import (  # noqa: E402
    measure_chains_scaling,
    measure_lattice_scaling,
)

backend = jax.default_backend()
result = {
    "topology": {
        "backend": backend,
        "n_devices": len(jax.devices()),
        "n_local_devices": len(jax.local_devices()),
        "n_hosts": jax.process_count(),
    },
    "chains": measure_chains_scaling(),
    "lattice": measure_lattice_scaling(
        rows_per_device=1024 if backend == "tpu" else 256,
        cols=4096 if backend == "tpu" else 1024,
    ),
}
if jax.process_index() == 0:
    out = (f"{sys.argv[1]}/scaling_{backend}"
           f"{len(jax.devices())}_h{jax.process_count()}.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2, default=float)
    print(json.dumps(result, indent=2, default=float))
    print(f"wrote {out}")
EOF
