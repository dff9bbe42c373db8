"""Kill-and-resume a long lattice run (SURVEY §5.4 in action).

A 4096^2 multi-host sampling run is exactly the kind of job that gets
preempted; this demo shows every long path surviving it, bit-identically:

1. a sharded lattice sampling run (`sharded_lattice_sample`) snapshots its
   sharded planes + collected observables every ``checkpoint_every``
   samples, is "killed" mid-run, and resumes to the SAME observable series
   the uninterrupted run produces (the seed/counter schedule is keyed by
   global sample index, so chunking is invisible to the physics);
2. a PT ground-state search (`pt_ground_state_search`) does the same at
   chunk granularity (per-iteration fold_in keys).

Sizes here are small so the demo runs anywhere in seconds; the mechanism
is size-independent — on hardware, point the same flags at a 4096 lattice
(CLI: `tsu-tpu anneal --spin-glass --checkpoint ck --resume`, and
`python -m tsu_tpu.benchmarks.runner --resume` for the suite).

Run: python examples/checkpoint_resume.py
"""

import os
import tempfile

import jax
import jax.numpy as jnp

import numpy as np

from tsu_tpu.parallel import make_mesh, sharded_lattice_sample
from tsu_tpu.samplers.tempering_ladder import pt_ground_state_search


def main():
    tmp = tempfile.mkdtemp(prefix="tsu_ckpt_")
    n_dev = min(4, len(jax.devices()))
    mesh = make_mesh(rows=n_dev, devices=jax.devices()[:n_dev])
    key = jax.random.key(0)
    lat0 = jnp.ones((16 * n_dev, 64), jnp.float32)
    kwargs = dict(n_samples=12, temperature=2.3, n_burnin=20, n_sweeps=1,
                  use_pallas=False)

    # Ground truth: one uninterrupted run.
    full = sharded_lattice_sample(mesh, key, lat0, **kwargs)

    # "Preempted" run: checkpoint every 4 samples, die after the first
    # snapshot (simulated by just stopping early), then resume.
    ck = os.path.join(tmp, "lattice_ck")
    sharded_lattice_sample(mesh, key, lat0, checkpoint_path=ck,
                           checkpoint_every=4,
                           **{**kwargs, "n_samples": 4})  # killed here
    resumed = sharded_lattice_sample(mesh, key, lat0, checkpoint_path=ck,
                                     checkpoint_every=4, resume=True,
                                     **kwargs)
    same = np.array_equal(np.asarray(full["magnetization"]),
                          np.asarray(resumed["magnetization"]))
    print(f"1. sharded lattice sample resumed bit-identically: {same}")
    assert same

    # PT ground-state search: killed after 30 of 90 iterations.
    L = 16
    Jh = jnp.where(jax.random.bernoulli(jax.random.fold_in(key, 1), 0.5,
                                        (L, L)), 1.0, -1.0)
    Jv = jnp.where(jax.random.bernoulli(jax.random.fold_in(key, 2), 0.5,
                                        (L, L)), 1.0, -1.0)
    temps = np.geomspace(0.4, 2.0, 8)
    pt_kwargs = dict(temperatures=temps, n_sweeps=1, quench_sweeps=8)
    ck2 = os.path.join(tmp, "pt_ck")
    full_pt = pt_ground_state_search(jax.random.fold_in(key, 3), Jh, Jv,
                                     n_iters=90, **pt_kwargs)
    pt_ground_state_search(jax.random.fold_in(key, 3), Jh, Jv, n_iters=30,
                           chunk_iters=30, checkpoint_path=ck2,
                           quench_sweeps=0, temperatures=temps, n_sweeps=1)
    resumed_pt = pt_ground_state_search(jax.random.fold_in(key, 3), Jh, Jv,
                                        n_iters=90, chunk_iters=30,
                                        checkpoint_path=ck2, resume=True,
                                        **pt_kwargs)
    same_pt = (full_pt["best_energy"] == resumed_pt["best_energy"]
               and np.array_equal(full_pt["best_state"],
                                  resumed_pt["best_state"]))
    print(f"2. PT ground-state search resumed bit-identically: {same_pt}")
    assert same_pt
    print(f"   (snapshots under {tmp})")


if __name__ == "__main__":
    main()
