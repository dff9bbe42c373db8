"""Mesh construction helpers.

Canonical axes (SURVEY.md §5.8): ``("replica", "chains", "row")`` —
temperature replicas, independent chains, and spatial lattice rows. Any axis
may be 1; the helpers below build meshes from whatever devices exist (real
TPU slice or the CPU-simulated mesh used in tests via
``XLA_FLAGS=--xla_force_host_platform_device_count=N``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    replica: int = 1,
    chains: int = 1,
    rows: int = 1,
    cols: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a Mesh with axes ("replica", "chains", "row", "col").

    The product must equal the device count used. Pass explicit sizes for the
    axes you shard; leave the rest at 1.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = replica * chains * rows * cols
    if n > len(devices):
        raise ValueError(
            f"mesh {replica}x{chains}x{rows}x{cols} needs {n} devices, "
            f"have {len(devices)}"
        )
    devs = np.array(devices[:n]).reshape(replica, chains, rows, cols)
    return Mesh(devs, ("replica", "chains", "row", "col"))


def mesh_info(mesh: Mesh) -> dict:
    """Topology summary for logging / benchmark metadata."""
    return {
        "axes": dict(zip(mesh.axis_names, mesh.devices.shape)),
        "n_devices": int(mesh.devices.size),
        "platform": mesh.devices.flat[0].platform,
    }


def multihost_initialize(**kwargs):
    """Initialize the JAX distributed runtime for multi-host execution.

    Thin wrapper over ``jax.distributed.initialize`` (coordinator address,
    process ids and device visibility come from the launch environment on TPU
    pods). Safe to call once per process before building meshes that span
    hosts.
    """
    jax.distributed.initialize(**kwargs)
