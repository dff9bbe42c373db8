"""Checkpoint / resume for sampler state (SURVEY.md §5.4 — new capability).

Sampler state is a small pytree (lattice planes / chain positions, PRNG keys,
temperature ladders, adaptation stats). Backed by orbax when available
(sharded-pytree aware, multi-host safe), with a NumPy .npz fallback for
single-host use.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    ORBAX_AVAILABLE = True
except Exception:  # pragma: no cover
    ORBAX_AVAILABLE = False


def save_state(path: str, state: Any, step: Optional[int] = None) -> str:
    """Save a pytree sampler state. Returns the path written.

    With orbax the pytree may be sharded (multi-host safe); the fallback
    gathers to host NumPy arrays.
    """
    path = os.path.abspath(path)
    if ORBAX_AVAILABLE:
        ckptr = ocp.StandardCheckpointer()
        target = path if step is None else os.path.join(path, str(step))
        ckptr.save(target, state, force=True)
        ckptr.wait_until_finished()
        return target
    leaves, treedef = jax.tree.flatten(state)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(
        path if path.endswith(".npz") else path + ".npz",
        treedef=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )
    return path if path.endswith(".npz") else path + ".npz"


def restore_state(path: str, example: Any, step: Optional[int] = None) -> Any:
    """Restore a pytree saved by save_state; ``example`` supplies the
    structure (and shardings, under orbax)."""
    path = os.path.abspath(path)
    if ORBAX_AVAILABLE and not path.endswith(".npz"):
        ckptr = ocp.StandardCheckpointer()
        target = path if step is None else os.path.join(path, str(step))
        return ckptr.restore(target, example)
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    leaves, treedef = jax.tree.flatten(example)
    restored = [data[f"leaf_{i}"] for i in range(len(leaves))]
    return jax.tree.unflatten(treedef, restored)
