"""PRNG key management.

The reference uses the global NumPy RNG (``np.random.*`` throughout, e.g.
tsu/core.py:76-79). TPU-native sampling needs deterministic, splittable,
per-chain keys: JAX threefry keys split with ``fold_in`` so every chain /
replica / lattice shard derives an independent stream from one seed.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import numpy as np

KeyLike = Union[int, jax.Array, None]


def as_key(seed: KeyLike) -> jax.Array:
    """Coerce an int seed / key / None into a JAX PRNG key."""
    if seed is None:
        # Fresh entropy: keeps the reference's "unseeded is random" behavior.
        seed = int(np.random.randint(0, 2**31 - 1))
    if isinstance(seed, (int, np.integer)):
        return jax.random.key(int(seed))
    return seed


def chain_keys(key: jax.Array, n_chains: int) -> jax.Array:
    """Independent per-chain keys: shape (n_chains,) of keys."""
    return jax.random.split(key, n_chains)


def fold(key: jax.Array, *data: int) -> jax.Array:
    """Derive a subkey by folding in integers (step counters, replica ids...)."""
    for d in data:
        key = jax.random.fold_in(key, d)
    return key
