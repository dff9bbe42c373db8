"""NUTS statistical validation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsu_tpu.energy import MixtureOfGaussians, Quadratic
from tsu_tpu.samplers.nuts import sample_nuts


class TestNUTS:
    def test_standard_gaussian_moments(self):
        samples, info = sample_nuts(
            jax.random.key(0), jnp.zeros((8, 4)),
            energy_fn=Quadratic(0.0, 1.0), n_samples=400, n_burnin=200,
            max_depth=6,
        )
        flat = np.asarray(samples).reshape(-1, 4)
        assert np.all(np.abs(flat.mean(axis=0)) < 0.08)
        assert np.all(np.abs(flat.std(axis=0) - 1.0) < 0.08)
        assert 0.5 < float(info["accept_stat"]) < 1.0

    def test_anisotropic_gaussian(self):
        def energy(x):
            return x[0] ** 2 / (2 * 9.0) + x[1] ** 2 / (2 * 0.04)

        samples, info = sample_nuts(
            jax.random.key(1), jnp.zeros((8, 2)),
            energy_fn=energy, n_samples=600, n_burnin=300, max_depth=8,
        )
        flat = np.asarray(samples).reshape(-1, 2)
        assert abs(flat[:, 0].std() - 3.0) < 0.35
        assert abs(flat[:, 1].std() - 0.2) < 0.03

    def test_trees_deepen_for_hard_targets(self):
        def energy(x):
            return x[0] ** 2 / (2 * 100.0) + jnp.sum(x[1:] ** 2) / 2.0

        _, info = sample_nuts(
            jax.random.key(2), jnp.zeros((4, 3)),
            energy_fn=energy, n_samples=200, n_burnin=200, max_depth=8,
        )
        assert float(info["mean_tree_depth"]) > 1.5

    def test_bimodal_with_close_modes(self):
        energy = MixtureOfGaussians(((-1.5,), (1.5,)), (0.8, 0.8))
        samples, _ = sample_nuts(
            jax.random.key(3), jnp.zeros((16, 1)),
            energy_fn=energy, n_samples=500, n_burnin=200, max_depth=7,
        )
        x = np.asarray(samples).ravel()
        assert 0.3 < np.mean(x < 0) < 0.7
