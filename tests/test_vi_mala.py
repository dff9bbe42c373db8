"""Mean-field VI and MALA tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tsu_tpu.energy import Quadratic
from tsu_tpu.samplers.mala import sample_mala
from tsu_tpu.samplers.vi import fit_meanfield_vi


class TestMeanFieldVI:
    def test_gaussian_recovered_exactly(self):
        # Target N(2, 0.5^2): mean-field VI on a Gaussian is exact.
        out = fit_meanfield_vi(
            jax.random.key(0), Quadratic(2.0, 0.5), dim=3,
            n_steps=800, learning_rate=0.05,
        )
        np.testing.assert_allclose(np.asarray(out["mu"]), 2.0, atol=0.08)
        np.testing.assert_allclose(np.asarray(out["sigma"]), 0.5, atol=0.08)

    def test_elbo_improves(self):
        # Start far from the target so there is ground to gain.
        out = fit_meanfield_vi(
            jax.random.key(1), Quadratic(0.0, 1.0), dim=2, n_steps=400,
            init_mu=np.array([4.0, -4.0]), init_sigma=0.1,
        )
        losses = np.asarray(out["losses"])
        assert losses[-50:].mean() < losses[:50].mean() - 1.0

    def test_sample_closure(self):
        out = fit_meanfield_vi(jax.random.key(2), Quadratic(1.0, 1.0), dim=2,
                               n_steps=500)
        s = np.asarray(out["sample"](jax.random.key(3), 4000))
        assert s.shape == (4000, 2)
        assert np.all(np.abs(s.mean(axis=0) - 1.0) < 0.1)

    def test_correlated_target_matches_marginals(self):
        # Anisotropic Gaussian: mean-field gets means + underestimates nothing
        # on the diagonal here (diagonal target).
        def energy(x):
            return x[0] ** 2 / (2 * 4.0) + x[1] ** 2 / (2 * 0.25)

        out = fit_meanfield_vi(jax.random.key(4), energy, dim=2, n_steps=1000)
        sig = np.asarray(out["sigma"])
        assert abs(sig[0] - 2.0) < 0.2
        assert abs(sig[1] - 0.5) < 0.08


class TestAdaptiveHMC:
    def test_gaussian_moments(self):
        from tsu_tpu.samplers.hmc import sample_hmc_adaptive

        samples, info = sample_hmc_adaptive(
            jax.random.key(0), jnp.zeros((16, 4)),
            energy_fn=Quadratic(0.0, 1.0), n_samples=400, n_burnin=300,
        )
        flat = np.asarray(samples).reshape(-1, 4)
        assert np.all(np.abs(flat.mean(axis=0)) < 0.08)
        assert np.all(np.abs(flat.std(axis=0) - 1.0) < 0.08)
        assert 0.6 < float(info["accept_rate"]) < 0.95

    def test_anisotropic(self):
        from tsu_tpu.samplers.hmc import sample_hmc_adaptive

        def energy(x):
            return x[0] ** 2 / (2 * 9.0) + x[1] ** 2 / (2 * 0.04)

        samples, info = sample_hmc_adaptive(
            jax.random.key(1), jnp.zeros((16, 2)),
            energy_fn=energy, n_samples=600, n_burnin=400, n_leapfrog=32,
        )
        flat = np.asarray(samples).reshape(-1, 2)
        assert abs(flat[:, 0].std() - 3.0) < 0.4
        assert abs(flat[:, 1].std() - 0.2) < 0.04


class TestMALA:
    def test_gaussian_moments_exact(self):
        samples, info = sample_mala(
            jax.random.key(0), jnp.zeros((16, 3)),
            energy_fn=Quadratic(0.0, 1.0), n_samples=500, n_burnin=300,
        )
        flat = np.asarray(samples).reshape(-1, 3)
        assert np.all(np.abs(flat.mean(axis=0)) < 0.08)
        assert np.all(np.abs(flat.std(axis=0) - 1.0) < 0.08)

    def test_adaptation_hits_target(self):
        _, info = sample_mala(
            jax.random.key(1), jnp.zeros((32, 5)),
            energy_fn=Quadratic(0.0, 1.0), n_samples=300, n_burnin=500,
            step_size=1e-3,  # badly small start; adaptation must fix it
        )
        assert 0.4 < float(info["accept_rate"]) < 0.8
        assert float(info["step_size"]) > 5e-3

    def test_no_adapt_keeps_step(self):
        _, info = sample_mala(
            jax.random.key(2), jnp.zeros((4, 2)),
            energy_fn=Quadratic(0.0, 1.0), n_samples=50, n_burnin=50,
            step_size=0.05, adapt=False,
        )
        assert float(info["step_size"]) == pytest.approx(0.05, rel=1e-5)
