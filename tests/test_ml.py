"""BNN tests: shapes, KL behavior, real ELBO training (fixing quirk Q5),
calibration and active learning (reference pattern: tests/test_ml.py)."""

import numpy as np
import pytest

from tsu_tpu import (
    BayesianLinear,
    BayesianNetwork,
    BayesianRegressor,
    ConfigurationError,
    PredictionResult,
)


class TestStochasticLayer:
    def test_sample_weights_shapes(self):
        layer = BayesianLinear(3, 2, seed=0)
        w, b = layer.sample_weights()
        assert w.shape == (3, 2)
        assert b.shape == (2,)

    def test_temperature_scales_variance(self):
        # Higher T -> more weight spread (cf. tests/test_ml.py:94-107).
        layer = BayesianLinear(20, 20, seed=0)
        cold = np.std([layer.sample_weights(0.01)[0] for _ in range(10)])
        hot = np.std([layer.sample_weights(4.0)[0] for _ in range(10)])
        assert hot > cold

    def test_kl_monotonic_in_mu(self):
        # Moving mu away from prior mean increases KL (cf. tests/test_ml.py:142-155).
        layer = BayesianLinear(4, 4, seed=0)
        kl0 = layer.compute_kl_divergence()
        layer.params = {**layer.params, "w_mu": layer.params["w_mu"] + 3.0}
        assert layer.compute_kl_divergence() > kl0

    def test_forward_shape(self):
        layer = BayesianLinear(3, 2, seed=0)
        out = layer.forward(np.ones((5, 3)))
        assert out.shape == (5, 2)

    def test_bad_dims_rejected(self):
        with pytest.raises(ConfigurationError):
            BayesianLinear(0, 2)


class TestBayesianNetwork:
    def test_forward_shapes(self):
        net = BayesianNetwork([2, 8, 1], seed=0)
        out = net.forward(np.ones((4, 2)))
        assert out.shape == (4, 1)

    def test_stochastic_forward_varies(self):
        net = BayesianNetwork([2, 8, 1], seed=0)
        x = np.ones((1, 2))
        outs = [net.forward(x)[0, 0] for _ in range(5)]
        assert np.std(outs) > 0

    def test_predict_result(self):
        net = BayesianNetwork([1, 8, 1], seed=0)
        x = np.linspace(-1, 1, 7)[:, None]
        res = net.predict(x, n_samples=20)
        assert isinstance(res, PredictionResult)
        assert res.mean.shape == (7, 1)
        assert res.std.shape == (7, 1)
        assert res.samples.shape == (20, 7, 1)
        assert np.all(res.std >= 0)
        assert np.all((0 <= res.confidence) & (res.confidence <= 1))

    def test_activations(self):
        for act in ("relu", "tanh", "sigmoid"):
            BayesianNetwork([2, 4, 1], activation=act, seed=0).forward(np.ones((1, 2)))
        with pytest.raises(ConfigurationError):
            BayesianNetwork([2, 4, 1], activation="swish")

    def test_training_reduces_loss(self):
        # cf. tests/test_ml.py:233-253.
        rng = np.random.default_rng(0)
        x = rng.uniform(-1, 1, (64, 1)).astype(np.float32)
        y = np.sin(3 * x)
        net = BayesianNetwork([1, 16, 1], temperature=0.1, seed=0)
        hist = net.fit(x, y, n_epochs=60, batch_size=32, learning_rate=0.02,
                       kl_weight=1e-4)
        losses = hist["loss_history"]
        assert losses[-1] < losses[0] * 0.5

    def test_sigma_is_learned(self):
        """The decisive quirk-Q5 test: posterior sigma must CHANGE through
        training via gradients (the reference only decays it)."""
        rng = np.random.default_rng(1)
        x = rng.uniform(-1, 1, (64, 1)).astype(np.float32)
        y = 2 * x
        net = BayesianNetwork([1, 8, 1], temperature=1.0, seed=0)
        rho_before = np.asarray(net.params[0]["w_rho"]).copy()
        net.fit(x, y, n_epochs=30, batch_size=32, learning_rate=0.05,
                kl_weight=0.01)
        rho_after = np.asarray(net.params[0]["w_rho"])
        assert not np.allclose(rho_before, rho_after)

    def test_sample_posterior(self):
        net = BayesianNetwork([2, 4, 1], seed=0)
        posts = net.sample_posterior(3)
        assert len(posts) == 3
        assert posts[0].weights[0].shape == (2, 4)


class TestBayesianRegressor:
    def test_fit_predict_interval(self):
        rng = np.random.default_rng(2)
        x = np.linspace(-1, 1, 80)[:, None].astype(np.float32)
        y = (x**2 + 0.05 * rng.normal(size=x.shape)).astype(np.float32)
        reg = BayesianRegressor(1, [16], temperature=0.1, seed=0)
        reg.fit(x, y, n_epochs=80, learning_rate=0.02, kl_weight=1e-4)
        mean, lo, hi = reg.predict_with_interval(x, n_samples=50)
        assert np.all(lo <= hi)
        # Wider confidence -> wider interval (cf. tests/test_ml.py:283-295).
        _, lo99, hi99 = reg.predict_with_interval(x, n_samples=50,
                                                  confidence=0.99)
        assert np.mean(hi99 - lo99) >= np.mean(hi - lo) * 0.8

    def test_interval_covers_training_data(self):
        rng = np.random.default_rng(3)
        x = np.linspace(-1, 1, 60)[:, None].astype(np.float32)
        y = np.sin(2 * x).astype(np.float32)
        reg = BayesianRegressor(1, [32], temperature=0.3, seed=1)
        reg.fit(x, y, n_epochs=150, learning_rate=0.02, kl_weight=1e-5)
        mean, lo, hi = reg.predict_with_interval(x, n_samples=100,
                                                 confidence=0.95)
        coverage = np.mean((y >= lo) & (y <= hi))
        assert coverage > 0.6

    def test_select_informative_samples(self):
        reg = BayesianRegressor(1, [8], seed=0)
        x_train = np.linspace(-0.2, 0.2, 30)[:, None].astype(np.float32)
        reg.fit(x_train, 2 * x_train, n_epochs=40, learning_rate=0.02,
                kl_weight=1e-4)
        pool = np.linspace(-3, 3, 50)[:, None].astype(np.float32)
        idx = reg.select_informative_samples(pool, n_select=5)
        assert len(idx) == 5
        # Uncertainty sampling should prefer points far from training data.
        assert np.mean(np.abs(pool[idx])) > np.mean(np.abs(pool))

    def test_single_sample_batch(self):
        reg = BayesianRegressor(2, [4], seed=0)
        res = reg.predict(np.ones((1, 2)), n_samples=10)
        assert res.mean.shape == (1, 1)


class TestObservationNoise:
    """Learned aleatoric noise (r1 weakness #3: the ELBO used raw MSE, so
    predictive intervals could never calibrate when noise matters)."""

    def test_sigma_n_recovers_true_noise(self):
        rng = np.random.default_rng(4)
        x = rng.uniform(-1, 1, (200, 1)).astype(np.float32)
        y = (np.sin(3 * x) + 0.2 * rng.normal(size=x.shape)).astype(np.float32)
        reg = BayesianRegressor(1, [32, 32], seed=0)
        reg.fit(x, y, n_epochs=600, batch_size=200, learning_rate=0.01,
                kl_weight=0.1)
        sig_n = float(reg.observation_noise_std[0])
        assert 0.1 < sig_n < 0.35  # true scale 0.2

    def test_predictive_interval_calibrated(self):
        rng = np.random.default_rng(5)
        x = rng.uniform(-1, 1, (150, 1)).astype(np.float32)
        y = (x**2 + 0.15 * rng.normal(size=x.shape)).astype(np.float32)
        reg = BayesianRegressor(1, [32, 32], seed=0)
        reg.fit(x, y, n_epochs=600, batch_size=150, learning_rate=0.01,
                kl_weight=0.1)
        x_test = np.linspace(-1, 1, 200)[:, None].astype(np.float32)
        y_test = (x_test**2 + 0.15 * rng.normal(size=x_test.shape))
        mean, lo, hi = reg.predict_with_interval(
            x_test, n_samples=200, include_observation_noise=True)
        coverage = np.mean((y_test >= lo) & (y_test <= hi))
        assert 0.88 <= coverage <= 1.0

    def test_noise_learning_optional(self):
        net = BayesianNetwork([1, 4, 1], seed=0, learn_observation_noise=False)
        assert net.observation_noise_std is None
        x = np.linspace(-1, 1, 32)[:, None].astype(np.float32)
        net.fit(x, 2 * x, n_epochs=20, batch_size=32, learning_rate=0.02)
        assert net.log_noise is None


class TestAnchoredEnsemble:
    """Randomized-MAP ensembles (r2 verdict #4: mean-field VI undercovers
    out of distribution; the anchored ensemble's OOD predictive reverts to
    the prior predictive)."""

    def _toy(self, seed=2, n_train=80):
        rng = np.random.default_rng(seed)
        x = rng.uniform(-1, 1, (n_train, 1)).astype(np.float32)
        y = (x**3 + 0.05 * rng.normal(size=x.shape)).astype(np.float32)
        return x, y, rng

    def test_validation(self):
        from tsu_tpu.models.ml import AnchoredEnsembleRegressor

        with pytest.raises(ConfigurationError):
            AnchoredEnsembleRegressor(1, [8], n_members=1)
        with pytest.raises(ConfigurationError):
            AnchoredEnsembleRegressor(1, [8], activation="nope")

    def test_fit_reduces_loss_and_predict_shapes(self):
        from tsu_tpu.models.ml import AnchoredEnsembleRegressor

        x, y, _ = self._toy()
        reg = AnchoredEnsembleRegressor(1, [16], n_members=4, seed=0)
        reg.fit(x, y, n_epochs=300)
        assert reg.loss_history[-1] < reg.loss_history[0]
        res = reg.predict(np.linspace(-1, 1, 7)[:, None].astype(np.float32))
        assert res.samples.shape == (4, 7, 1)
        assert res.mean.shape == (7, 1)
        mean, lo, hi = reg.predict_with_interval(x[:5])
        assert np.all(lo <= mean) and np.all(mean <= hi)

    def test_ood_uncertainty_reverts_to_prior(self):
        """Epistemic spread far outside the data must dwarf in-dist spread
        (the property mean-field VI lacks; see benchmarks/ml.py)."""
        from tsu_tpu.models.ml import AnchoredEnsembleRegressor

        x, y, _ = self._toy()
        reg = AnchoredEnsembleRegressor(1, [32, 32], n_members=6, seed=0)
        reg.fit(x, y, n_epochs=1200)
        x_test = np.linspace(-3, 3, 61)[:, None].astype(np.float32)
        std = reg.predict(x_test).std.ravel()
        in_d = std[np.abs(x_test.ravel()) <= 1.0].mean()
        out_d = std[np.abs(x_test.ravel()) > 2.5].mean()
        assert out_d > 5.0 * in_d
        assert out_d > 2.0  # absolute prior-scale spread, not just a ratio

    def test_extrapolation_coverage_in_band(self):
        from tsu_tpu.models.ml import AnchoredEnsembleRegressor

        x, y, rng = self._toy()
        x_test = np.linspace(-3, 3, 200)[:, None].astype(np.float32)
        y_test = x_test**3 + 0.05 * rng.normal(size=x_test.shape)
        reg = AnchoredEnsembleRegressor(1, [32, 32], n_members=8, seed=0)
        reg.fit(x, y, n_epochs=2000)
        mean, lo, hi = reg.predict_with_interval(x_test, confidence=0.95)
        coverage = np.mean((y_test >= lo) & (y_test <= hi))
        assert 0.88 <= coverage <= 1.0

    def test_active_learning_prefers_ood(self):
        from tsu_tpu.models.ml import AnchoredEnsembleRegressor

        x, y, _ = self._toy()
        reg = AnchoredEnsembleRegressor(1, [16], n_members=4, seed=0)
        reg.fit(x, y, n_epochs=300)
        pool = np.linspace(-3, 3, 25)[:, None].astype(np.float32)
        picked = reg.select_informative_samples(pool, 4)
        assert np.all(np.abs(pool[picked].ravel()) > 1.5)


class TestBNNPosteriorMCMC:
    """Full-Bayes weight posterior as an energy (SURVEY.md §8.1 L1):
    BNNPosterior + the framework's own MCMC samplers."""

    def test_conjugate_linear_posterior_exact(self):
        """sizes=[1, 1] makes the model linear in theta=(w, b), so the
        posterior is Gaussian in closed form; MALA moments must match."""
        import jax
        import jax.numpy as jnp

        from tsu_tpu.energy import BNNPosterior
        from tsu_tpu.samplers.mala import sample_mala

        rng = np.random.default_rng(0)
        N, sn, sp = 40, 0.3, 1.0
        x = rng.uniform(-1, 1, (N, 1)).astype(np.float32)
        y = (1.5 * x - 0.5 + sn * rng.normal(size=x.shape)).astype(np.float32)
        post = BNNPosterior(x=jnp.asarray(x), y=jnp.asarray(y),
                            sizes=(1, 1), prior_std=sp, noise_std=sn)
        assert post.dim == 2

        # Closed form: A = [x, 1]; Prec = A^T A / sn^2 + I / sp^2.
        A = np.concatenate([x, np.ones_like(x)], axis=1)
        prec = A.T @ A / sn**2 + np.eye(2) / sp**2
        cov = np.linalg.inv(prec)
        mean = cov @ (A.T @ y).ravel() / sn**2

        thetas, info = sample_mala(
            jax.random.key(1), jnp.zeros((16, 2)), energy_fn=post,
            n_samples=400, step_size=1e-2, n_burnin=800,
        )
        draws = np.asarray(thetas).reshape(-1, 2)
        assert np.abs(draws.mean(axis=0) - mean).max() < 0.05
        assert np.abs(np.cov(draws.T) - cov).max() < 0.03
        assert info["accept_rate"] > 0.3

    def test_predict_mcmc_interface(self):
        from tsu_tpu import BayesianRegressor

        rng = np.random.default_rng(1)
        x = rng.uniform(-1, 1, (30, 1)).astype(np.float32)
        y = np.sin(2 * x).astype(np.float32)
        reg = BayesianRegressor(1, [8], seed=0)
        reg.fit(x, y, n_epochs=100, batch_size=30)
        x_test = np.linspace(-1, 1, 9)[:, None].astype(np.float32)
        res = reg.predict_mcmc(x, y, x_test, n_samples=64, n_chains=4,
                               n_burnin=300)
        assert res.mean.shape == (9, 1)
        assert np.all(res.std >= 0) and np.all(np.isfinite(res.samples))
