"""Diagnostics tests: Geyer ESS (quirk Q11 fix) and autocorrelation."""

import numpy as np
import pytest

from tsu_tpu.ops.stats import (
    autocorrelation,
    effective_sample_size,
    ess_multichain,
    kl_divergence_calibrated,
    kl_divergence_corrected,
    kl_divergence_discrete,
    moment_zscores,
)


class TestAutocorrelation:
    def test_lag_zero_is_one(self, rng):
        x = rng.normal(0, 1, 500)
        acf = autocorrelation(x)
        assert acf[0] == pytest.approx(1.0)

    def test_iid_decorrelates(self, rng):
        x = rng.normal(0, 1, 5000)
        acf = autocorrelation(x, 20)
        assert np.all(np.abs(acf[1:]) < 0.1)

    def test_ar1_matches_theory(self, rng):
        # AR(1) with phi=0.8: rho_k = 0.8^k.
        phi = 0.8
        n = 50000
        e = rng.normal(0, 1, n)
        x = np.zeros(n)
        for i in range(1, n):
            x[i] = phi * x[i - 1] + e[i]
        acf = autocorrelation(x, 5)
        np.testing.assert_allclose(acf[1:], phi ** np.arange(1, 6), atol=0.05)


class TestESS:
    def test_iid_ess_near_n(self, rng):
        x = rng.normal(0, 1, 2000)
        ess = effective_sample_size(x)
        assert ess > 1200  # iid should be close to N

    def test_correlated_ess_reduced(self, rng):
        phi = 0.95
        n = 5000
        e = rng.normal(0, 1, n)
        x = np.zeros(n)
        for i in range(1, n):
            x[i] = phi * x[i - 1] + e[i]
        ess = effective_sample_size(x)
        # Theory: ESS ~ N (1-phi)/(1+phi) ~ 128; Geyer estimate in ballpark.
        assert ess < 600

    def test_constant_chain(self):
        assert effective_sample_size(np.ones(100)) == 100.0

    def test_multichain_sums(self, rng):
        x = rng.normal(0, 1, (4, 1000, 2))
        assert ess_multichain(x) > 2000  # 4 chains x ~1000 each


class TestKL:
    def test_identical_is_zero(self):
        p = np.array([0.2, 0.3, 0.5])
        assert kl_divergence_discrete(p, p) == pytest.approx(0.0, abs=1e-9)

    def test_positive(self):
        assert kl_divergence_discrete([0.9, 0.1], [0.5, 0.5]) > 0


class TestBiasCorrectedMetrics:
    """r1 weakness #2: at 400 samples over 2^10 states the plug-in KL floor
    (~0.8 nats) could not distinguish an exact sampler from a broken one.
    The calibrated estimator and moment z-scores must be decisive."""

    def _setup(self, seed=0, n=400, k=1024):
        rng = np.random.default_rng(seed)
        logits = rng.normal(0, 2.0, k)
        q = np.exp(logits - logits.max())
        q /= q.sum()
        return rng, q

    def test_exact_sampler_scores_near_zero(self):
        rng, q = self._setup()
        counts = np.bincount(rng.choice(len(q), 400, p=q), minlength=len(q))
        plugin = kl_divergence_discrete(counts / 400, q)
        assert plugin > 0.2  # the bias floor the plug-in estimator suffers
        assert kl_divergence_calibrated(counts, q, seed=1) < 0.05
        assert kl_divergence_corrected(counts, q) < plugin

    def test_wrong_sampler_scores_high(self):
        rng, q = self._setup()
        # Sample from a *different* distribution (uniform).
        counts = np.bincount(rng.integers(0, len(q), 400), minlength=len(q))
        assert kl_divergence_calibrated(counts, q, seed=1) > 0.5

    def test_moment_zscores_discriminate(self):
        rng = np.random.default_rng(3)
        exact_mean = np.full(10, 0.5)
        good = (rng.random((2000, 10)) < 0.5).astype(float)
        bad = (rng.random((2000, 10)) < 0.65).astype(float)
        assert moment_zscores(good, exact_mean, 2000)["max_abs_z"] < 4.0
        assert moment_zscores(bad, exact_mean, 2000)["max_abs_z"] > 6.0
