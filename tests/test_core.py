"""ThermalSamplingUnit tests (reference pattern: tests/test_core.py).

Statistical-property style: sample then assert physics within MC-error-aware
tolerances (SURVEY.md §4 category 4)."""

import numpy as np
import pytest
from scipy import stats

from tsu_tpu import (
    ProbabilisticNeuron,
    SamplingError,
    ThermalSamplingUnit,
    TSUConfig,
    validate_distribution,
)


@pytest.fixture(scope="module")
def tsu():
    return ThermalSamplingUnit(
        TSUConfig(n_chains=16, n_burnin=300, n_steps=300, dt=0.1), seed=0
    )


class TestGaussianSampling:
    def test_standard_normal_moments(self, tsu):
        s = tsu.sample_gaussian(0.0, 1.0, 4000)
        assert abs(np.mean(s)) < 0.15
        assert abs(np.std(s) - 1.0) < 0.15

    def test_shifted_scaled(self, tsu):
        s = tsu.sample_gaussian(3.0, 0.5, 4000)
        assert abs(np.mean(s) - 3.0) < 0.15
        assert abs(np.std(s) - 0.5) < 0.12

    def test_ks_against_normal(self, tsu):
        s = tsu.sample_gaussian(0.0, 1.0, 4000)
        _, p = stats.kstest(s, "norm")
        assert p > 0.001

    def test_invalid_sigma(self, tsu):
        with pytest.raises(SamplingError):
            tsu.sample_gaussian(0.0, -1.0, 10)


class TestSampleFromEnergy:
    def test_multidim_gaussian(self, tsu):
        import jax.numpy as jnp

        def energy(x):
            return jnp.sum(x**2) / 2.0

        s = tsu.sample_from_energy(energy, np.zeros(3), 3000)
        assert s.shape == (3000, 3)
        assert np.all(np.abs(s.mean(axis=0)) < 0.2)
        assert np.all(np.abs(s.std(axis=0) - 1.0) < 0.2)

    def test_bad_energy_not_scalar(self, tsu):
        with pytest.raises(SamplingError):
            tsu.sample_from_energy(lambda x: x * 2, np.zeros(3), 10)

    def test_bad_n_samples(self, tsu):
        with pytest.raises(SamplingError):
            tsu.sample_from_energy(lambda x: (x**2).sum(), np.zeros(2), 0)

    def test_sample_count_increments(self):
        unit = ThermalSamplingUnit(TSUConfig(n_burnin=10, n_steps=10), seed=1)
        unit.sample_gaussian(0.0, 1.0, 50)
        assert unit.sample_count == 50


class TestPBit:
    def test_rates(self, tsu):
        for p in (0.1, 0.5, 0.9):
            bits = tsu.p_bit(p, 4000)
            assert set(np.unique(bits)) <= {0, 1}
            assert abs(bits.mean() - p) < 0.05

    def test_extremes(self, tsu):
        assert tsu.p_bit(0.0, 100).sum() == 0
        assert tsu.p_bit(1.0, 100).sum() == 100

    def test_invalid_prob(self, tsu):
        with pytest.raises(SamplingError):
            tsu.p_bit(1.5, 10)


class TestCategorical:
    def test_frequencies(self, tsu):
        probs = np.array([0.2, 0.5, 0.3])
        idx = tsu.sample_categorical(probs, 6000)
        freqs = np.bincount(idx, minlength=3) / 6000
        assert np.all(np.abs(freqs - probs) < 0.05)

    def test_invalid_probs(self, tsu):
        with pytest.raises(SamplingError):
            tsu.sample_categorical(np.array([0.5, 0.6]), 10)


class TestProbabilisticNeuron:
    def test_activation_rate_tracks_sigmoid(self, tsu):
        neuron = ProbabilisticNeuron(tsu)
        w = np.array([1.0, -1.0])
        x = np.array([2.0, 0.5])
        acts = neuron.forward_stochastic(w, x, bias=0.0, n_samples=2000)
        expected = 1.0 / (1.0 + np.exp(-(w @ x)))
        assert abs(acts.mean() - expected) < 0.05

    def test_activate_binary(self, tsu):
        neuron = ProbabilisticNeuron(tsu)
        out = neuron.activate(np.array([1.0]), np.array([10.0]))
        assert out in (0, 1)


class TestValidateDistribution:
    def test_gaussian_valid(self, rng):
        res = validate_distribution(rng.normal(0, 1, 3000), "gaussian",
                                    {"mu": 0.0, "sigma": 1.0})
        assert res["valid"]

    def test_gaussian_invalid(self, rng):
        res = validate_distribution(rng.normal(5, 1, 3000), "gaussian",
                                    {"mu": 0.0, "sigma": 1.0})
        assert not res["valid"]

    def test_bernoulli(self, rng):
        res = validate_distribution((rng.random(3000) < 0.3).astype(float),
                                    "bernoulli", {"p": 0.3})
        assert res["valid"]

    def test_unknown_type(self):
        with pytest.raises(ValueError):
            validate_distribution(np.zeros(10), "cauchy")
