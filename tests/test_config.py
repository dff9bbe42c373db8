"""Config validation tests (reference pattern: tests/test_core.py:14-37,
tests/test_gibbs.py:10-29, tests/test_ising.py:11-21)."""

import pytest

from tsu_tpu import ConfigurationError, GibbsConfig, IsingConfig, TSUConfig


class TestTSUConfig:
    def test_defaults_valid(self):
        cfg = TSUConfig()
        assert cfg.temperature == 1.0
        assert 0 < cfg.dt <= 0.1

    def test_negative_temperature_rejected(self):
        with pytest.raises(ConfigurationError, match="temperature"):
            TSUConfig(temperature=-1.0)

    def test_zero_temperature_rejected(self):
        with pytest.raises(ConfigurationError, match="temperature"):
            TSUConfig(temperature=0.0)

    def test_dt_bounds(self):
        with pytest.raises(ConfigurationError, match="dt"):
            TSUConfig(dt=0.0)
        with pytest.raises(ConfigurationError, match="dt"):
            TSUConfig(dt=0.2)
        TSUConfig(dt=0.1)  # boundary OK

    def test_negative_friction_rejected(self):
        with pytest.raises(ConfigurationError, match="friction"):
            TSUConfig(friction=-0.5)

    def test_negative_burnin_rejected(self):
        with pytest.raises(ConfigurationError, match="n_burnin"):
            TSUConfig(n_burnin=-1)

    def test_immutable(self):
        cfg = TSUConfig()
        with pytest.raises(Exception):
            cfg.temperature = 2.0

    def test_replace(self):
        cfg = TSUConfig().replace(temperature=2.0)
        assert cfg.temperature == 2.0


class TestGibbsConfig:
    def test_defaults_valid(self):
        # Deliberate divergence from the reference default ("sequential"):
        # the default config must not carry a silent throughput cliff, and
        # every order targets the same invariant distribution.
        cfg = GibbsConfig()
        assert cfg.update_order == "checkerboard"

    def test_bad_update_order(self):
        with pytest.raises(ConfigurationError, match="update_order"):
            GibbsConfig(update_order="zigzag")

    def test_bad_temperature(self):
        with pytest.raises(ConfigurationError, match="temperature"):
            GibbsConfig(temperature=0.0)

    def test_bad_sweeps(self):
        with pytest.raises(ConfigurationError, match="n_sweeps"):
            GibbsConfig(n_sweeps=0)


class TestIsingConfig:
    def test_defaults_valid(self):
        IsingConfig()

    def test_bad_temperature(self):
        with pytest.raises(ConfigurationError, match="temperature"):
            IsingConfig(temperature=-2.0)

    def test_bad_chains(self):
        with pytest.raises(ConfigurationError, match="n_chains"):
            IsingConfig(n_chains=0)
