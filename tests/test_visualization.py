"""Smoke tests for all eight plot functions on the Agg backend
(reference pattern: tests/test_visualization.py)."""

import numpy as np
import pytest
from matplotlib.figure import Figure

from tsu_tpu import (
    plot_active_learning_curve,
    plot_energy_landscape_2d,
    plot_ising_state,
    plot_phase_transition,
    plot_predictions_with_uncertainty,
    plot_sampling_diagnostics,
    plot_uncertainty_vs_error,
)


@pytest.fixture
def xy(rng):
    x = np.linspace(-2, 2, 40)
    y = np.sin(x) + 0.1 * rng.normal(size=40)
    return x, y


class TestPlots:
    def test_predictions_with_uncertainty(self, xy):
        x, y = xy
        fig = plot_predictions_with_uncertainty(
            x, y, 0.2 * np.ones_like(x), y_true=np.sin(x),
            x_train=x[::5], y_train=y[::5], show=False,
        )
        assert isinstance(fig, Figure)

    def test_uncertainty_vs_error(self, xy, rng):
        x, y = xy
        fig = plot_uncertainty_vs_error(y, y + 0.1 * rng.normal(size=40),
                                        np.abs(rng.normal(0.2, 0.05, 40)),
                                        show=False)
        assert isinstance(fig, Figure)

    def test_energy_landscape_2d(self, rng):
        import jax.numpy as jnp

        fig = plot_energy_landscape_2d(
            lambda p: jnp.sum(p**2), (-2, 2), (-2, 2),
            samples=rng.normal(0, 1, (50, 2)),
            trajectory=rng.normal(0, 1, (10, 2)),
            resolution=20, show=False,
        )
        assert isinstance(fig, Figure)

    def test_ising_state_1d(self):
        fig = plot_ising_state(np.array([1, -1, 1, -1.0]), show=False)
        assert isinstance(fig, Figure)

    def test_ising_state_2d(self, rng):
        fig = plot_ising_state(np.where(rng.random((8, 8)) < 0.5, 1.0, -1.0),
                               show=False)
        assert isinstance(fig, Figure)

    def test_ising_state_3d_rejected(self):
        with pytest.raises(ValueError):
            plot_ising_state(np.ones((2, 2, 2)), show=False)

    def test_phase_transition(self):
        T = np.linspace(0.5, 4, 10)
        fig = plot_phase_transition(T, np.exp(-T),
                                    magnetization_errors=0.05 * np.ones(10),
                                    critical_temp=2.269, show=False)
        assert isinstance(fig, Figure)

    def test_sampling_diagnostics(self, rng):
        samples = rng.normal(0, 1, 500)
        fig = plot_sampling_diagnostics(
            samples,
            true_distribution=lambda z: np.exp(-z**2 / 2) / np.sqrt(2 * np.pi),
            show=False,
        )
        assert isinstance(fig, Figure)

    def test_sampling_diagnostics_2d_input(self, rng):
        fig = plot_sampling_diagnostics(rng.normal(0, 1, (300, 3)), show=False)
        assert isinstance(fig, Figure)

    def test_active_learning_curve(self):
        n = np.arange(10, 60, 10)
        fig = plot_active_learning_curve(n, 1 - 1 / n, 1 - 2 / n, show=False)
        assert isinstance(fig, Figure)

    def test_save_path(self, xy, tmp_path):
        x, y = xy
        out = tmp_path / "fig.png"
        plot_predictions_with_uncertainty(x, y, np.ones_like(x),
                                          save_path=str(out), show=False)
        assert out.exists()

    def test_interactive_landscape(self):
        import jax.numpy as jnp

        pytest.importorskip("plotly")
        from tsu_tpu import plot_interactive_energy_landscape

        fig = plot_interactive_energy_landscape(
            lambda p: jnp.sum(p**2), (-1, 1), (-1, 1), resolution=10
        )
        assert fig is not None
