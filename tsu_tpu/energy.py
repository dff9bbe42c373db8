"""Energy-model DSL: the substrate every sampler consumes.

The reference takes Python callables evaluated one state at a time and
differentiates them by central finite differences (tsu/core.py:82-98,
125-133). Here an energy model is a **JAX-traceable** function
``energy(x) -> scalar`` over a single state ``x``; samplers obtain gradients
with ``jax.grad`` and batch over chains with ``vmap``. Anything expressible in
jax.numpy works — including the built-ins below and BNN posteriors
(tsu_tpu/models/ml.py).

Conventions:
    * ``energy`` is the negative unnormalized log-density at temperature 1:
      p(x) ∝ exp(-energy(x) / T).
    * States are float arrays of shape (dim,) for continuous models and
      {-1,+1} spin arrays for Ising models.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

EnergyFn = Callable[[jax.Array], jax.Array]


def validate_energy_fn(energy_fn: EnergyFn, x0) -> None:
    """Probe an energy function once with abstract tracing (cf. tsu/core.py:125-133).

    Raises SamplingError if it is untraceable or returns a non-scalar.
    """
    from tsu_tpu.config import SamplingError

    x0 = jnp.asarray(x0, dtype=jnp.float32)
    try:
        out_shape = jax.eval_shape(energy_fn, x0)
    except Exception as e:  # noqa: BLE001 - surface any tracing failure
        raise SamplingError(
            f"energy function failed tracing on x0 of shape {x0.shape}: {e}"
        ) from e
    if out_shape.shape not in ((), (1,)):
        raise SamplingError(
            f"energy function must return a scalar, got shape {out_shape.shape}"
        )


@dataclass(frozen=True)
class Quadratic:
    """Gaussian energy E(x) = sum((x - mu)^2) / (2 sigma^2).

    The diagonal-covariance Gaussian used across the reference API
    (tsu/core.py:227-230, tsu/api.py:124-126 — but summing over all dims,
    fixing quirk Q4's "only x[0]" behavior).
    """

    mu: float = 0.0
    sigma: float = 1.0

    def __call__(self, x: jax.Array) -> jax.Array:
        return jnp.sum((x - self.mu) ** 2) / (2.0 * self.sigma**2)


@dataclass(frozen=True)
class MixtureOfGaussians:
    """Energy of a K-mode isotropic Gaussian mixture (cf. tsu/api.py:143-149).

    E(x) = -log sum_k w_k exp(-|x - m_k|^2 / (2 s_k^2)), computed stably.
    """

    modes: tuple  # tuple of mode centers, each a (dim,) tuple or float
    sigmas: tuple
    weights: Optional[tuple] = None

    def __call__(self, x: jax.Array) -> jax.Array:
        modes = jnp.asarray(self.modes, dtype=x.dtype)
        sigmas = jnp.asarray(self.sigmas, dtype=x.dtype)
        if modes.ndim == 1:
            modes = modes[:, None]
        w = (
            jnp.asarray(self.weights, dtype=x.dtype)
            if self.weights is not None
            else jnp.ones((modes.shape[0],), dtype=x.dtype) / modes.shape[0]
        )
        sq = jnp.sum((x[None, :] - modes) ** 2, axis=-1)
        log_comp = jnp.log(w) - sq / (2.0 * sigmas**2)
        return -jax.scipy.special.logsumexp(log_comp)


@dataclass(frozen=True)
class DenseIsing:
    """Dense-coupling Ising energy over spins s in {-1,+1}^n.

    E(s) = -1/2 s^T J s - h^T s   (cf. tsu/models/ising.py:99-117).

    Used for small systems (random-J instances, Boltzmann machines); large
    lattices use the stencil representation in tsu_tpu/ops/checkerboard.py
    instead of an O(N^2) dense J (tsu/models/ising.py:64 is dense-only).
    """

    J: jax.Array
    h: jax.Array

    def __call__(self, s: jax.Array) -> jax.Array:
        J = jnp.asarray(self.J)
        h = jnp.asarray(self.h)
        return -0.5 * s @ J @ s - h @ s


@dataclass(frozen=True)
class DenseBoltzmann:
    """Binary Boltzmann energy over bits b in {0,1}^n.

    E(b) = -1/2 b^T J b - h^T b, the Gibbs-sampler convention
    (tsu/gibbs.py:215-236): P(b_i=1 | rest) = sigmoid((J b + h)_i / T).
    """

    J: jax.Array
    h: jax.Array

    def __call__(self, b: jax.Array) -> jax.Array:
        J = jnp.asarray(self.J)
        h = jnp.asarray(self.h)
        return -0.5 * b @ J @ b - h @ b


@dataclass(frozen=True, eq=False)
class BNNPosterior:
    """Negative log posterior of an MLP regressor over a FLAT weight vector.

    The energy-DSL entry promised by SURVEY.md §8.1 L1: plugs the BNN weight
    posterior into every continuous sampler in the framework (Langevin,
    MALA, HMC/NUTS, tempering), giving gold-standard full-Bayes inference to
    compare against the variational path (models/ml.py) — the reference has
    no such capability (its "posterior sampling" never targets the true
    posterior, quirk Q5).

        E(theta) = sum((f(x; theta) - y)^2) / (2 noise_std^2)
                 + sum(theta^2) / (2 prior_std^2)

    ``eq=False``: instances hash by identity so they can be static args of
    jitted samplers while holding device arrays.
    """

    x: jax.Array                  # (N, d_in)
    y: jax.Array                  # (N, d_out)
    sizes: tuple                  # (d_in, hidden..., d_out)
    activation: str = "relu"
    prior_std: float = 1.0
    noise_std: float = 0.1

    @property
    def dim(self) -> int:
        """Total number of parameters in the flat vector."""
        return sum((a + 1) * b for a, b in zip(self.sizes[:-1], self.sizes[1:]))

    def unflatten(self, theta: jax.Array):
        """Flat (dim,) vector -> list of {"w": (a, b), "b": (b,)} layers."""
        layers = []
        off = 0
        for a, b in zip(self.sizes[:-1], self.sizes[1:]):
            w = theta[off:off + a * b].reshape(a, b)
            off += a * b
            bias = theta[off:off + b]
            off += b
            layers.append({"w": w, "b": bias})
        return layers

    def forward(self, theta: jax.Array, x: jax.Array) -> jax.Array:
        from tsu_tpu.models.ml import _ACTIVATIONS

        act = _ACTIVATIONS[self.activation]
        h = x
        layers = self.unflatten(theta)
        for i, layer in enumerate(layers):
            h = h @ layer["w"] + layer["b"]
            if i < len(layers) - 1:
                h = act(h)
        return h

    def __call__(self, theta: jax.Array) -> jax.Array:
        pred = self.forward(theta, jnp.asarray(self.x))
        resid = pred - jnp.asarray(self.y)
        nll = jnp.sum(resid**2) / (2.0 * self.noise_std**2)
        prior = jnp.sum(theta**2) / (2.0 * self.prior_std**2)
        return nll + prior


def lattice_ising_energy(
    spins: jax.Array, J: float = 1.0, h: float = 0.0, periodic: bool = True
) -> jax.Array:
    """Energy of a 2-D nearest-neighbor Ising lattice, stencil form.

    E = -J * sum_<ij> s_i s_j - h * sum_i s_i over right+down bonds.
    Replaces the reference's dense N^2 coupling matrix for grids
    (tsu/models/ising.py:343-361) with an implicit stencil: O(N) memory.
    """
    s = spins
    if periodic:
        right = jnp.roll(s, -1, axis=-1)
        down = jnp.roll(s, -1, axis=-2)
        bond = jnp.sum(s * right) + jnp.sum(s * down)
    else:
        bond = jnp.sum(s[..., :, :-1] * s[..., :, 1:]) + jnp.sum(
            s[..., :-1, :] * s[..., 1:, :]
        )
    return -J * bond - h * jnp.sum(s)


def spins_to_bits(s: jax.Array) -> jax.Array:
    """{-1,+1} -> {0,1} (cf. tsu/models/ising.py:119-121)."""
    return (s + 1.0) / 2.0


def bits_to_spins(b: jax.Array) -> jax.Array:
    """{0,1} -> {-1,+1} (cf. tsu/models/ising.py:123-125)."""
    return 2.0 * b - 1.0


def ising_to_boltzmann(J: jax.Array, h: jax.Array):
    """Map spin-model (J, h) to bit-model (J_bit, h_bit) with matching Gibbs
    conditionals.

    Derivation (fixing reference quirk Q1, tsu/models/ising.py:140-148 whose
    bias sign is negated): with s = 2b - 1,
        E(s) = -1/2 s^T J s - h^T s
             = -1/2 (2b-1)^T J (2b-1) - h^T (2b-1)
             = -2 b^T J b + 2 (rowsum J)^T b - 2 h^T b + const.
    Matching E(b) = -1/2 b^T J_bit b - h_bit^T b gives
        J_bit = 4 J,   h_bit = 2 h - 2 * rowsum(J).
    """
    # NumPy in -> NumPy out: host callers (e.g. the native small-problem SA
    # path) must not be forced onto the accelerator for a 2-line transform.
    if not isinstance(J, jax.Array) and not isinstance(h, jax.Array):
        import numpy as np

        J = np.asarray(J)
        return 4.0 * J, 2.0 * np.asarray(h) - 2.0 * np.sum(J, axis=1)
    J = jnp.asarray(J)
    h = jnp.asarray(h)
    J_bit = 4.0 * J
    h_bit = 2.0 * h - 2.0 * jnp.sum(J, axis=1)
    return J_bit, h_bit
