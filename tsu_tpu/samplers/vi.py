"""Mean-field Gaussian variational inference for arbitrary energies.

The generic VI sampler of the engine (SURVEY.md §8.1 L3): fits
q(x) = N(mu, diag(sigma^2)) to p(x) ∝ exp(-E(x)/T) by maximizing the
reparameterized ELBO with optax. The BNN path (tsu_tpu/models/ml.py) is the
structured special case; this works on any traceable energy.

ELBO(mu, rho) = E_q[-E(x)/T] + H(q),  x = mu + softplus(rho) * eps.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from tsu_tpu.energy import EnergyFn


class MeanFieldParams(NamedTuple):
    mu: jax.Array
    rho: jax.Array  # sigma = softplus(rho)

    @property
    def sigma(self):
        return jax.nn.softplus(self.rho)


def _neg_elbo(params: MeanFieldParams, key, energy_fn, temperature, n_mc):
    sigma = jax.nn.softplus(params.rho)
    eps = jax.random.normal(key, (n_mc,) + params.mu.shape)
    xs = params.mu + sigma * eps
    energies = jax.vmap(energy_fn)(xs) / temperature
    entropy = jnp.sum(jnp.log(sigma)) + 0.5 * params.mu.size * (
        1.0 + jnp.log(2.0 * jnp.pi)
    )
    return jnp.mean(energies) - entropy


@partial(jax.jit, static_argnames=("energy_fn", "n_steps", "n_mc", "optimizer_update"))
def _fit(params, opt_state, key, *, energy_fn, temperature, n_steps, n_mc,
         optimizer_update):
    def step(carry, k):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(
            lambda p: _neg_elbo(p, k, energy_fn, temperature, n_mc)
        )(params)
        updates, opt_state = optimizer_update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    (params, opt_state), losses = jax.lax.scan(
        step, (params, opt_state), jax.random.split(key, n_steps)
    )
    return params, losses


def fit_meanfield_vi(
    key: jax.Array,
    energy_fn: EnergyFn,
    dim: int,
    *,
    temperature: float = 1.0,
    n_steps: int = 1000,
    n_mc: int = 16,
    learning_rate: float = 0.05,
    init_mu=None,
    init_sigma: float = 1.0,
) -> dict:
    """Fit N(mu, diag(sigma^2)) to exp(-E/T); one compiled scan.

    Returns dict with params (mu, sigma), the loss trace, and a ``sample``
    closure drawing from the fitted q.
    """
    import numpy as np

    mu0 = (jnp.zeros(dim) if init_mu is None
           else jnp.asarray(init_mu, dtype=jnp.float32))
    rho0 = jnp.full((dim,), float(np.log(np.expm1(init_sigma))))
    params = MeanFieldParams(mu0, rho0)
    # Cosine decay quenches the MC noise of the final iterate.
    optimizer = optax.adam(optax.cosine_decay_schedule(learning_rate, n_steps))
    opt_state = optimizer.init(params)

    k_fit, k_post = jax.random.split(key)
    params, losses = _fit(
        params, opt_state, k_fit,
        energy_fn=energy_fn, temperature=temperature, n_steps=n_steps,
        n_mc=n_mc, optimizer_update=optimizer.update,
    )

    sigma = jax.nn.softplus(params.rho)

    def sample(key, n_samples: int):
        eps = jax.random.normal(key, (n_samples, dim))
        return params.mu + sigma * eps

    return {
        "mu": params.mu,
        "sigma": sigma,
        "losses": losses,
        "sample": sample,
        "elbo": -float(losses[-1]),
    }
