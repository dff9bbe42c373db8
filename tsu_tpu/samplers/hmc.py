"""Hamiltonian Monte Carlo with vmapped chains.

New capability beyond the reference (SURVEY.md §8.1 L3): exact MCMC for
continuous energies, sharing the leapfrog integrator family with the Langevin
engine. One jitted scan per run; Metropolis correction makes the invariant
distribution exact at any step size.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tsu_tpu.energy import EnergyFn


@partial(
    jax.jit,
    static_argnames=("energy_fn", "n_samples", "n_leapfrog", "n_burnin"),
)
def sample_hmc(
    key: jax.Array,
    x0: jax.Array,
    *,
    energy_fn: EnergyFn,
    n_samples: int,
    step_size: float = 0.1,
    n_leapfrog: int = 10,
    temperature: float = 1.0,
    n_burnin: int = 100,
):
    """HMC targeting p(x) ∝ exp(-E(x)/T).

    Args:
        x0: (n_chains, dim) initial states.
    Returns:
        (samples (n_chains, n_samples, dim), accept_rate scalar).
    """
    x0 = jnp.atleast_2d(jnp.asarray(x0, dtype=jnp.float32))
    grad_e = jax.grad(lambda x: energy_fn(x) / temperature)
    logp = lambda x: -energy_fn(x) / temperature

    def leapfrog(x, p):
        p = p - 0.5 * step_size * grad_e(x)

        def body(i, xp):
            x, p = xp
            x = x + step_size * p
            p = p - step_size * grad_e(x)
            return (x, p)

        x, p = jax.lax.fori_loop(0, n_leapfrog - 1, body, (x, p))
        x = x + step_size * p
        p = p - 0.5 * step_size * grad_e(x)
        return x, p

    def transition(key, x):
        k_mom, k_acc = jax.random.split(key)
        p = jax.random.normal(k_mom, x.shape, x.dtype)
        x_new, p_new = leapfrog(x, p)
        h_old = -logp(x) + 0.5 * jnp.sum(p**2)
        h_new = -logp(x_new) + 0.5 * jnp.sum(p_new**2)
        log_alpha = h_old - h_new
        accept = jnp.log(jax.random.uniform(k_acc)) < log_alpha
        return jnp.where(accept, x_new, x), accept

    def chain(key, x):
        def body(carry, k):
            x, n_acc = carry
            x, acc = transition(k, x)
            return (x, n_acc + acc), x

        (x, n_acc), _ = jax.lax.scan(
            body, (x, jnp.int32(0)), jax.random.split(jax.random.fold_in(key, 0), n_burnin)
        )
        (x, n_acc2), samples = jax.lax.scan(
            body, (x, jnp.int32(0)), jax.random.split(jax.random.fold_in(key, 1), n_samples)
        )
        return samples, n_acc2

    keys = jax.random.split(key, x0.shape[0])
    samples, n_acc = jax.vmap(chain)(keys, x0)
    accept_rate = jnp.sum(n_acc) / (x0.shape[0] * n_samples)
    return samples, accept_rate
