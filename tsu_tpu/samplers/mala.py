"""Metropolis-adjusted Langevin (MALA) with dual-averaging step adaptation.

Exact MCMC sibling of the unadjusted Langevin engine: overdamped proposal +
Metropolis correction, with the step size adapted during burn-in toward a
target acceptance rate (0.574 is optimal for MALA). Adaptation statistics
average over all vmapped chains — under a sharded chains axis this mean is a
psum, so every chain adapts to the same step (SURVEY.md §8.1 L3).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tsu_tpu.energy import EnergyFn


@partial(
    jax.jit,
    static_argnames=("energy_fn", "n_samples", "n_burnin", "adapt"),
)
def sample_mala(
    key: jax.Array,
    x0: jax.Array,
    *,
    energy_fn: EnergyFn,
    n_samples: int,
    step_size: float = 0.1,
    temperature: float = 1.0,
    n_burnin: int = 200,
    target_accept: float = 0.574,
    adapt: bool = True,
):
    """MALA targeting p ∝ exp(-E/T).

    Args:
        x0: (n_chains, dim) initial states.
    Returns:
        (samples (n_chains, n_samples, dim), info dict with accept_rate and
        the adapted step size).
    """
    x0 = jnp.atleast_2d(jnp.asarray(x0, dtype=jnp.float32))
    n_chains, dim = x0.shape
    grad_e = jax.grad(lambda x: energy_fn(x) / temperature)
    logp = lambda x: -energy_fn(x) / temperature

    def proposal_logq(x_to, x_from, eps):
        mean = x_from - eps * grad_e(x_from)
        return -jnp.sum((x_to - mean) ** 2) / (4.0 * eps)

    def transition(key, x, eps):
        k_n, k_a = jax.random.split(key)
        noise = jax.random.normal(k_n, x.shape, x.dtype)
        prop = x - eps * grad_e(x) + jnp.sqrt(2.0 * eps) * noise
        log_alpha = (
            logp(prop) - logp(x)
            + proposal_logq(x, prop, eps) - proposal_logq(prop, x, eps)
        )
        accept = jnp.log(jax.random.uniform(k_a)) < log_alpha
        return jnp.where(accept, prop, x), accept

    # Dual averaging (Nesterov / Hoffman-Gelman) on log step size.
    mu_da = jnp.log(10.0 * step_size)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def burn_body(carry, inp):
        x, log_eps, log_eps_bar, h_bar = carry
        t, k = inp
        eps = jnp.exp(log_eps)
        x_new, acc = jax.vmap(lambda kk, xx: transition(kk, xx, eps))(
            jax.random.split(k, n_chains), x
        )
        accept_rate = jnp.mean(acc.astype(jnp.float32))
        if adapt:
            tf = t.astype(jnp.float32) + 1.0
            h_bar = (1.0 - 1.0 / (tf + t0)) * h_bar + (
                target_accept - accept_rate
            ) / (tf + t0)
            log_eps = mu_da - jnp.sqrt(tf) / gamma * h_bar
            eta = tf ** (-kappa)
            log_eps_bar = eta * log_eps + (1.0 - eta) * log_eps_bar
        return (x_new, log_eps, log_eps_bar, h_bar), None

    k_burn, k_main = jax.random.split(key)
    carry = (x0, jnp.log(step_size), jnp.log(step_size), jnp.float32(0.0))
    carry, _ = jax.lax.scan(
        burn_body, carry,
        (jnp.arange(n_burnin), jax.random.split(k_burn, n_burnin)),
    )
    x, _, log_eps_bar, _ = carry
    eps = jnp.exp(log_eps_bar)

    def main_body(carry, k):
        x, n_acc = carry
        x, acc = jax.vmap(lambda kk, xx: transition(kk, xx, eps))(
            jax.random.split(k, n_chains), x
        )
        return (x, n_acc + jnp.sum(acc)), x

    (x, n_acc), samples = jax.lax.scan(
        main_body, (x, jnp.int32(0)), jax.random.split(k_main, n_samples)
    )
    samples = jnp.swapaxes(samples, 0, 1)  # (chains, samples, dim)
    info = {
        "accept_rate": n_acc / (n_chains * n_samples),
        "step_size": eps,
    }
    return samples, info
