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
def sample_hmc_adaptive(
    key: jax.Array,
    x0: jax.Array,
    *,
    energy_fn: EnergyFn,
    n_samples: int,
    n_leapfrog: int = 16,
    temperature: float = 1.0,
    n_burnin: int = 300,
    target_accept: float = 0.8,
):
    """HMC with dual-averaging step-size adaptation and jittered trajectory
    lengths (uniform over [1, n_leapfrog] leapfrog steps, which breaks
    resonances the way NUTS' dynamic trajectories do while staying a simple
    fixed-shape scan). Acceptance statistics average over all chains.

    Returns (samples (chains, n_samples, dim), info dict).
    """
    x0 = jnp.atleast_2d(jnp.asarray(x0, dtype=jnp.float32))
    n_chains, dim = x0.shape
    grad_e = jax.grad(lambda x: energy_fn(x) / temperature)
    logp = lambda x: -energy_fn(x) / temperature

    def leapfrog(x, p, eps, n_steps):
        def body(i, xp):
            x, p = xp
            x = x + eps * p
            p = jnp.where(i < n_steps - 1, p - eps * grad_e(x), p)
            return (x, p)

        p = p - 0.5 * eps * grad_e(x)
        x, p = jax.lax.fori_loop(0, n_leapfrog, lambda i, xp: jax.lax.cond(
            i < n_steps, lambda xp: body(i, xp), lambda xp: xp, xp), (x, p))
        p = p - 0.5 * eps * grad_e(x)
        return x, p

    def transition(key, x, eps):
        k_m, k_l, k_a = jax.random.split(key, 3)
        n_steps = jax.random.randint(k_l, (), 1, n_leapfrog + 1)
        p = jax.random.normal(k_m, x.shape, x.dtype)
        x_new, p_new = leapfrog(x, p, eps, n_steps)
        h_old = -logp(x) + 0.5 * jnp.sum(p**2)
        h_new = -logp(x_new) + 0.5 * jnp.sum(p_new**2)
        log_alpha = jnp.minimum(h_old - h_new, 0.0)
        # A divergent trajectory (NaN/inf energy) counts as rejection.
        log_alpha = jnp.where(jnp.isfinite(log_alpha), log_alpha, -jnp.inf)
        accept = jnp.log(jax.random.uniform(k_a)) < log_alpha
        return jnp.where(accept, x_new, x), jnp.exp(log_alpha)

    eps0 = 0.1
    mu_da = jnp.log(10.0 * eps0)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def burn_body(carry, inp):
        x, log_eps, log_eps_bar, h_bar = carry
        t, k = inp
        eps = jnp.exp(log_eps)
        x, alpha = jax.vmap(lambda kk, xx: transition(kk, xx, eps))(
            jax.random.split(k, n_chains), x
        )
        mean_alpha = jnp.mean(alpha)
        tf = t.astype(jnp.float32) + 1.0
        h_bar = (1.0 - 1.0 / (tf + t0)) * h_bar + (target_accept - mean_alpha) / (tf + t0)
        # Clamp: runaway steps produce NaN trajectories that poison the
        # averages otherwise.
        log_eps = jnp.clip(mu_da - jnp.sqrt(tf) / gamma * h_bar, -10.0, 2.0)
        eta = tf ** (-kappa)
        log_eps_bar = eta * log_eps + (1.0 - eta) * log_eps_bar
        return (x, log_eps, log_eps_bar, h_bar), None

    k_burn, k_main = jax.random.split(key)
    carry = (x0, jnp.log(eps0), jnp.log(eps0), jnp.float32(0.0))
    carry, _ = jax.lax.scan(
        burn_body, carry,
        (jnp.arange(n_burnin), jax.random.split(k_burn, n_burnin)),
    )
    x, _, log_eps_bar, _ = carry
    eps = jnp.exp(log_eps_bar)

    def main_body(carry, k):
        x, acc_sum = carry
        x, alpha = jax.vmap(lambda kk, xx: transition(kk, xx, eps))(
            jax.random.split(k, n_chains), x
        )
        return (x, acc_sum + jnp.mean(alpha)), x

    (x, acc_sum), samples = jax.lax.scan(
        main_body, (x, jnp.float32(0.0)), jax.random.split(k_main, n_samples)
    )
    samples = jnp.swapaxes(samples, 0, 1)
    return samples, {"accept_rate": acc_sum / n_samples, "step_size": eps}


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
