"""Annealed sequential Monte Carlo (AIS/SMC) with systematic resampling.

New capability beyond the reference (SURVEY.md §8.2 M5): a population of
particles is transported from an easy base distribution to the target through
a beta-ladder, reweighting + systematic resampling + Langevin moves, all in
one compiled scan. Also returns the log normalizing constant estimate.

Distributed note: particles live on the ``chains`` mesh axis; the systematic
resampling step uses a full weight vector, so under sharding it runs as an
all-gathered (P,)-sized op — tiny compared to particle state, exactly the
pattern of the replica-redistribution literature (PAPERS.md).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from tsu_tpu.energy import EnergyFn


def systematic_resample_indices(key, log_w):
    """Systematic resampling: indices (P,) drawn with one uniform offset."""
    P = log_w.shape[0]
    w = jax.nn.softmax(log_w)
    cum = jnp.cumsum(w)
    u = (jax.random.uniform(key) + jnp.arange(P)) / P
    return jnp.searchsorted(cum, u, side="left").clip(0, P - 1)


@partial(
    jax.jit,
    static_argnames=("energy_fn", "n_steps", "n_moves", "ess_threshold"),
)
def annealed_smc(
    key: jax.Array,
    particles: jax.Array,
    *,
    energy_fn: EnergyFn,
    n_steps: int = 50,
    n_moves: int = 5,
    dt: float = 0.05,
    friction: float = 1.0,
    temperature: float = 1.0,
    base_sigma: float = 3.0,
    ess_threshold: float = 0.5,
):
    """Anneal particles from N(0, base_sigma^2) to p ∝ exp(-E/T).

    Interpolated energy: E_beta(x) = (1-beta) |x|^2/(2 s^2) + beta E(x)/T.

    Args:
        particles: (P, dim) initial particles ~ N(0, base_sigma^2).
    Returns:
        dict with particles, log_Z, ess_history.
    """
    P, dim = particles.shape
    betas = jnp.linspace(0.0, 1.0, n_steps + 1)

    def e_base(x):
        return jnp.sum(x**2) / (2.0 * base_sigma**2)

    def e_target(x):
        return energy_fn(x) / temperature

    def e_beta(x, beta):
        return (1.0 - beta) * e_base(x) + beta * e_target(x)

    def move(key, x, beta):
        """n_moves overdamped Langevin steps on E_beta."""
        grad = jax.grad(lambda x: e_beta(x, beta))

        def body(i, xk):
            x, k = xk
            k, sub = jax.random.split(k)
            noise = jax.random.normal(sub, x.shape, x.dtype)
            x = x - grad(x) * dt + jnp.sqrt(2.0 * dt) * noise
            return (x, k)

        x, _ = jax.lax.fori_loop(0, n_moves, body, (x, key))
        return x

    e_base_v = jax.vmap(e_base)
    e_target_v = jax.vmap(e_target)

    def body(carry, inp):
        particles, log_w, log_z = carry
        beta_prev, beta, k = inp
        # Incremental weights: -(beta - beta_prev) * (E_target - E_base).
        delta = -(beta - beta_prev) * (e_target_v(particles) - e_base_v(particles))
        log_w = log_w + delta
        log_z_inc = jax.scipy.special.logsumexp(log_w) - jnp.log(P)
        # Normalized ESS; resample when it drops below threshold.
        w_norm = jax.nn.softmax(log_w)
        ess = 1.0 / jnp.sum(w_norm**2)
        k_res, k_move = jax.random.split(k)

        def do_resample(args):
            particles, log_w, log_z = args
            # Absorb the current (unnormalized since last resample) weights
            # into the running log-Z estimate, then reset weights to uniform.
            idx = systematic_resample_indices(k_res, log_w)
            return particles[idx], jnp.zeros_like(log_w), log_z + log_z_inc

        def no_resample(args):
            return args

        particles, log_w, log_z = jax.lax.cond(
            ess < ess_threshold * P, do_resample, no_resample, (particles, log_w, log_z)
        )
        particles = jax.vmap(lambda kk, x: move(kk, x, beta))(
            jax.random.split(k_move, P), particles
        )
        return (particles, log_w, log_z), ess

    log_w0 = jnp.zeros(P)
    keys = jax.random.split(key, n_steps)
    (particles, log_w, log_z), ess_hist = jax.lax.scan(
        body, (particles, log_w0, jnp.float32(0.0)), (betas[:-1], betas[1:], keys)
    )
    log_z = log_z + jax.scipy.special.logsumexp(log_w) - jnp.log(P)
    return {"particles": particles, "log_weights": log_w, "log_Z": log_z,
            "ess_history": ess_hist}
