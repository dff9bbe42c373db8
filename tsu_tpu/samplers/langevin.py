"""Langevin dynamics samplers: fused, jitted, vmapped over chains.

Replaces the reference's scalar-Python Langevin loop (tsu/core.py:64-162):
finite-difference gradients (2*dim energy evals per step, tsu/core.py:82-98)
become one ``jax.grad``; the per-sample Python loop becomes a single
``lax.scan`` compiled by XLA; "parallel chains" become a real vmapped batch
axis instead of re-jittered restarts (quirk Q4, tsu/core.py:140-143).

Two integrators:
  * overdamped Euler-Maruyama: x += -grad E * dt/gamma + sqrt(2 T dt/gamma) xi
    (the reference's dynamics, tsu/core.py:64-80)
  * underdamped BAOAB leapfrog (default): second-order accurate, much larger
    usable step sizes — the BASELINE.json target integrator.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from tsu_tpu.energy import EnergyFn


def make_langevin_step(
    energy_fn: EnergyFn,
    *,
    underdamped: bool = True,
):
    """Build a single Langevin transition ``step(key, (x, v), T, dt, gamma, mass)``.

    Returns a pure function suitable as a ``lax.scan`` body. ``x`` and ``v``
    have shape (dim,); temperature and step parameters are traced so annealing
    schedules compile once.
    """
    grad_e = jax.grad(energy_fn)

    if underdamped:

        def step(key, xv, temperature, dt, friction, mass):
            x, v = xv
            # BAOAB splitting (Leimkuhler & Matthews).
            g = grad_e(x)
            v = v - 0.5 * dt * g / mass
            x = x + 0.5 * dt * v
            c1 = jnp.exp(-friction * dt)
            c2 = jnp.sqrt((1.0 - c1**2) * temperature / mass)
            v = c1 * v + c2 * jax.random.normal(key, x.shape, x.dtype)
            x = x + 0.5 * dt * v
            v = v - 0.5 * dt * grad_e(x) / mass
            return (x, v)

    else:

        def step(key, xv, temperature, dt, friction, mass):
            x, v = xv
            noise = jax.random.normal(key, x.shape, x.dtype)
            x = x - grad_e(x) * dt / friction + jnp.sqrt(
                2.0 * temperature * dt / friction
            ) * noise
            return (x, v)

    return step


@partial(
    jax.jit,
    static_argnames=("energy_fn", "n_samples", "n_burnin", "n_steps", "underdamped"),
)
def sample_langevin(
    key: jax.Array,
    x0: jax.Array,
    *,
    energy_fn: EnergyFn,
    n_samples: int,
    temperature: float = 1.0,
    dt: float = 0.01,
    friction: float = 1.0,
    mass: float = 1.0,
    n_burnin: int = 100,
    n_steps: int = 10,
    underdamped: bool = True,
) -> jax.Array:
    """Sample from p(x) ∝ exp(-E(x)/T) with Langevin dynamics.

    Args:
        key: PRNG key.
        x0: initial states, shape (n_chains, dim).
        energy_fn: traceable scalar energy over a (dim,) state.
        n_samples: samples retained per chain.
        n_steps: integration steps between retained samples (thinning).

    Returns:
        samples of shape (n_chains, n_samples, dim).

    The whole trajectory — burn-in, thinning, collection — is one compiled
    scan; nothing returns to the host until the result (cf. the reference's
    per-step Python dispatch, tsu/core.py:140-159).
    """
    x0 = jnp.atleast_2d(jnp.asarray(x0, dtype=jnp.float32))
    n_chains, dim = x0.shape
    step = make_langevin_step(energy_fn, underdamped=underdamped)

    def chain(key, x_init):
        v_init = jnp.sqrt(temperature / mass) * jax.random.normal(
            jax.random.fold_in(key, 0), x_init.shape, x_init.dtype
        )

        def run_steps(carry, n):
            def body(i, state):
                xv, k = state
                k, sub = jax.random.split(k)
                return (step(sub, xv, temperature, dt, friction, mass), k)

            return jax.lax.fori_loop(0, n, body, carry)

        carry = ((x_init, v_init), jax.random.fold_in(key, 1))
        carry = run_steps(carry, n_burnin)

        def collect(carry, _):
            carry = run_steps(carry, n_steps)
            return carry, carry[0][0]

        _, samples = jax.lax.scan(collect, carry, None, length=n_samples)
        return samples

    keys = jax.random.split(key, n_chains)
    return jax.vmap(chain)(keys, x0)
