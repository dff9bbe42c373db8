"""Annealed SMC with the particle population sharded over the chains axis.

r1 gap #5 / SURVEY §8.3 item 4: distributed systematic resampling. The
particle state lives sharded on the ``chains`` mesh axis; everything except
resampling is embarrassingly parallel. Resampling needs global information:

* log-weights: ``all_gather`` of the (P,) vector — tiny vs particle state;
* ESS / log-Z increments: computed from the gathered weights (identical on
  every shard, so the resample-or-not branch is taken consistently);
* redistribution: the global systematic index vector is computed identically
  on all shards (one shared uniform offset), and each shard materializes the
  full particle matrix once via ``all_gather`` and slices out its own rows.
  Resampling fires only when ESS drops below threshold, so the gather is
  amortized; for particle states too large to gather, the same index vector
  can drive a ppermute exchange instead (replica-redistribution literature,
  PAPERS.md) — not needed at these state sizes.

Semantics match tsu_tpu/samplers/smc.py:annealed_smc exactly (same ladder,
same weights, same resampling rule); log_Z agreement within MC error is
tested on the 8-device CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tsu_tpu.energy import EnergyFn
from tsu_tpu.samplers.smc import systematic_resample_indices


def annealed_smc_sharded(
    mesh,
    key: jax.Array,
    particles,
    *,
    energy_fn: EnergyFn,
    n_steps: int = 50,
    n_moves: int = 5,
    dt: float = 0.05,
    friction: float = 1.0,
    temperature: float = 1.0,
    base_sigma: float = 3.0,
    ess_threshold: float = 0.5,
    axis: str = "chains",
):
    """Sharded annealed SMC; mirrors :func:`tsu_tpu.samplers.smc.annealed_smc`.

    Args:
        mesh: a Mesh with the particle axis ``axis``.
        particles: (P, dim) initial particles ~ N(0, base_sigma^2); P must be
            divisible by the axis size.
    Returns:
        dict with (host-resident) particles, log_weights, log_Z, ess_history.
    """
    n_shards = mesh.shape[axis]
    particles = jnp.asarray(particles, jnp.float32)
    P_total, dim = particles.shape
    assert P_total % n_shards == 0, "P must divide the mesh axis"
    betas = jnp.linspace(0.0, 1.0, n_steps + 1)

    def e_base(x):
        return jnp.sum(x**2) / (2.0 * base_sigma**2)

    def e_target(x):
        return energy_fn(x) / temperature

    def e_beta(x, beta):
        return (1.0 - beta) * e_base(x) + beta * e_target(x)

    def move(key, x, beta):
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

    def shard_body(key, particles):
        """Runs per shard: particles (P_local, dim), key replicated."""
        my = jax.lax.axis_index(axis)
        P_local = particles.shape[0]

        def body(carry, inp):
            particles, log_w, log_z = carry
            beta_prev, beta, k = inp
            delta = -(beta - beta_prev) * (
                e_target_v(particles) - e_base_v(particles)
            )
            log_w = log_w + delta
            # Global weight vector: (P,) — tiny next to particle state.
            log_w_all = jax.lax.all_gather(log_w, axis).reshape(-1)
            log_z_inc = (jax.scipy.special.logsumexp(log_w_all)
                         - jnp.log(P_total))
            w_norm = jax.nn.softmax(log_w_all)
            ess = 1.0 / jnp.sum(w_norm**2)
            k_res, k_move = jax.random.split(k)

            def do_resample(args):
                particles, log_w, log_z = args
                # One shared uniform offset -> identical global index vector
                # on every shard; each shard keeps its own row range.
                idx = systematic_resample_indices(k_res, log_w_all)
                all_parts = jax.lax.all_gather(particles, axis).reshape(
                    P_total, dim
                )
                mine = jax.lax.dynamic_slice_in_dim(
                    idx, my * P_local, P_local
                )
                return (all_parts[mine], jnp.zeros_like(log_w),
                        log_z + log_z_inc)

            def no_resample(args):
                # Match collective structure cost-free: the predicate is
                # identical on all shards, so both branches stay consistent.
                return args

            particles, log_w, log_z = jax.lax.cond(
                ess < ess_threshold * P_total, do_resample, no_resample,
                (particles, log_w, log_z),
            )
            k_shard = jax.random.fold_in(k_move, my)
            particles = jax.vmap(lambda kk, x: move(kk, x, beta))(
                jax.random.split(k_shard, P_local), particles
            )
            return (particles, log_w, log_z), ess

        log_w0 = jnp.zeros(P_local)
        keys = jax.random.split(key, n_steps)
        (particles, log_w, log_z), ess_hist = jax.lax.scan(
            body, (particles, log_w0, jnp.float32(0.0)),
            (betas[:-1], betas[1:], keys),
        )
        log_w_all = jax.lax.all_gather(log_w, axis).reshape(-1)
        log_z = log_z + (jax.scipy.special.logsumexp(log_w_all)
                         - jnp.log(P_total))
        return particles, log_w, log_z, ess_hist

    from jax import shard_map

    fn = jax.jit(shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=(P(axis, None), P(axis), P(), P()),
        check_vma=False,
    ))
    particles = jax.device_put(
        particles, NamedSharding(mesh, P(axis, None))
    )
    parts, log_w, log_z, ess_hist = fn(key, particles)
    import numpy as np

    return {
        "particles": np.asarray(parts),
        "log_weights": np.asarray(log_w),
        "log_Z": float(np.asarray(log_z).reshape(-1)[0]),
        "ess_history": np.asarray(ess_hist).reshape(n_steps, -1)[:, 0],
    }
