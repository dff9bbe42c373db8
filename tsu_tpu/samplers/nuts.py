"""No-U-Turn Sampler (iterative, multinomial), jittable with static max depth.

Implements multinomial NUTS (Betancourt 2017) with the iterative subtree
construction of Phan & Pradhan: a fixed (max_depth+1)-slot stack holds the
left endpoints of the balanced subtrees under construction, so sub-U-turn
checks run without recursion and the whole sampler is one ``lax.scan`` /
``fori_loop`` nest with static shapes — TPU-compilable, vmapped over chains.

Per transition:
  * trajectory doubles up to ``max_depth`` times in random directions;
  * each new subtree of 2^d leapfrog steps is built iteratively; every
    balanced sub-subtree is U-turn-checked between its endpoints, leaves are
    multinomially reservoir-sampled by exp(-H);
  * a subtree containing a U-turn or divergence stops the doubling without
    contributing a candidate; otherwise the new candidate replaces the old
    with probability W_new / W_total (biased progressive sampling), and the
    merged trajectory is U-turn-checked end to end.

Step size adapts by dual averaging toward ``target_accept`` during burn-in.
Statistically validated against exact Gaussian moments in tests.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tsu_tpu.energy import EnergyFn

_DIVERGENCE = 1000.0  # energy-error threshold for divergent trajectories


def _uturn(dq, p_left, p_right):
    """U-turn between endpoints, velocities in trajectory order."""
    return (jnp.dot(dq, p_left) < 0.0) | (jnp.dot(dq, p_right) < 0.0)


def _build_subtree(key, q0, p0, direction, depth, eps, grad_e, hamiltonian, h0):
    """Build 2^depth leapfrog steps from (q0, p0) in ``direction``.

    Returns dict with endpoints, multinomial candidate, logW, turned flag.
    All shapes static; inactive steps (when the caller requests a smaller
    depth via masking) are handled by the caller running this with exact
    length = 2^depth.
    """
    dim = q0.shape[0]
    L = 2 ** depth
    eps_d = direction * eps

    # Stacks: left endpoints of level-l subtrees (level 0..depth).
    q_stack = jnp.zeros((depth + 1, dim))
    p_stack = jnp.zeros((depth + 1, dim))

    def leapfrog(q, p):
        p = p - 0.5 * eps_d * grad_e(q)
        q = q + eps_d * p
        p = p - 0.5 * eps_d * grad_e(q)
        return q, p

    def body(n, carry):
        (q, p, q_stack, p_stack, cand, logW, turned, diverged, k) = carry
        q, p = leapfrog(q, p)
        h = hamiltonian(q, p)
        logw = h0 - h
        diverged = diverged | (h - h0 > _DIVERGENCE) | ~jnp.isfinite(h)

        # Push left endpoints: n is the left leaf of level-l subtrees for all
        # l with n % 2^l == 0.
        def push(l, stacks):
            q_stack, p_stack = stacks
            pred = (n % (2 ** l)) == 0
            q_stack = q_stack.at[l].set(jnp.where(pred, q, q_stack[l]))
            p_stack = p_stack.at[l].set(jnp.where(pred, p, p_stack[l]))
            return (q_stack, p_stack)

        for l in range(depth + 1):
            q_stack, p_stack = push(l, (q_stack, p_stack))

        # Completed balanced subtrees: every l >= 1 with (n+1) % 2^l == 0.
        for l in range(1, depth + 1):
            done = ((n + 1) % (2 ** l)) == 0
            dq = (q - q_stack[l]) * direction
            turned = turned | (done & _uturn(dq, direction * p_stack[l],
                                             direction * p))

        # Multinomial reservoir over leaves.
        k, sub = jax.random.split(k)
        logW_new = jnp.logaddexp(logW, logw)
        take = jnp.log(jax.random.uniform(sub)) < (logw - logW_new)
        cand = jnp.where(take & ~diverged, q, cand)
        logW = jnp.where(diverged, logW, logW_new)
        return (q, p, q_stack, p_stack, cand, logW, turned, diverged, k)

    init = (q0, p0, q_stack, p_stack, q0, -jnp.inf, False, False, key)
    q, p, _, _, cand, logW, turned, diverged, _ = jax.lax.fori_loop(
        0, L, body, init
    )
    return {
        "q_end": q, "p_end": p, "cand": cand, "logW": logW,
        "turned": turned | diverged, "diverged": diverged,
    }


def _nuts_transition(key, q, eps, grad_e, hamiltonian, max_depth):
    dim = q.shape[0]
    k_mom, k_loop = jax.random.split(key)
    p0 = jax.random.normal(k_mom, (dim,))
    h0 = hamiltonian(q, p0)

    class _S(NamedTuple):
        q_left: jax.Array
        p_left: jax.Array
        q_right: jax.Array
        p_right: jax.Array
        cand: jax.Array
        logW: jax.Array
        depth: jax.Array
        done: jax.Array
        key: jax.Array
        sum_alpha: jax.Array  # acceptance statistic for adaptation
        n_alpha: jax.Array

    # Build depth-by-depth with static unroll (max_depth is small).
    state = _S(q, p0, q, p0, q, jnp.float32(0.0), jnp.int32(0),
               jnp.array(False), k_loop, jnp.float32(0.0), jnp.float32(0.0))

    def doubling(d, state):
        def extend(state):
            k = state.key
            k, k_dir, k_sub, k_bias = jax.random.split(k, 4)
            go_right = jax.random.bernoulli(k_dir)
            q0 = jnp.where(go_right, state.q_right, state.q_left)
            p0 = jnp.where(go_right, state.p_right, state.p_left)
            direction = jnp.where(go_right, 1.0, -1.0)
            tree = _build_subtree(k_sub, q0, p0, direction, d, eps,
                                  grad_e, hamiltonian, h0)
            # Acceptance statistic: mean of min(1, exp(h0 - h)) over the new
            # subtree ~ exp(logW - log L) bounded by 1.
            L = jnp.float32(2 ** d)
            alpha = jnp.minimum(jnp.exp(tree["logW"]) / L, 1.0)
            sum_alpha = state.sum_alpha + alpha
            n_alpha = state.n_alpha + 1.0

            q_left = jnp.where(go_right, state.q_left, tree["q_end"])
            p_left = jnp.where(go_right, state.p_left, tree["p_end"])
            q_right = jnp.where(go_right, tree["q_end"], state.q_right)
            p_right = jnp.where(go_right, tree["p_end"], state.p_right)

            # Biased progressive sampling from the VALID new subtree.
            accept_new = (
                jnp.log(jax.random.uniform(k_bias))
                < (tree["logW"] - state.logW)
            ) & ~tree["turned"]
            cand = jnp.where(accept_new, tree["cand"], state.cand)
            logW = jnp.logaddexp(state.logW, jnp.where(tree["turned"],
                                                       -jnp.inf, tree["logW"]))

            # Stop on subtree U-turn/divergence or global U-turn.
            dq = q_right - q_left
            global_turn = _uturn(dq, p_left, p_right)
            done = tree["turned"] | global_turn
            return _S(q_left, p_left, q_right, p_right, cand, logW,
                      state.depth + 1, done, k, sum_alpha, n_alpha)

        return jax.lax.cond(state.done, lambda s: s, extend, state)

    for d in range(max_depth):
        state = doubling(d, state)

    accept_stat = state.sum_alpha / jnp.maximum(state.n_alpha, 1.0)
    return state.cand, accept_stat, state.depth


@partial(
    jax.jit,
    static_argnames=("energy_fn", "n_samples", "max_depth", "n_burnin"),
)
def sample_nuts(
    key: jax.Array,
    x0: jax.Array,
    *,
    energy_fn: EnergyFn,
    n_samples: int,
    max_depth: int = 8,
    temperature: float = 1.0,
    n_burnin: int = 300,
    target_accept: float = 0.8,
    init_step_size: float = 0.1,
):
    """NUTS targeting p ∝ exp(-E/T); vmapped chains, adapted step size.

    Returns (samples (n_chains, n_samples, dim), info dict).
    """
    x0 = jnp.atleast_2d(jnp.asarray(x0, dtype=jnp.float32))
    n_chains, dim = x0.shape
    grad_e = jax.grad(lambda x: energy_fn(x) / temperature)

    def hamiltonian(q, p):
        return energy_fn(q) / temperature + 0.5 * jnp.sum(p**2)

    mu_da = jnp.log(10.0 * init_step_size)
    gamma, t0, kappa = 0.05, 10.0, 0.75

    def burn_body(carry, inp):
        x, log_eps, log_eps_bar, h_bar = carry
        t, k = inp
        eps = jnp.exp(log_eps)
        x, alpha, _ = jax.vmap(
            lambda kk, xx: _nuts_transition(kk, xx, eps, grad_e, hamiltonian,
                                            max_depth)
        )(jax.random.split(k, n_chains), x)
        mean_alpha = jnp.mean(alpha)
        tf = t.astype(jnp.float32) + 1.0
        h_bar = (1.0 - 1.0 / (tf + t0)) * h_bar + (
            target_accept - mean_alpha
        ) / (tf + t0)
        log_eps = jnp.clip(mu_da - jnp.sqrt(tf) / gamma * h_bar, -10.0, 2.0)
        eta = tf ** (-kappa)
        log_eps_bar = eta * log_eps + (1.0 - eta) * log_eps_bar
        return (x, log_eps, log_eps_bar, h_bar), None

    k_burn, k_main = jax.random.split(key)
    carry = (x0, jnp.log(init_step_size), jnp.log(init_step_size),
             jnp.float32(0.0))
    carry, _ = jax.lax.scan(
        burn_body, carry,
        (jnp.arange(n_burnin), jax.random.split(k_burn, n_burnin)),
    )
    x, _, log_eps_bar, _ = carry
    eps = jnp.exp(log_eps_bar)

    def main_body(carry, k):
        x, acc, depth_sum = carry
        x, alpha, depth = jax.vmap(
            lambda kk, xx: _nuts_transition(kk, xx, eps, grad_e, hamiltonian,
                                            max_depth)
        )(jax.random.split(k, n_chains), x)
        return (x, acc + jnp.mean(alpha), depth_sum + jnp.mean(depth.astype(jnp.float32))), x

    (x, acc, depth_sum), samples = jax.lax.scan(
        main_body, (x, jnp.float32(0.0), jnp.float32(0.0)),
        jax.random.split(k_main, n_samples),
    )
    samples = jnp.swapaxes(samples, 0, 1)
    info = {
        "accept_stat": acc / n_samples,
        "mean_tree_depth": depth_sum / n_samples,
        "step_size": eps,
    }
    return samples, info
