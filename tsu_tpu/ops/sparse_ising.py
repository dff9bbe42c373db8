"""Sparse Ising systems in ELL format: large-graph annealing on TPU.

The reference materializes a dense N^2 coupling matrix
(tsu/models/ising.py:64), capping it at tens of spins. Production-scale
optimization (100k-node MAX-CUT — BASELINE config 5) needs sparsity. ELL
(ELLPACK) is the TPU-friendly sparse layout: a fixed neighbor budget K per
site gives static shapes

    neighbor_idx: (N, K) int32   (padded with N -> gathers a zero slot)
    neighbor_w:   (N, K) float32 (zero-padded)

so local fields are one gather + weighted reduction — vectorizable, jittable,
shardable over the chains axis.

Update scheme: synchronous random-subset heat-bath. Each step draws an
independent Bernoulli(p_update) mask and resamples the masked sites from
their conditionals given the *current* neighbors. For p_update < 1 on sparse
graphs this is a close approximation to sequential Gibbs dynamics (adjacent
sites rarely co-update) and is the standard choice for annealed optimization
on SIMD hardware; for exact equilibrium sampling use the dense sampler or the
bipartite checkerboard kernel. Honest-metrics note: optimization results are
always reported as achieved objective values, never as samples from an
assumed equilibrium distribution.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def ell_from_edges(n: int, edges: np.ndarray, weights: np.ndarray,
                   k_max: int | None = None) -> Tuple[np.ndarray, np.ndarray]:
    """Build ELL arrays from an undirected edge list (E, 2) + weights (E,).

    Returns (neighbor_idx (N, K), neighbor_w (N, K)); K = max degree unless
    k_max is given (excess neighbors dropped by weight-magnitude rank).
    """
    adj = [[] for _ in range(n)]
    for (u, v), w in zip(np.asarray(edges), np.asarray(weights)):
        if u == v:
            continue
        adj[int(u)].append((int(v), float(w)))
        adj[int(v)].append((int(u), float(w)))
    deg = max((len(a) for a in adj), default=0)
    K = deg if k_max is None else min(deg, k_max)
    idx = np.full((n, K), n, dtype=np.int32)  # pad -> zero slot
    w = np.zeros((n, K), dtype=np.float32)
    for i, a in enumerate(adj):
        a = sorted(a, key=lambda t: -abs(t[1]))[:K]
        for k, (j, wj) in enumerate(a):
            idx[i, k] = j
            w[i, k] = wj
    return idx, w


@jax.jit
def ell_local_fields(state, neighbor_idx, neighbor_w, h):
    """(J s)_i + h_i with a padded gather; state (N,), returns (N,)."""
    padded = jnp.concatenate([state, jnp.zeros((1,), state.dtype)])
    nbr = padded[neighbor_idx]              # (N, K)
    return jnp.sum(neighbor_w * nbr, axis=1) + h


@jax.jit
def ell_energy(state, neighbor_idx, neighbor_w, h):
    """E(s) = -1/2 s^T J s - h^T s via local fields."""
    f = ell_local_fields(state, neighbor_idx, neighbor_w, jnp.zeros_like(h))
    return -0.5 * jnp.sum(state * f) - jnp.sum(h * state)


@partial(jax.jit, static_argnames=("n", "p_update"))
def _sparse_anneal_chunk(key, t0, schedule_chunk, s, best_s, best_e,
                         neighbor_idx, neighbor_w, h, *, n: int,
                         p_update: float):
    """n annealing steps on all chains at once. Per-step keys are
    fold_in(key, global_step), so the stream — and therefore a resumed
    run — is independent of how the schedule is chunked."""
    C, N = s.shape

    def body(carry, inp):
        s, best_s, best_e = carry
        t, T = inp
        k_mask, k_flip = jax.random.split(jax.random.fold_in(key, t))
        fields = jax.vmap(
            lambda ss: ell_local_fields(ss, neighbor_idx, neighbor_w, h))(s)
        p_up = jax.nn.sigmoid(2.0 * fields / T)
        u = jax.random.uniform(k_flip, (C, N))
        proposal = jnp.where(u < p_up, 1.0, -1.0)
        mask = jax.random.bernoulli(k_mask, p_update, (C, N))
        s = jnp.where(mask, proposal, s)
        e = jax.vmap(
            lambda ss: ell_energy(ss, neighbor_idx, neighbor_w, h))(s)
        better = e < best_e
        best_s = jnp.where(better[:, None], s, best_s)
        best_e = jnp.minimum(e, best_e)
        return (s, best_s, best_e), None

    (s, best_s, best_e), _ = jax.lax.scan(
        body, (s, best_s, best_e), (t0 + jnp.arange(n), schedule_chunk))
    return s, best_s, best_e


def sparse_anneal(
    key,
    neighbor_idx,
    neighbor_w,
    h,
    schedule,
    *,
    n_steps: int,
    n_chains: int = 8,
    p_update: float = 0.5,
    chunk_steps: int | None = None,
    checkpoint_path: str | None = None,
    resume: bool = False,
):
    """Anneal sparse Ising spins over a temperature schedule (n_steps,).

    Returns (best_state (N,), best_energy) over all chains/steps. Runs as
    chunked compiled scans over the whole chain batch (shardable over the
    chains mesh axis). ``checkpoint_path`` snapshots (states, bests, step)
    after every chunk (default 500 steps when checkpointing) and
    ``resume=True`` continues a killed anneal — bit-identical to the
    uninterrupted run because step keys are fold_in(key, global_step)
    (SURVEY §5.4 / r5 verdict #3: the 42 s 100k-node MAX-CUT anneal could
    not previously survive preemption).
    """
    N = neighbor_idx.shape[0]
    if chunk_steps is None:
        chunk_steps = n_steps if checkpoint_path is None \
            else max(1, min(n_steps, 500))
    k_init, k_run = jax.random.split(key)
    s = jnp.where(
        jax.random.bernoulli(k_init, 0.5, (n_chains, N)), 1.0, -1.0
    ).astype(jnp.float32)
    best_s = s
    best_e = jax.vmap(
        lambda ss: ell_energy(ss, neighbor_idx, neighbor_w, h))(s)
    done = 0

    if resume and checkpoint_path is not None:
        import os

        from tsu_tpu.checkpoint import restore_state

        ckpt_file = checkpoint_path if checkpoint_path.endswith(".npz") \
            else checkpoint_path + ".npz"
        if os.path.exists(ckpt_file) or os.path.exists(checkpoint_path):
            st = restore_state(checkpoint_path, {
                "s": s, "best_s": best_s, "best_e": best_e,
                "done": jnp.int32(0)})
            s = jnp.asarray(st["s"])
            best_s = jnp.asarray(st["best_s"])
            best_e = jnp.asarray(st["best_e"])
            done = int(st["done"])

    schedule = jnp.asarray(schedule, jnp.float32)
    while done < n_steps:
        n = min(chunk_steps, n_steps - done)
        s, best_s, best_e = _sparse_anneal_chunk(
            k_run, jnp.int32(done), schedule[done:done + n],
            s, best_s, best_e, neighbor_idx, neighbor_w, h,
            n=n, p_update=p_update)
        done += n
        if checkpoint_path is not None:
            from tsu_tpu.checkpoint import save_state

            save_state(checkpoint_path, {
                "s": s, "best_s": best_s, "best_e": best_e,
                "done": jnp.int32(done)})
    i = jnp.argmin(best_e)
    return best_s[i], best_e[i]


def maxcut_sparse(
    key,
    n: int,
    edges: np.ndarray,
    weights: np.ndarray,
    *,
    n_steps: int = 2000,
    n_chains: int = 8,
    T_initial: float = 3.0,
    T_final: float = 0.05,
    checkpoint_path: str | None = None,
    resume: bool = False,
) -> dict:
    """Anneal MAX-CUT on a sparse graph: J = -W (antiferromagnetic).

    Returns dict with spins, cut_value, energy. Scales to 100k+ nodes
    (memory O(N * K), not O(N^2)). ``checkpoint_path``/``resume`` snapshot
    and continue the anneal (see sparse_anneal).
    """
    idx, w = ell_from_edges(n, edges, weights)
    w_ising = -w  # cut maximization == antiferro Ising ground state
    h = np.zeros(n, np.float32)
    schedule = jnp.asarray(
        T_initial * (T_final / T_initial) ** (np.arange(n_steps) / max(n_steps - 1, 1)),
        dtype=jnp.float32,
    )
    best_s, best_e = sparse_anneal(
        key, jnp.asarray(idx), jnp.asarray(w_ising), jnp.asarray(h), schedule,
        n_steps=n_steps, n_chains=n_chains,
        checkpoint_path=checkpoint_path, resume=resume,
    )
    s = np.asarray(best_s)
    # cut = 1/4 sum_ij W_ij (1 - s_i s_j) over the full symmetric W.
    w_total = float(np.sum(weights))          # sum over undirected edges
    bond = float(
        ell_energy(best_s, jnp.asarray(idx), jnp.asarray(w), jnp.zeros(n))
    )                                          # bond = -1/2 s^T W s
    sWs = -2.0 * bond                          # full symmetric quadratic form
    cut = 0.5 * w_total - 0.25 * sWs
    return {
        "spins": s,
        "cut_value": float(cut),
        "energy": float(best_e),
        "n_steps": n_steps,
    }
