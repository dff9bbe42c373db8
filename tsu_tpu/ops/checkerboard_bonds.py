"""Checkerboard Gibbs sweeps with per-bond (disordered) couplings.

r1 gap #4: the stencil engine was uniform-J only, so spin glasses / random-
bond lattices (Edwards-Anderson models) above the 4,096-spin dense cap were
inexpressible (the reference's always-dense ``set_coupling``,
tsu/models/ising.py:77-86,343-361, handles them only at toy sizes).

Representation: two bond planes over the (R, C) lattice —

    Jh[r, c] = coupling between sites (r, c) and (r, c+1)   (wraps at c=C-1)
    Jv[r, c] = coupling between sites (r, c) and (r+1, c)   (wraps at r=R-1)

plus an optional per-site field (scalar or (R, C)). Memory is O(3N): a
4096^2 random-bond lattice is ~200 MB of bonds + 64 MB of spins, vs the
dense representation's 2.3e14 coupling entries.

The update is the same two-color heat-bath sweep as the uniform engine
(tsu_tpu/ops/checkerboard.py), but the local field is a *weighted* neighbor
sum: per color, four weight planes (w_up/w_down/w_left/w_right in the
compact (R, C/2) layout) are gathered once from (Jh, Jv); open boundaries
are realized by zeroing the corresponding weights, so the sweep body has no
edge masking at all. All-equal bond planes reproduce the uniform engine
exactly (validated in tests), and small random-bond lattices are validated
against dense enumeration moments.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from tsu_tpu.ops.checkerboard import merge_checkerboard, split_checkerboard


def _color_site_cols(R: int, C: int, color: int):
    """Global column index of compact (row, j) for color 0=red / 1=black."""
    r = jnp.arange(R)[:, None]
    j = jnp.arange(C // 2)[None, :]
    return jnp.broadcast_to(r, (R, C // 2)), 2 * j + ((r + color) % 2)


def color_bond_weights(Jh, Jv, field=0.0, periodic: bool = True):
    """Per-color weight planes for the weighted checkerboard update.

    Returns a pytree ``{"red": (w_up, w_down, w_left, w_right, f), "black":
    (...)}`` with every plane of shape (R, C/2). Open boundaries zero the
    out-of-lattice weights.
    """
    Jh = jnp.asarray(Jh, jnp.float32)
    Jv = jnp.asarray(Jv, jnp.float32)
    R, C = Jh.shape
    field = jnp.broadcast_to(jnp.asarray(field, jnp.float32), (R, C))
    out = {}
    for name, color in (("red", 0), ("black", 1)):
        r, c = _color_site_cols(R, C, color)
        w_up = Jv[(r - 1) % R, c]
        w_down = Jv[r, c]
        w_left = Jh[r, (c - 1) % C]
        w_right = Jh[r, c]
        if not periodic:
            w_up = jnp.where(r == 0, 0.0, w_up)
            w_down = jnp.where(r == R - 1, 0.0, w_down)
            w_left = jnp.where(c == 0, 0.0, w_left)
            w_right = jnp.where(c == C - 1, 0.0, w_right)
        out[name] = (w_up, w_down, w_left, w_right, field[r, c])
    return out


def pack_bond_codes(weights):
    """Pack the discrete-path weight planes into ONE bf16 code plane per
    color: bits (2i, 2i+1) of the code hold w_i + 1 for (up, down, left,
    right), values 0..170 — exact in bf16 (8 mantissa bits cover integers
    to 256). The +-J kernel path is HBM-bound at 4 weight planes + field
    (~14 B/site/sweep measured at the roofline); a single 2-byte code
    drops it to ~6 B/site, which moves the bound past the kernel's VPU
    ceiling. Requires the discrete contract: every weight in {-1, 0, +1}
    and zero field (discrete_table_applicable).
    """
    out = {}
    for color, (wu, wd, wl, wr, f) in weights.items():
        code = ((wu + 1.0) + (wd + 1.0) * 4.0 + (wl + 1.0) * 16.0
                + (wr + 1.0) * 64.0)
        out[color] = jnp.asarray(code, jnp.bfloat16)
    return out


def _neighbor_values(other, up_row, down_row, update_red):
    """The four neighbor-value planes (up, down, left, right) of one color,
    in compact layout (cf. neighbor_sum_half_halo, which returns their sum).
    Horizontal wrap is realized by the rolls; open boundaries are handled by
    the zeroed *weights*, so no value masking is needed here."""
    R = other.shape[-2]
    row_is_even = (jnp.arange(R) % 2 == 0)[:, None]

    up = jnp.concatenate([up_row, other[..., :-1, :]], axis=-2)
    down = jnp.concatenate([other[..., 1:, :], down_row], axis=-2)
    left_shift = jnp.roll(other, 1, axis=-1)
    right_shift = jnp.roll(other, -1, axis=-1)
    pick = row_is_even if update_red else ~row_is_even
    left = jnp.where(pick, left_shift, other)
    right = jnp.where(pick, other, right_shift)
    return up, down, left, right


def halfstep_bonds(key, other, weights, update_red, temperature,
                   periodic: bool):
    """Heat-bath resample of one color with per-bond weights (single device)."""
    if periodic:
        up_row, down_row = other[..., -1:, :], other[..., :1, :]
    else:
        z = jnp.zeros_like(other[..., :1, :])
        up_row, down_row = z, z
    w_up, w_down, w_left, w_right, f = weights
    up, down, left, right = _neighbor_values(other, up_row, down_row, update_red)
    local = w_up * up + w_down * down + w_left * left + w_right * right + f
    p_up = jax.nn.sigmoid(2.0 * local / temperature)
    u = jax.random.uniform(key, other.shape)
    return jnp.where(u < p_up, 1.0, -1.0).astype(other.dtype)


@partial(jax.jit, static_argnames=("n_sweeps", "periodic"))
def checkerboard_sweeps_bonds(
    key, red, black, weights, temperature, n_sweeps: int, *,
    periodic: bool = True,
):
    """n_sweeps full red/black sweeps with per-bond couplings."""

    def body(carry, k):
        red, black = carry
        k_r, k_b = jax.random.split(k)
        red = halfstep_bonds(k_r, black, weights["red"], True, temperature,
                             periodic)
        black = halfstep_bonds(k_b, red, weights["black"], False, temperature,
                               periodic)
        return (red, black), None

    (red, black), _ = jax.lax.scan(body, (red, black),
                                   jax.random.split(key, n_sweeps))
    return red, black


@partial(jax.jit, static_argnames=("periodic",))
def lattice_energy_bonds(lattice, Jh, Jv, field=0.0, *, periodic: bool = True):
    """E = -sum_b J_b s_i s_j - sum_i h_i s_i over (..., R, C) lattices."""
    s = lattice
    eh = Jh * s * jnp.roll(s, -1, -1)
    ev = Jv * s * jnp.roll(s, -1, -2)
    if not periodic:
        eh = eh[..., :, :-1].sum((-2, -1))
        ev = ev[..., :-1, :].sum((-2, -1))
    else:
        eh = eh.sum((-2, -1))
        ev = ev.sum((-2, -1))
    return -(eh + ev) - jnp.sum(field * s, axis=(-2, -1))


@partial(jax.jit, static_argnames=("periodic",))
def lattice_energy_bonds_planes(red, black, weights, *,
                                periodic: bool = True):
    """Per-replica energy straight from compact (..., R, C/2) color planes.

    Every bond of the checkerboard graph joins a red and a black site, so
    the pair energy is exactly -sum_red s_i * (weighted black neighbors)
    with each bond counted once; the field term sums both colors. Equal to
    lattice_energy_bonds(merge_checkerboard(red, black), ...) (validated in
    tests) without the merge or a dtype round-trip — the hot PT loop calls
    this every iteration on bf16 planes (+-J weights and +-1 spins make the
    bf16 neighbor arithmetic exact; the site sum accumulates in f32).
    """
    w_up, w_down, w_left, w_right, f_r = weights["red"]
    if periodic:
        up_row, down_row = black[..., -1:, :], black[..., :1, :]
    else:
        z = jnp.zeros_like(black[..., :1, :])
        up_row, down_row = z, z
    up, down, left, right = _neighbor_values(black, up_row, down_row, True)
    local = (w_up * up + w_down * down + w_left * left + w_right * right)
    e_pairs = -jnp.sum(red.astype(jnp.float32) * local.astype(jnp.float32),
                       axis=(-2, -1))
    f_b = weights["black"][4]
    e_field = -(
        jnp.sum(jnp.asarray(f_r, jnp.float32)
                * red.astype(jnp.float32), axis=(-2, -1))
        + jnp.sum(jnp.asarray(f_b, jnp.float32)
                  * black.astype(jnp.float32), axis=(-2, -1))
    )
    return e_pairs + e_field


@partial(
    jax.jit,
    static_argnames=("n_samples", "n_burnin", "n_sweeps", "periodic",
                     "collect", "use_pallas"),
)
def sample_lattice_bonds(
    key,
    lattice0,
    Jh,
    Jv,
    *,
    n_samples: int,
    temperature,
    field=0.0,
    n_burnin: int = 100,
    n_sweeps: int = 1,
    periodic: bool = True,
    collect: str = "states",
    use_pallas: bool = False,
):
    """Boltzmann-sample a random-bond 2-D lattice (cf. sample_lattice).

    collect="states" returns (n_samples, R, C); "observables" returns
    per-sample magnetization/energy scalars only (large lattices).
    ``use_pallas`` routes sweeps through the fused TPU bond kernel
    (checkerboard_bonds_pallas — in-kernel PRNG, one HBM pass per color).
    """
    weights = color_bond_weights(Jh, Jv, field, periodic)
    red, black = split_checkerboard(lattice0)
    k_burn, k_main = jax.random.split(key)

    if use_pallas:
        from tsu_tpu.ops.checkerboard_bonds_pallas import (
            checkerboard_sweeps_bonds_pallas,
        )

        def sweeps(k, red, black, n):
            seed = jax.random.randint(k, (), 0, 2**31 - 1, jnp.int32)
            return checkerboard_sweeps_bonds_pallas(
                seed, red, black, weights, temperature, n, periodic=periodic
            )
    else:
        def sweeps(k, red, black, n):
            return checkerboard_sweeps_bonds(
                k, red, black, weights, temperature, n, periodic=periodic
            )

    red, black = sweeps(k_burn, red, black, max(n_burnin, 1)) \
        if n_burnin else (red, black)

    R, C = lattice0.shape
    n_sites = R * C

    def step(carry, k):
        red, black = carry
        red, black = sweeps(k, red, black, n_sweeps)
        lat = merge_checkerboard(red, black)
        if collect == "states":
            return (red, black), lat
        m = jnp.sum(lat) / n_sites
        e = lattice_energy_bonds(lat, Jh, Jv, field, periodic=periodic)
        return (red, black), (m, e)

    (red, black), out = jax.lax.scan(
        step, (red, black), jax.random.split(k_main, n_samples)
    )
    if collect == "states":
        return out
    m, e = out
    return {"magnetization": m, "energy": e}


@partial(jax.jit, static_argnames=("n_steps", "periodic"))
def anneal_lattice_bonds(
    key, lattice0, Jh, Jv, *, T_initial=5.0, T_final=0.05,
    n_steps: int = 1000, field=0.0, periodic: bool = True,
):
    """Simulated annealing on a random-bond lattice; returns (best, best_E).

    One sweep per temperature step (geometric schedule), tracking the
    best-energy configuration on device (spin-glass ground-state search).
    """
    weights = color_bond_weights(Jh, Jv, field, periodic)
    schedule = jnp.geomspace(T_initial, T_final, n_steps)
    red, black = split_checkerboard(lattice0)
    e0 = lattice_energy_bonds(lattice0, Jh, Jv, field, periodic=periodic)

    def body(carry, inp):
        red, black, best_r, best_b, best_e = carry
        T, k = inp
        k_r, k_b = jax.random.split(k)
        red = halfstep_bonds(k_r, black, weights["red"], True, T, periodic)
        black = halfstep_bonds(k_b, red, weights["black"], False, T, periodic)
        e = lattice_energy_bonds(merge_checkerboard(red, black), Jh, Jv,
                                 field, periodic=periodic)
        better = e < best_e
        best_r = jnp.where(better, red, best_r)
        best_b = jnp.where(better, black, best_b)
        best_e = jnp.minimum(e, best_e)
        return (red, black, best_r, best_b, best_e), None

    (red, black, best_r, best_b, best_e), _ = jax.lax.scan(
        body, (red, black, red, black, e0),
        (schedule, jax.random.split(key, n_steps)),
    )
    return merge_checkerboard(best_r, best_b), best_e


def dense_from_bonds(Jh, Jv, periodic: bool = True):
    """Dense (N, N) coupling matrix from bond planes (oracle/validation)."""
    import numpy as np

    Jh = np.asarray(Jh)
    Jv = np.asarray(Jv)
    R, C = Jh.shape
    n = R * C
    J = np.zeros((n, n), dtype=np.float64)
    for r in range(R):
        for c in range(C):
            i = r * C + c
            if c + 1 < C or periodic:
                j = r * C + (c + 1) % C
                J[i, j] += Jh[r, c]
                J[j, i] += Jh[r, c]
            if r + 1 < R or periodic:
                j = ((r + 1) % R) * C + c
                J[i, j] += Jv[r, c]
                J[j, i] += Jv[r, c]
    return J
