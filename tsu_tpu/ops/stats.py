"""Sampling diagnostics: autocorrelation, effective sample size, moments.

The reference's ESS estimator truncates at the first |rho| < 0.05 and ignores
negative-lag pairing, routinely returning ESS = N (quirk Q11,
tsu/benchmarks/sampling.py:314-351). This module implements the standard
Geyer initial-positive-sequence estimator instead, FFT-based and jittable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def autocorrelation(x: np.ndarray, max_lag: int | None = None) -> np.ndarray:
    """Normalized autocorrelation function of a 1-D chain via FFT."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    if max_lag is None:
        max_lag = n - 1
    x = x - x.mean()
    # FFT autocorrelation with zero padding to avoid circular wrap.
    m = 1 << (2 * n - 1).bit_length()
    f = np.fft.rfft(x, m)
    acf = np.fft.irfft(f * np.conj(f), m)[: n]
    if acf[0] == 0:
        return np.zeros(min(max_lag + 1, n))
    acf /= acf[0]
    return acf[: max_lag + 1]


def effective_sample_size(x: np.ndarray) -> float:
    """Geyer initial-positive-sequence ESS for a 1-D chain.

    ESS = N / (1 + 2 * sum_k rho_k) where the sum runs over pairs
    Gamma_m = rho_{2m} + rho_{2m+1} truncated at the first negative pair.
    """
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    if n < 4 or np.std(x) == 0:
        return float(n)
    rho = autocorrelation(x)
    # Pair consecutive lags starting at lag 1: (1,2), (3,4), ...
    pair_sum = 0.0
    m = 1
    while m + 1 < n:
        gamma = rho[m] + rho[m + 1]
        if gamma < 0:
            break
        pair_sum += gamma
        m += 2
    ess = n / (1.0 + 2.0 * pair_sum)
    return float(np.clip(ess, 1.0, n))


def ess_multichain(samples: np.ndarray) -> float:
    """Mean per-dimension ESS over a (n_samples, dim) array, summed over chains
    if a leading chain axis is present ((chains, n_samples, dim))."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        return effective_sample_size(samples)
    if samples.ndim == 2:
        return float(np.mean([effective_sample_size(samples[:, d]) for d in range(samples.shape[1])]))
    return float(
        sum(ess_multichain(samples[c]) for c in range(samples.shape[0]))
    )


def kl_divergence_discrete(p: np.ndarray, q: np.ndarray, eps: float = 1e-12) -> float:
    """KL(p || q) for discrete distributions (benchmark metric)."""
    p = np.asarray(p, dtype=np.float64) + eps
    q = np.asarray(q, dtype=np.float64) + eps
    p /= p.sum()
    q /= q.sum()
    return float(np.sum(p * np.log(p / q)))


@jax.jit
def running_moments(x: jax.Array):
    """On-device mean/std over the leading axis (batched moment reduction)."""
    mean = jnp.mean(x, axis=0)
    std = jnp.std(x, axis=0)
    return mean, std
