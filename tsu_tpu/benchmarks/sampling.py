"""Sampling-quality benchmarks (reference: tsu/benchmarks/sampling.py).

Tasks: uniform-binary, ferromagnetic Boltzmann chain, bimodal ferromagnet.
Metrics: exact KL divergence against the enumerated target (the reference's
'kl_divergences' field sometimes held energy proxies — quirk Q9; here every
field is what it says), Geyer ESS (quirk Q11 fixed), and throughput in
samples/s and bit-flips/s.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List

import numpy as np

from tsu_tpu.config import GibbsConfig
from tsu_tpu.ops.stats import (
    ess_multichain,
    kl_divergence_calibrated,
    kl_divergence_discrete,
    moment_zscores,
)
from tsu_tpu.oracle import exact_boltzmann_moments
from tsu_tpu.samplers.gibbs import GibbsSampler


@dataclass
class SamplingResult:
    """One sampling benchmark outcome (cf. tsu/benchmarks/sampling.py:21-75)."""

    name: str
    n_samples: int
    n_bits: int
    kl_divergence: float
    ess: float
    time_elapsed: float
    samples_per_second: float
    bit_flips_per_second: float
    extra: Dict = field(default_factory=dict)

    def summary(self) -> dict:
        return {
            "name": self.name,
            "n_samples": self.n_samples,
            "n_bits": self.n_bits,
            "kl_divergence": round(self.kl_divergence, 6),
            "ess": round(self.ess, 1),
            "time_s": round(self.time_elapsed, 4),
            "samples_per_s": round(self.samples_per_second, 1),
            "bit_flips_per_s": round(self.bit_flips_per_second, 1),
            **self.extra,
        }


def _state_histogram(samples: np.ndarray) -> np.ndarray:
    """Empirical distribution over all 2^n binary states (n small)."""
    n = samples.shape[1]
    idx = samples.astype(np.int64) @ (1 << np.arange(n, dtype=np.int64))
    return np.bincount(idx, minlength=1 << n) / samples.shape[0]


def _exact_distribution(J, h, temperature) -> np.ndarray:
    """Exact Boltzmann probabilities over all 2^n bit states."""
    import itertools

    n = J.shape[0]
    states = np.array(list(itertools.product([0.0, 1.0], repeat=n)))
    E = -0.5 * np.einsum("ki,ij,kj->k", states, J, states) - states @ h
    logw = -E / temperature
    logw -= logw.max()
    w = np.exp(logw)
    # bincount index convention: bit i has weight 2^i.
    idx = states.astype(np.int64) @ (1 << np.arange(n, dtype=np.int64))
    p = np.zeros(1 << n)
    p[idx.astype(int)] = w
    return p / p.sum()


class SamplingBenchmark:
    """Sampling benchmark suite (cf. tsu/benchmarks/sampling.py:78-428)."""

    def __init__(self, seed: int = 0, n_chains: int = 32):
        self.seed = seed
        self.n_chains = n_chains
        self.results: List[SamplingResult] = []

    def _run_case(self, name, J, h, n_samples, temperature=1.0,
                  n_burnin=100, n_sweeps=2,
                  update_order="sequential") -> SamplingResult:
        """``update_order`` defaults to "sequential" — the reference's own
        chain — which on these tiny (n<=10) latency-bound problems routes
        to the native C++ host path by the placement policy. Since r4 the
        native route is GATED to sequential/random orders (a "checkerboard"
        request must always get the colored-block chain — r3 advisor #1),
        so the benchmark asks for the order it wants measured explicitly
        instead of relying on silent substitution. All orders share the
        invariant distribution; the statistical gates are order-blind."""
        n = J.shape[0]
        sampler = GibbsSampler(
            GibbsConfig(temperature=temperature, n_burnin=n_burnin,
                        n_sweeps=n_sweeps, n_chains=self.n_chains,
                        update_order=update_order),
            seed=self.seed,
        )
        # Warm-up call with identical static shapes: compilation (and any
        # first-touch transfer cost) is excluded from the timed run, so
        # samples/s is steady-state throughput (r1 weakness: timings
        # conflated first-call compile with execution). Throughput is
        # best-of-3 with the median recorded alongside (the shared-host
        # environment shows sporadic ~25 ms scheduling spikes).
        t_w = time.perf_counter()
        sampler.sample_boltzmann(J, bias=h, n_samples=n_samples)
        warmup = time.perf_counter() - t_w
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            samples = sampler.sample_boltzmann(J, bias=h, n_samples=n_samples)
            times.append(time.perf_counter() - t0)
        elapsed = min(times)
        median_elapsed = sorted(times)[len(times) // 2]

        q_exact = _exact_distribution(J, h, temperature)
        counts = _state_histogram(samples) * samples.shape[0]
        kl = kl_divergence_calibrated(counts, q_exact, seed=self.seed)
        kl_plugin = kl_divergence_discrete(counts / samples.shape[0], q_exact)
        n_full = (n_samples // self.n_chains) * self.n_chains
        if n_full >= self.n_chains:
            chains = samples[:n_full].reshape(-1, self.n_chains, n).transpose(1, 0, 2)
        else:
            chains = samples[None]
        ess = ess_multichain(chains)
        # Decisive acceptance metric: site-mean errors vs enumeration in MC
        # standard-error units (no small-sample bias floor, unlike KL).
        zs = moment_zscores(samples, exact_boltzmann_moments(J, h, temperature)["mean"],
                            ess)
        result = SamplingResult(
            name=name,
            n_samples=n_samples,
            n_bits=n,
            kl_divergence=kl,
            ess=ess,
            time_elapsed=elapsed,
            samples_per_second=n_samples / elapsed,
            bit_flips_per_second=n_samples * n_sweeps * n / elapsed,
            extra={
                "kl_plugin": round(kl_plugin, 6),
                "max_abs_z": round(zs["max_abs_z"], 2),
                "mean_abs_z": round(zs["mean_abs_z"], 2),
                "max_z_null_p": round(zs["max_z_null_p"], 3),
                "warmup_time_s": round(warmup, 4),
                "median_time_s": round(median_elapsed, 4),
                "median_samples_per_s": round(n_samples / median_elapsed, 1),
            },
        )
        self.results.append(result)
        return result

    def benchmark_uniform_binary(self, n_samples: int = 10_000) -> SamplingResult:
        """dim=1 unbiased bit: target Bernoulli(1/2)
        (cf. tsu/benchmarks/sampling.py:98-163)."""
        J = np.zeros((1, 1), np.float32)
        h = np.zeros(1, np.float32)
        return self._run_case("uniform_binary", J, h, n_samples, n_sweeps=1,
                              n_burnin=10)

    def benchmark_boltzmann_chain(self, n_spins: int = 10,
                                  n_samples: int = 2_000) -> SamplingResult:
        """Ferromagnetic chain (cf. tsu/benchmarks/sampling.py:165-224)."""
        J = np.zeros((n_spins, n_spins), np.float32)
        for i in range(n_spins - 1):
            J[i, i + 1] = J[i + 1, i] = 1.0
        h = np.zeros(n_spins, np.float32)
        return self._run_case("boltzmann_chain", J, h, n_samples)

    def benchmark_ferromagnet_bimodal(self, n_spins: int = 10,
                                      n_samples: int = 20_000) -> SamplingResult:
        """Fully-connected ferromagnet: bimodal all-up/all-down
        (cf. tsu/benchmarks/sampling.py:226-312).

        Statistical margin (r3 verdict #6): this is the hardest row — the
        bimodal target autocorrelates the chains. 20k samples (vs 2k) cost
        ~100 ms at measured throughput, close the calibrated-vs-plugin KL
        gap (plugin 0.025, calibrated ~0), and were used to verify the
        sampler UNBIASED: site-mean errors shrink as 1/sqrt(n) across
        seeds while max_abs_z follows the max-of-10-sites null (expected
        ~1.5, >2.9 with ~8% probability — so max_abs_z alone is NOT a
        tight gate; the reported ``max_z_null_p`` states how surprising
        the observed max is, and the test-suite gate sits at 4.0 where the
        null tail is ~6e-4).
        """
        J = np.full((n_spins, n_spins), 0.35, np.float32)
        np.fill_diagonal(J, 0.0)
        h = np.full(n_spins, -0.35 * (n_spins - 1) / 2, np.float32)
        # Bias centers the bit model so both modes are equally likely
        # (equivalent to a zero-field spin ferromagnet).
        res = self._run_case("ferromagnet_bimodal", J, h, n_samples,
                             n_burnin=200, n_sweeps=3)
        return res

    def run_all_benchmarks(self, quick: bool = False) -> List[SamplingResult]:
        scale = 5 if quick else 1
        self.benchmark_uniform_binary(10_000 // scale)
        self.benchmark_boltzmann_chain(10, 2_000 // scale)
        # The bimodal row keeps a 20k/4k budget (not 2k/400): its z-gate
        # needs the larger sample to hold a real statistical margin, and
        # the extra samples cost only milliseconds (see docstring).
        self.benchmark_ferromagnet_bimodal(10, 20_000 // scale)
        return self.results
