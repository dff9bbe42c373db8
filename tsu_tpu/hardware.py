"""Hardware performance models: TPU roofline + fictional-TSU projections.

The reference projects performance of a fictional thermodynamic chip
(tsu/hardware.py:16-199, tsu/gibbs.py:396-487). This build runs on *real*
parallel hardware, so the roles invert (SURVEY.md §2 rows 15-16):

* ``TPUHardwareSpec`` / ``roofline`` — speed-of-light analysis for the actual
  chip: is the checkerboard kernel HBM-bound, and how close is measured
  throughput to the bandwidth bound? Used by bench.py to report efficiency.
* ``TSUHardwareSpec`` / ``HardwarePerformanceEstimator`` / ``HardwareEmulator``
  — API-parity projection models so reference users keep their workflows;
  `HardwareEmulator.sample_parallel` now runs chains genuinely in parallel
  (vmapped) instead of a sequential Python loop (tsu/gibbs.py:475-479).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


# -- real-chip roofline ------------------------------------------------------


@dataclass(frozen=True)
class TPUHardwareSpec:
    """Per-chip specs used for speed-of-light estimates.

    Defaults approximate a TPU v5e: ~819 GB/s HBM bandwidth, ~197 bf16
    TFLOP/s MXU, vector unit throughput in the low TOP/s. Override per
    deployment; only ratios matter for bound analysis.
    """

    name: str = "tpu-v5e"
    hbm_bandwidth_gbps: float = 819.0
    mxu_bf16_tflops: float = 197.0
    vpu_gops: float = 3_900.0       # elementwise f32 ops/s (approx)
    vmem_bytes: int = 128 * 2**20
    ici_bandwidth_gbps: float = 400.0  # per-link bidirectional


def checkerboard_roofline(
    spec: TPUHardwareSpec,
    rows: int,
    cols: int,
    dtype_bytes: int = 4,
    ops_per_site: float = 24.0,
) -> dict:
    """Speed-of-light spin-flips/s for the checkerboard kernel on one chip.

    Per full sweep the kernel reads each color plane once (as neighbors) and
    writes each once: 2 * N * dtype_bytes bytes moved per sweep of N sites.
    The compute bound counts VPU ops per site (neighbor adds, threshold
    table, PRNG, select).

    CALIBRATED against the r4 device trace (docs/BENCHMARKS.md): at bf16
    (dtype_bytes=2) this model says compute-bound with a 1.6e11 ceiling at
    the default 24 ops/site; the fused kernel measures 1.37e11 intrinsic =
    ~85% of that bound, and the variant decomposition confirms the binding
    side is the VPU (PRNG+select+write floor 1.9e11), not HBM.
    """
    n_sites = rows * cols
    bytes_per_sweep = 2 * n_sites * dtype_bytes
    t_mem = bytes_per_sweep / (spec.hbm_bandwidth_gbps * 1e9)
    t_compute = n_sites * ops_per_site / (spec.vpu_gops * 1e9)
    t_sweep = max(t_mem, t_compute)
    return {
        "sites": n_sites,
        "bytes_per_sweep": bytes_per_sweep,
        "t_mem_s": t_mem,
        "t_compute_s": t_compute,
        "bound": "memory" if t_mem >= t_compute else "compute",
        "flips_per_s_ceiling": n_sites / t_sweep,
        "sweeps_per_s_ceiling": 1.0 / t_sweep,
    }


# -- parity: fictional-TSU projections (tsu/hardware.py) ---------------------


@dataclass
class TSUHardwareSpec:
    """Projected thermodynamic-chip specs (cf. tsu/hardware.py:16-36)."""

    thermal_relaxation_time: float = 1e-9
    circuit_response_time: float = 1e-10
    parallel_units: int = 1000
    dimensions_per_unit: int = 1
    equilibration_steps: int = 100
    samples_per_equilibration: int = 10
    energy_per_sample: float = 1e-15


class HardwarePerformanceEstimator:
    """Physics-based timing projections (cf. tsu/hardware.py:39-147)."""

    def __init__(self, spec: Optional[TSUHardwareSpec] = None):
        self.spec = spec or TSUHardwareSpec()

    def estimate_sampling_time(
        self, n_samples: int, dimension: int, emulator_time: float
    ) -> dict:
        s = self.spec
        time_per_sample = (
            s.equilibration_steps * s.thermal_relaxation_time + s.circuit_response_time
        )
        sequential_time = n_samples * time_per_sample
        effective_parallel = min(s.parallel_units, max(n_samples, 1))
        parallel_batches = int(np.ceil(n_samples / effective_parallel))
        parallel_time = parallel_batches * time_per_sample
        return {
            "emulator_time_s": emulator_time,
            "hardware_sequential_s": sequential_time,
            "hardware_parallel_s": parallel_time,
            "naive_speedup": emulator_time / sequential_time if sequential_time else 0.0,
            "realistic_speedup": emulator_time / parallel_time if parallel_time else 0.0,
            "parallel_units_used": effective_parallel,
            "energy_joules": n_samples * s.energy_per_sample,
            "energy_comparison": self._compare_energy_to_gpu(n_samples, dimension),
        }

    def _compare_energy_to_gpu(self, n_samples: int, dimension: int) -> dict:
        # ~300 W accelerator drawing for the emulator-equivalent run time.
        gpu_power_w = 300.0
        gpu_time_estimate = n_samples * dimension * 1e-7
        gpu_energy = gpu_power_w * gpu_time_estimate
        tsu_energy = n_samples * self.spec.energy_per_sample
        return {
            "gpu_energy_joules": gpu_energy,
            "tsu_energy_joules": tsu_energy,
            "energy_advantage": gpu_energy / tsu_energy if tsu_energy else float("inf"),
        }


class ConservativeEstimator(HardwarePerformanceEstimator):
    """10x-derated projection (cf. tsu/hardware.py:149-174)."""

    def __init__(self):
        super().__init__(
            TSUHardwareSpec(
                thermal_relaxation_time=1e-8,
                parallel_units=100,
                equilibration_steps=1000,
                energy_per_sample=1e-13,
            )
        )


class HardwareEmulator:
    """Chip-level emulator interface (cf. tsu/gibbs.py:396-487).

    ``sample_parallel`` runs its chains as a real vmapped batch on the
    accelerator — the thing the reference's sequential loop simulates.
    """

    def __init__(
        self, n_bits: int = 100, clock_speed_ghz: float = 1.0,
        parallel_chains: int = 1000,
    ):
        self.n_bits = n_bits
        self.clock_speed_ghz = clock_speed_ghz
        self.parallel_chains = parallel_chains
        self.ns_per_cycle = 1.0 / clock_speed_ghz

    def estimate_hardware_time(self, n_samples: int, n_sweeps_per_sample: int) -> dict:
        time_per_sweep_ns = self.n_bits * self.ns_per_cycle
        time_per_sample_ns = n_sweeps_per_sample * time_per_sweep_ns
        batches_needed = int(np.ceil(n_samples / self.parallel_chains))
        total_time_ns = batches_needed * time_per_sample_ns
        return {
            "time_per_sweep_ns": time_per_sweep_ns,
            "time_per_sample_ns": time_per_sample_ns,
            "batches_needed": batches_needed,
            "total_time_ns": total_time_ns,
            "total_time_us": total_time_ns / 1e3,
            "total_time_ms": total_time_ns / 1e6,
            "total_time_s": total_time_ns / 1e9,
            "speedup_vs_classical": None,
        }

    def sample_parallel(
        self, coupling: np.ndarray, n_samples: int, temperature: float = 1.0
    ) -> Tuple[np.ndarray, dict]:
        """Sample with genuinely parallel chains; returns (samples, timing)."""
        from tsu_tpu.config import GibbsConfig
        from tsu_tpu.samplers.gibbs import GibbsSampler

        n_chains = min(self.parallel_chains, n_samples, 1024)
        config = GibbsConfig(temperature=temperature, n_chains=n_chains,
                             update_order="checkerboard")
        sampler = GibbsSampler(config)
        samples = sampler.sample_boltzmann(coupling, n_samples=n_samples)
        timing = self.estimate_hardware_time(n_samples, config.n_sweeps)
        return samples, timing
