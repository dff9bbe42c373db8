"""Benchmark suite: sampling quality, optimization, ML calibration, and
framework comparisons (reference structure: tsu/benchmarks/, with honest
metric names — quirk Q9 — and real optimizers in every problem — quirks Q6/Q7).
"""

from tsu_tpu.benchmarks.sampling import SamplingBenchmark
from tsu_tpu.benchmarks.optimization import OptimizationBenchmark
from tsu_tpu.benchmarks.ml import MLBenchmark
from tsu_tpu.benchmarks.comparison import ComparisonBenchmark
from tsu_tpu.benchmarks.runner import BenchmarkRunner

__all__ = [
    "SamplingBenchmark",
    "OptimizationBenchmark",
    "MLBenchmark",
    "ComparisonBenchmark",
    "BenchmarkRunner",
]
