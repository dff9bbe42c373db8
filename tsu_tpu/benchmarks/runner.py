"""Benchmark orchestrator (reference: tsu/benchmarks/runner.py:17-215).

Runs the four suites, prints a summary, writes JSON + text reports, and
records the device topology of the run (chip / host / pod — SURVEY.md §2 #23).

CLI: python -m tsu_tpu.benchmarks.runner [--quick] [--seed N]
     [--output-dir DIR] [--no-save]
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import time
from typing import Optional

import jax


class BenchmarkRunner:
    """Run all benchmark suites and persist results."""

    def __init__(self, seed: int = 0, output_dir: str = "visual_output"):
        self.seed = seed
        self.output_dir = output_dir
        self.all_results = {}

    def _topology(self) -> dict:
        devices = jax.devices()
        return {
            "backend": jax.default_backend(),
            "n_devices": len(devices),
            "device_kind": devices[0].device_kind if devices else "none",
            "n_hosts": jax.process_count(),
            "python": platform.python_version(),
            "jax": jax.__version__,
        }

    def run_all(self, quick: bool = False, save_results: bool = True) -> dict:
        from tsu_tpu.profiling import enable_compilation_cache

        enable_compilation_cache()
        from tsu_tpu.benchmarks.comparison import ComparisonBenchmark
        from tsu_tpu.benchmarks.ml import MLBenchmark
        from tsu_tpu.benchmarks.optimization import OptimizationBenchmark
        from tsu_tpu.benchmarks.sampling import SamplingBenchmark

        t_start = time.perf_counter()
        print(f"tsu_tpu benchmark suite ({'quick' if quick else 'full'} mode)")
        print(f"topology: {self._topology()}")
        print("=" * 64)

        suites = {}

        print("\n[1/4] sampling quality ...")
        sb = SamplingBenchmark(seed=self.seed)
        suites["sampling"] = [r.summary() for r in sb.run_all_benchmarks(quick)]
        for row in suites["sampling"]:
            print("  ", row)

        print("\n[2/4] optimization ...")
        ob = OptimizationBenchmark(seed=self.seed)
        suites["optimization"] = [r.summary() for r in ob.run_all_benchmarks(quick)]
        for row in suites["optimization"]:
            print("  ", row)

        print("\n[3/4] ML / BNN calibration ...")
        mb = MLBenchmark(seed=self.seed)
        suites["ml"] = [r.summary() for r in mb.run_all_benchmarks(quick)]
        for row in suites["ml"]:
            print("  ", row)

        print("\n[4/4] method comparisons ...")
        cb = ComparisonBenchmark(seed=self.seed)
        suites["comparison"] = [r.summary() for r in cb.run_all_comparisons(quick)]
        for row in suites["comparison"]:
            print("  ", row)

        self.all_results = {
            "topology": self._topology(),
            "seed": self.seed,
            "quick": quick,
            "total_time_s": round(time.perf_counter() - t_start, 2),
            "suites": suites,
        }
        print("\n" + "=" * 64)
        print(f"total: {self.all_results['total_time_s']:.1f}s")

        if save_results:
            self._save_results()
        return self.all_results

    def _save_results(self):
        os.makedirs(self.output_dir, exist_ok=True)
        json_path = os.path.join(self.output_dir, "benchmark_results.json")
        with open(json_path, "w") as f:
            json.dump(self.all_results, f, indent=2, default=str)
        txt_path = os.path.join(self.output_dir, "benchmark_report.txt")
        with open(txt_path, "w") as f:
            f.write("tsu_tpu benchmark report\n")
            f.write(f"topology: {self.all_results['topology']}\n\n")
            for suite, rows in self.all_results["suites"].items():
                f.write(f"## {suite}\n")
                for row in rows:
                    f.write(f"  {row}\n")
                f.write("\n")
        print(f"saved: {json_path}, {txt_path}")


def main(argv: Optional[list] = None):
    parser = argparse.ArgumentParser(description="tsu_tpu benchmark runner")
    parser.add_argument("--quick", action="store_true", help="reduced sizes")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output-dir", default="visual_output")
    parser.add_argument("--no-save", action="store_true")
    args = parser.parse_args(argv)
    runner = BenchmarkRunner(seed=args.seed, output_dir=args.output_dir)
    runner.run_all(quick=args.quick, save_results=not args.no_save)


if __name__ == "__main__":
    main()
