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

    def run_all(self, quick: bool = False, save_results: bool = True,
                resume: bool = False) -> dict:
        """Run every suite. ``resume=True`` skips suites already recorded in
        ``<output_dir>/benchmark_partial.json`` (written after each suite
        completes, removed on success) — a preempted multi-minute run
        restarts at the suite boundary instead of from scratch (SURVEY
        §5.4 / r5 verdict #3)."""
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

        partial_path = os.path.join(self.output_dir,
                                    "benchmark_partial.json")
        suites = {}
        resumed = False
        if resume and os.path.exists(partial_path):
            with open(partial_path) as f:
                part = json.load(f)
            if part.get("seed") == self.seed and part.get("quick") == quick:
                suites = part.get("suites", {})
                resumed = bool(suites)
                print(f"resuming past completed suites: {sorted(suites)}")
            else:
                print("partial file is from a different seed/mode; ignoring")

        suite_defs = [
            ("sampling", "sampling quality",
             lambda: [r.summary() for r in SamplingBenchmark(
                 seed=self.seed).run_all_benchmarks(quick)]),
            ("optimization", "optimization",
             lambda: [r.summary() for r in OptimizationBenchmark(
                 seed=self.seed).run_all_benchmarks(quick)]),
            ("ml", "ML / BNN calibration",
             lambda: [r.summary() for r in MLBenchmark(
                 seed=self.seed).run_all_benchmarks(quick)]),
            ("comparison", "method comparisons",
             lambda: [r.summary() for r in ComparisonBenchmark(
                 seed=self.seed).run_all_comparisons(quick)]),
        ]
        for i, (name, title, fn) in enumerate(suite_defs):
            if name in suites:
                continue
            print(f"\n[{i + 1}/{len(suite_defs)}] {title} ...")
            t_suite = time.perf_counter()
            suites[name] = fn()
            for row in suites[name]:
                print("  ", row)
            print(f"  [{name}: {time.perf_counter() - t_suite:.1f}s wall]")
            if save_results:
                os.makedirs(self.output_dir, exist_ok=True)
                with open(partial_path, "w") as f:
                    json.dump({"seed": self.seed, "quick": quick,
                               "suites": suites}, f, default=str)

        if save_results and os.path.exists(partial_path):
            os.remove(partial_path)

        self.all_results = {
            "topology": self._topology(),
            "seed": self.seed,
            "quick": quick,
            # A resumed run's wall covers only the suites it re-ran — it
            # is NOT the regression-tracked full wall (review r5).
            "total_time_s": round(time.perf_counter() - t_start, 2),
            "resumed_run": resumed,
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
    parser.add_argument("--resume", action="store_true",
                        help="skip suites recorded in benchmark_partial.json")
    args = parser.parse_args(argv)
    runner = BenchmarkRunner(seed=args.seed, output_dir=args.output_dir)
    runner.run_all(quick=args.quick, save_results=not args.no_save,
                   resume=args.resume)


if __name__ == "__main__":
    main()
