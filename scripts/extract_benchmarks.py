#!/usr/bin/env python
"""Summarize benchmark outputs into BENCHMARK_SUMMARY.md and refresh the
README benchmark block (reference pattern: scripts/extract_benchmarks.py,
README markers).

Reads visual_output/benchmark_results.json (written by the runner) and, when
present, BENCH_r*.json files from driver rounds (headline spin-flips/s).
"""

from __future__ import annotations

import glob
import json
import os
import sys
from datetime import date

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MARK_START = "<!-- BENCHMARK_RESULTS_START -->"
MARK_END = "<!-- BENCHMARK_RESULTS_END -->"


def load_results():
    path = os.path.join(REPO, "visual_output", "benchmark_results.json")
    results = None
    if os.path.exists(path):
        with open(path) as f:
            results = json.load(f)
    headlines = []
    for p in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        try:
            with open(p) as f:
                headlines.append((os.path.basename(p), json.load(f)))
        except Exception:
            pass
    return results, headlines


def render(results, headlines) -> str:
    lines = [f"# Benchmark summary ({date.today().isoformat()})", ""]
    if headlines:
        lines += ["## Headline (driver rounds, real TPU)", ""]
        lines += ["| round | metric | value | vs reference |", "|---|---|---|---|"]
        for name, h in headlines:
            lines.append(
                f"| {name} | {h.get('metric')} | {h.get('value'):.3e} "
                f"{h.get('unit','')} | {h.get('vs_baseline', 0):.0f}x |"
            )
        lines.append("")
    if results:
        topo = results.get("topology", {})
        lines += [
            f"## Suite results ({topo.get('backend')}, "
            f"{topo.get('n_devices')} device(s), seed {results.get('seed')})",
            "",
        ]
        for suite, rows in results.get("suites", {}).items():
            lines.append(f"### {suite}")
            if rows:
                keys = list(dict.fromkeys(k for row in rows for k in row))
                lines.append("| " + " | ".join(keys) + " |")
                lines.append("|" + "---|" * len(keys))
                for row in rows:
                    lines.append(
                        "| " + " | ".join(str(row.get(k, "")) for k in keys) + " |"
                    )
            lines.append("")
    return "\n".join(lines)


def update_readme(summary: str):
    readme = os.path.join(REPO, "README.md")
    with open(readme) as f:
        text = f.read()
    block = f"{MARK_START}\n\n{summary}\n{MARK_END}"
    if MARK_START in text and MARK_END in text:
        pre = text.split(MARK_START)[0]
        post = text.split(MARK_END)[1]
        text = pre + block + post
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    with open(readme, "w") as f:
        f.write(text)


def main():
    results, headlines = load_results()
    if results is None and not headlines:
        print("no benchmark outputs found; run the benchmark runner first")
        return 1
    summary = render(results, headlines)
    out = os.path.join(REPO, "BENCHMARK_SUMMARY.md")
    with open(out, "w") as f:
        f.write(summary + "\n")
    update_readme(summary)
    print(f"wrote {out} and updated README markers")
    return 0


if __name__ == "__main__":
    sys.exit(main())
