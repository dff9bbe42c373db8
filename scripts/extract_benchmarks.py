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


def _load_json(path):
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return None


def load_results():
    results = _load_json(os.path.join(REPO, "visual_output",
                                      "benchmark_results.json"))
    headlines = []
    for p in sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json"))):
        h = _load_json(p)
        if h and "metric" not in h:
            h = h.get("parsed")  # driver wrapper schema: {n, cmd, rc, parsed}
        if h and h.get("value") is not None:
            headlines.append((os.path.basename(p), h))
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
    kb = _load_json(os.path.join(REPO, "visual_output", "kernel_bench.json"))
    if kb:
        lines += [f"## Kernel rows (bench.py, backend: {kb.get('backend')})",
                  ""]
        lines += ["| kernel | flips/s |", "|---|---|"]
        for k, v in kb.items():
            if isinstance(v, float):
                lines.append(f"| {k} ({kb.get('size')}^2) | {v:.3e} |")
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
    q = _load_json(os.path.join(REPO, "visual_output", "quick",
                                "benchmark_results.json"))
    if q:
        flag = (" — RESUMED run, wall covers only re-run suites; "
                "not a full-wall measurement"
                if q.get("resumed_run") else "")
        lines += [
            "### quick-mode wall (regression-tracked, r5 target <= 60 s "
            "warm)", "",
            f"- total_time_s: {q.get('total_time_s')} "
            f"(backend {q.get('topology', {}).get('backend')}, "
            f"seed {q.get('seed')}){flag}", "",
        ]
    for sc in sorted(glob.glob(os.path.join(REPO, "visual_output",
                                            "scaling_*.json"))):
        d = _load_json(sc)
        if not d:
            continue
        lines += [f"### scaling ({os.path.basename(sc)})", ""]
        for row in ("chains", "bnn_dp", "lattice"):
            r = d.get(row)
            if r is None:
                continue
            lines.append(
                f"- {row}: efficiency={r.get('efficiency')} "
                f"(ideal: {r.get('ideal', 'n/a')})"
            )
        lines.append("")
    ce = _load_json(os.path.join(REPO, "visual_output", "critical_ess.json"))
    if ce:
        lines += ["### statistical efficiency at criticality "
                  "(critical_ess.json)", ""]
        for r in ce.get("rows", []):
            lines.append(
                f"- {r['label']}: tau_int(|M|)={r['tau_int_M_sweeps']} "
                f"sweeps, ESS(|M|)/s={r['ess_M_per_s']}")
        fit = ce.get("fit_Tc", {})
        proj = ce.get("projection_4096_Tc", {})
        if fit:
            lines.append(f"- fit: tau = {fit.get('A')} * L^{fit.get('z')}")
        if proj:
            secs = proj.get(
                "seconds_per_independent_M_sample_at_kernel_rate",
                [proj.get("seconds_per_independent_M_sample")])
            lines.append(
                f"- 4096^2 @ T_c projected: tau_int(|M|) ~ "
                f"{proj.get('tau_int_M_sweeps_projected_fit', proj.get('tau_int_M_sweeps_projected')):.3g}"
                f"-{proj.get('tau_int_M_sweeps_projected_z2.17', 0):.3g} "
                f"sweeps; {secs} s per independent |M| sample at the "
                f"headline kernel rate")
        for w in ce.get("wolff_Tc", []):
            lines.append(
                f"- wolff L={w['L']}: tau_int(|M|)="
                f"{w['tau_int_M_sweep_equivalents']} sweep-equivalents "
                f"(heat-bath/wolff = "
                f"{w.get('heatbath_tau_over_wolff_tau_sweeps')}x)")
        lines.append("")
    tpu_log = os.path.join(REPO, "visual_output", "tpu_test_log.txt")
    if os.path.exists(tpu_log):
        with open(tpu_log) as f:
            tail = [ln.strip() for ln in f.readlines() if ln.strip()]
        lines += ["### hardware kernel statistics (TSU_TEST_TPU=1)", "",
                  f"- {tail[-1] if tail else 'log present'} "
                  f"(visual_output/tpu_test_log.txt)", ""]
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
