#!/usr/bin/env python3
"""Contamination diagnosis for a Bench JSON artifact (BENCH_LOCAL.json /
BENCH_r{N}.json with the r9 telemetry map). Usage:

    python3 tools/bench_diag.py BENCH.json [BASELINE.json]

Per query it computes the GC share of wall time and, with a baseline
artifact, the wall ratio. Classification (the r8 adjudication, encoded):

  - wall inflated AND gc share high        -> HOST MEMORY PRESSURE
  - wall inflated AND task_ms inflated     -> real plan/work change
  - wall inflated, task_ms flat, gc flat   -> scheduling/layout (few busy
                                              threads; check partitioning)

A run whose jvm_gc_total_ms exceeds 10% of total wall is flagged
contaminated as a whole — its per-query times should not be used for
round-over-round comparison (r8: 558s driver run vs 184s same-code).
"""
import json
import sys


def load(path):
    d = json.load(open(path))
    qs = {**d["queries"], **d.get("artifacts", {})}
    return d, {k: v for k, v in qs.items() if v is not None}


def main() -> None:
    d, qs = load(sys.argv[1])
    base = load(sys.argv[2])[1] if len(sys.argv) > 2 else None
    tel = d.get("telemetry", {})
    total = d["value"]
    jvm_gc = d.get("jvm_gc_total_ms", 0)
    print(f"run: {d['sf']}  total {total:.1f}s  n={d['n_queries']}"
          f"  jvm_gc {jvm_gc}ms ({jvm_gc / (10 * total):.1f}% of wall)")
    if jvm_gc > 100 * total:  # ms vs s: >10% of wall
        print("VERDICT: CONTAMINATED — whole-run GC above 10% of wall; do "
              "not use per-query times for round-over-round comparison")
    else:
        print("VERDICT: clean — GC below 10% of wall")
    flagged = []
    for name, wall in qs.items():
        t = tel.get(name)
        if not t or wall < 0.5:
            continue
        gc_share = t["gc_ms"] / (wall * 1000)
        ratio = (wall / base[name]) if base and base.get(name) else None
        if gc_share > 0.3 or (ratio and ratio > 3):
            kind = ("host memory pressure" if gc_share > 0.3 else
                    "work change" if ratio and t.get("task_ms", 0) > 3000 * wall
                    else "scheduling/layout (few busy threads)")
            flagged.append((name, wall, gc_share, ratio, kind))
    for name, wall, gc_share, ratio, kind in sorted(flagged, key=lambda x: -x[1]):
        r = f" {ratio:.1f}x vs baseline" if ratio else ""
        print(f"  {name}: {wall:.1f}s gc={gc_share:.0%}{r} -> {kind}")
    if not flagged:
        print("no per-query anomalies (gc share <=30%, ratio <=3x)")


if __name__ == "__main__":
    main()
