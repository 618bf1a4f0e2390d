#!/usr/bin/env python3
"""Compare two BENCH_LOCAL.json artifacts (e.g. sf0.1 vs a ScaleGen sf1
run) and print per-query scaling factors, worst-first. Usage:

    python3 tools/scale_compare.py BASE.json SCALED.json [min_base_sec]

Queries below min_base_sec (default 0.3 s) in the base run are grouped
into a single "fast tail" line — their factors are dominated by fixed
per-job overhead, not data scaling.
"""
import json
import sys


def main() -> None:
    base = json.load(open(sys.argv[1]))
    scaled = json.load(open(sys.argv[2]))
    floor = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
    qb = {**base["queries"], **base.get("artifacts", {})}
    qs = {**scaled["queries"], **scaled.get("artifacts", {})}
    rows, tail_b, tail_s, tail_n = [], 0.0, 0.0, 0
    for name in sorted(set(qb) & set(qs)):
        b, s = qb[name], qs[name]
        if b is None or s is None:
            print(f"SKIP {name}: null time (failed?)")
            continue
        if b < floor:
            tail_b += b
            tail_s += s
            tail_n += 1
            continue
        rows.append((s / b, name, b, s))
    rows.sort(reverse=True)
    # Host-health screen (r10): a scale factor measured during host
    # contention is not a scale factor. Mark queries whose window shows
    # steal (>25% of cpu demand) or a slow speed canary (>2.5x baseline)
    # in EITHER artifact — see tools/bench_diag.py for the signals.
    def contended(artifact, name):
        t = artifact.get("telemetry", {}).get(name, {})
        steal, cpu = t.get("steal_ms", -1), t.get("cpu_ms", 0)
        if steal >= 300 and steal > 0.25 * (cpu + steal):
            return "steal"
        canary, cb = t.get("canary_us", -1), artifact.get("canary_baseline_us", 0)
        if canary > 0 and cb > 0 and canary > 2.5 * cb:
            return "slow-host"
        return None
    print(f"{'factor':>7}  {'base_s':>7}  {'scaled_s':>8}  query")
    for f, name, b, s in rows:
        tel = scaled.get("telemetry", {}).get(name, {})
        extra = (f"  gc={tel.get('gc_ms')}ms task={tel.get('task_ms')}ms"
                 f" peak={tel.get('peak_exec_mem_mb')}MB" if tel else "")
        taint = contended(base, name) or contended(scaled, name)
        if taint:
            extra += f"  [CONTAMINATED: {taint} — factor unreliable]"
        print(f"{f:7.1f}  {b:7.2f}  {s:8.2f}  {name}{extra}")
    if tail_n:
        print(f"{tail_s / max(tail_b, 1e-9):7.1f}  {tail_b:7.2f}  {tail_s:8.2f}"
              f"  <fast tail: {tail_n} queries under {floor}s base>")
    # totals over the INTERSECTION only, both values non-null — summing
    # each run's full set would inflate the base with queries the scaled
    # run skipped (review r9)
    common = [(qb[n], qs[n]) for n in set(qb) & set(qs)
              if qb[n] is not None and qs[n] is not None]
    tb = sum(b for b, _ in common)
    ts = sum(s for _, s in common)
    print(f"\ncommon-query totals ({len(common)} queries): base {tb:.1f}s"
          f" scaled {ts:.1f}s ({ts / tb:.1f}x for 10x rows)")


if __name__ == "__main__":
    main()
