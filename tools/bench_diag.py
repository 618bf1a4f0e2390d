#!/usr/bin/env python3
"""Contamination diagnosis for a Bench JSON artifact (BENCH_LOCAL.json /
BENCH_r{N}.json with the r9+ telemetry map). Usage:

    python3 tools/bench_diag.py BENCH.json [BASELINE.json]

Per query it computes the GC share of wall time and, with a baseline
artifact, the wall ratio. Classification (the r8/r9 adjudications, encoded):

  - wall inflated AND gc share high        -> HOST MEMORY PRESSURE
  - task_ms >> cpu_ms AND gc flat          -> HOST CPU STARVATION (threads
                                              existed but were descheduled;
                                              the r9 q_curation signature:
                                              50.8s wall, gc 134ms, which
                                              gc-only telemetry called clean)
  - wall inflated AND task+cpu inflated    -> real plan/work change
  - wall inflated, task_ms flat, gc flat   -> scheduling/layout (few busy
                                              threads; check partitioning)

cpu_ms (summed executor ON-CPU time) and sched_ms/n_tasks exist in r10+
artifacts. A pre-r10 artifact cannot positively distinguish starvation from
a work change — those flag as "ambiguous (pre-r10 artifact): re-run
isolated".

A run whose jvm_gc_total_ms exceeds 10% of total wall, or with any starved
query, is flagged as a whole — its per-query times should not be used for
round-over-round comparison (r8: 558s driver run vs 184s same-code; r9:
q_curation 50.8s driver vs 3.3-4.0s isolated x3).
"""
import json
import sys

# executorRunTime > STARVE_RATIO * executorCpuTime means the task threads
# spent most of their wall off-CPU. That is NOT always contamination:
# task wall legitimately includes BLOCKING waits — per-round checkpoint
# writes (the pagerank/kmeans/CC loops), streaming state-store commits
# (q_stream_*), and broadcast-build waits — and the committed r10 clean
# full-suite run measured those structural ratios up to 6.2x
# (q_pagerank_step; streaming joins 5.2-5.6x) on an idle host. The r9
# starvation incident (q_curation: 50.8s wall, 3.3-4.0s isolated) sat at
# ~13x. 8x splits the two regimes: above every observed structural wait,
# comfortably below real oversubscription. Mild starvation (<8x) is
# accepted as the price of zero false positives on I/O-bound queries.
STARVE_RATIO = 8.0
MIN_WALL_S = 2.0  # ignore sub-2s queries: constant costs dominate

# Host steal (r10): /proc/stat field 8 sampled around each query. Steal
# accrues only while a vCPU is RUNNABLE, so the honest denominator is the
# query's own CPU demand (cpu_ms + steal_ms), not host capacity — a
# 3-thread query on an idle 32-vCPU guest can be 50% stolen while the
# run-level capacity share reads under 1% (measured r10: q_winnow 0.8 ->
# 11.3 cpu-s, 3 identical tasks, flat GC — steal was the only counter that
# moved). On Firecracker-class guests stolen ticks can leak INTO thread
# cpu accounting, inflating cpu_ms itself; the share stays >25% under
# either accounting, so one threshold covers both. The absolute floor
# keeps scheduler-noise crumbs (tens of ms against a near-idle query) from
# flagging: the real incidents measured seconds of steal.
STEAL_SHARE = 0.25
STEAL_MIN_MS = 300

# Host-speed canary (r10): wall us of a fixed single-thread spin, best of
# 3, run after each query; canary_baseline_us is the run-start value.
# Catches CPI inflation — neighbor memory-bandwidth squeeze / frequency
# drop — where the same instruction stream burns more cycles with NO steal
# and NO GC (measured: q_bm25 at 19x committed cpu_ms, steal 110ms). A
# healthy run holds the canary within ~1.5x of baseline; contended windows
# measured 3-10x.
CANARY_RATIO = 2.5


def load(path):
    d = json.load(open(path))
    if "queries" not in d and "parsed" in d:
        # Driver-wrapped artifact (BENCH_r{N}.json: {n, rc, sf, tail,
        # parsed}). `parsed` holds the full bench JSON when the driver
        # could parse it; when the stdout line was truncated it is null and
        # only the LAST ~2000 chars survive in `tail` — salvage what the
        # fragment holds (telemetry objects + the run totals) rather than
        # crashing. The r9 adjudication needed exactly this: the committed
        # driver artifact's tail held 19 of 187 telemetry rows and the
        # whole-run GC totals, nothing more.
        if d["parsed"]:
            d = d["parsed"]
        else:
            import re
            tail = d.get("tail", "")
            tele = {m.group(1): json.loads(m.group(2)) for m in re.finditer(
                r'"((?:q_|artifact:)[\w:]+)":(\{"gc_ms":[^}]*\})', tail)}
            tot = re.search(r'"jvm_gc_total_ms":(\d+).*"n_queries":(\d+).*'
                            r'"value":([\d.]+)', tail)
            print(f"note: driver artifact with truncated tail — salvaged "
                  f"{len(tele)} telemetry rows, no per-query walls; "
                  f"pre-r10 driver runs cannot be fully diagnosed")
            d = {"queries": {}, "telemetry": tele,
                 "sf": d.get("sf", "?"),
                 "jvm_gc_total_ms": int(tot.group(1)) if tot else 0,
                 "n_queries": int(tot.group(2)) if tot else len(tele),
                 "value": float(tot.group(3)) if tot else 0.0}
    qs = {**d["queries"], **d.get("artifacts", {})}
    # task_ms is the summed executor-thread wall; without per-query driver
    # walls (salvaged tails) it is the only timing signal, so surface it as
    # a lower-bound wall estimate for the starvation screen below.
    if not qs and d.get("telemetry"):
        qs = {k: t.get("task_ms", 0) / 1000.0
              for k, t in d["telemetry"].items()}
        d["__walls_estimated"] = True
    return d, {k: v for k, v in qs.items() if v is not None}


def main() -> None:
    d, qs = load(sys.argv[1])
    base = load(sys.argv[2])[1] if len(sys.argv) > 2 else None
    tel = d.get("telemetry", {})
    total = d["value"]
    jvm_gc = d.get("jvm_gc_total_ms", 0)
    print(f"run: {d['sf']}  total {total:.1f}s  n={d['n_queries']}"
          f"  jvm_gc {jvm_gc}ms ({jvm_gc / (10 * total):.1f}% of wall)")
    steal_total = d.get("host_steal_total_ms", -1)
    if steal_total >= 0:
        print(f"host steal during run: {steal_total}ms "
              f"(vs {sum(t.get('cpu_ms', 0) for t in tel.values())}ms "
              f"summed task cpu)")
    flagged = []
    starved = []
    stolen = []
    for name, wall in qs.items():
        t = tel.get(name)
        if not t or wall < 0.5:
            continue
        gc_share = t["gc_ms"] / (wall * 1000)
        ratio = (wall / base[name]) if base and base.get(name) else None
        task_ms = t.get("task_ms", 0)
        cpu_ms = t.get("cpu_ms")
        steal_ms = t.get("steal_ms", -1)
        # Host steal: the hypervisor ran other tenants while this query's
        # threads were runnable. Positively identifies host contention from
        # the single artifact — the signal the r9 q_curation adjudication
        # lacked (it needed a judge re-run x3 to rule out a regression).
        if (steal_ms >= STEAL_MIN_MS and cpu_ms is not None
                and wall >= MIN_WALL_S
                and steal_ms > STEAL_SHARE * (cpu_ms + steal_ms)):
            stolen.append((name, wall, steal_ms, cpu_ms))
            flagged.append((name, wall, gc_share, ratio,
                            f"HOST CONTENTION — steal {steal_ms}ms vs "
                            f"cpu {cpu_ms}ms: hypervisor ran other tenants"))
            continue
        # CPI inflation: the fixed-instruction canary ran slow right after
        # this query — the host executed EVERYONE's cycles slowly during
        # that window (bandwidth squeeze / frequency drop), which neither
        # steal nor GC nor task/cpu can see.
        canary = t.get("canary_us", -1)
        cbase = d.get("canary_baseline_us", 0)
        if (canary > 0 and cbase > 0 and wall >= MIN_WALL_S
                and canary > CANARY_RATIO * cbase):
            stolen.append((name, wall, canary, cpu_ms))
            flagged.append((name, wall, gc_share, ratio,
                            f"HOST SLOWDOWN — speed canary {canary}us vs "
                            f"baseline {cbase}us: CPI inflated during this "
                            "query's window (neighbor contention)"))
            continue
        # CPU starvation: the task threads' wall greatly exceeds their
        # on-CPU time while GC is flat. Does not need a baseline — the gap
        # is visible inside the single artifact.
        if (cpu_ms is not None and wall >= MIN_WALL_S and gc_share < 0.1
                and task_ms > STARVE_RATIO * max(cpu_ms, 1)):
            suffix = ("; steal flat — NOT host contention: look at "
                      "blocking waits" if 0 <= steal_ms < 0.1 * task_ms
                      else "")
            starved.append((name, wall, task_ms, cpu_ms))
            flagged.append((name, wall, gc_share, ratio,
                            f"HOST CPU STARVATION (task {task_ms}ms vs "
                            f"cpu {cpu_ms}ms, gc flat{suffix})"))
            continue
        if gc_share > 0.3 or (ratio and ratio > 3):
            if gc_share > 0.3:
                kind = "host memory pressure"
            elif cpu_ms is None:
                kind = ("ambiguous (pre-r10 artifact, no cpu_ms): work "
                        "change or CPU starvation — re-run isolated")
            elif task_ms > 3000 * wall:
                kind = "work change"
            else:
                kind = "scheduling/layout (few busy threads)"
            flagged.append((name, wall, gc_share, ratio, kind))
    if jvm_gc > 100 * total:  # ms vs s: >10% of wall
        print("VERDICT: CONTAMINATED — whole-run GC above 10% of wall; do "
              "not use per-query times for round-over-round comparison")
    elif stolen:
        names = ", ".join(n for n, *_ in stolen)
        print(f"VERDICT: CONTAMINATED — host steal during queries ({names});"
              " another tenant had the CPUs, re-run before comparing")
    elif starved:
        names = ", ".join(n for n, *_ in starved)
        print(f"VERDICT: CONTAMINATED — CPU-starved queries ({names}); "
              "host was oversubscribed, re-run isolated before comparing")
    elif d.get("__walls_estimated") or len(qs) < d.get("n_queries", 0):
        print("VERDICT: clean-AS-FAR-AS-VISIBLE — GC below 10% of wall, no "
              f"starved queries among the {len(qs)}/{d.get('n_queries')} "
              "visible; the artifact is incomplete, so absence of a flag is "
              "NOT evidence of a clean run")
    else:
        print("VERDICT: clean — GC below 10% of wall, no starved queries")
    for name, wall, gc_share, ratio, kind in sorted(flagged, key=lambda x: -x[1]):
        r = f" {ratio:.1f}x vs baseline" if ratio else ""
        print(f"  {name}: {wall:.1f}s gc={gc_share:.0%}{r} -> {kind}")
    if not flagged:
        steal_note = (", steal <=25% of cpu demand" if any(
            t.get("steal_ms", -1) >= 0 for t in tel.values())
            else "; no steal signal in artifact")
        print(f"no per-query anomalies (gc share <=30%, ratio <=3x, "
              f"task/cpu <={STARVE_RATIO:g}x{steal_note})")


if __name__ == "__main__":
    main()
