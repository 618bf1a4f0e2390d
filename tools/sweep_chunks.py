#!/usr/bin/env python3
"""Chunked engine-dump + oracle-compare pipeline for the sf100 sweep
(VERDICT r16 next #2 — the committed form of the chunk loop the r15/r16
probes ran by hand).

Per chunk of queries (ascending close-bench cost, so a bounded wall-clock
budget maximizes coverage): run graft.Verify in a fresh JVM restricted to
the chunk (SPARK_GRAFT_ONLY), then tools/sweep_oracle.py over the chunk
(fresh DuckDB process per query, staged retry, checkpointed ledger), then
delete the dumps so the disk envelope stays bounded. The ledger is the
single source of progress — an interrupted run resumes at the first query
whose ledger entry is missing or non-ok; chunks whose every query is
settled skip even the Verify.

Usage:
  sweep_chunks.py <sfdir> <ledger.json> <workdir> --queries q1,q2,...
                  [--chunk 8] [--timeout 900] [--bench BENCH_CLOSE.json]
Env: SPARK_DRIVER_MEM (Verify JVM heap, default 64g), SPARK_GRAFT_CPUS
(default 32), GRAFT_DUCKDB_MEM (passed to compares).
"""
import json
import os
import shutil
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def load(path):
    with open(path) as fh:
        return json.load(fh)


def settled(ledger_path, q):
    if not os.path.exists(ledger_path):
        return False
    st = load(ledger_path)["queries"].get(q, {}).get("status", "")
    return st.startswith("ok") or st.startswith("adjudicating")


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    sfdir, ledger_path, workdir = args[0], args[1], args[2]
    chunk_size, timeout, bench_path, queries = 8, 900, None, None
    for i, a in enumerate(argv):
        if a == "--chunk":
            chunk_size = int(argv[i + 1])
        if a == "--timeout":
            timeout = int(argv[i + 1])
        if a == "--bench":
            bench_path = argv[i + 1]
        if a == "--queries":
            queries = [q.strip() for q in argv[i + 1].split(",") if q.strip()]
    if not queries:
        print("--queries required", file=sys.stderr)
        return 2
    if bench_path:
        cost = load(bench_path).get("queries", {})
        queries.sort(key=lambda q: cost.get(q, 1e9))
    os.makedirs(workdir, exist_ok=True)

    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEM", "64g")
    env.setdefault("SPARK_GRAFT_CPUS", "32")

    chunks = [queries[i:i + chunk_size]
              for i in range(0, len(queries), chunk_size)]
    for ci, ch in enumerate(chunks):
        todo = [q for q in ch if not settled(ledger_path, q)]
        if not todo:
            print(f"[chunks] chunk {ci}/{len(chunks)}: all settled, skip",
                  flush=True)
            continue
        outdir = os.path.join(workdir, f"chunk_{ci}")
        shutil.rmtree(outdir, ignore_errors=True)
        t0 = time.time()
        print(f"[chunks] chunk {ci}/{len(chunks)}: Verify {todo}", flush=True)
        venv = dict(env)
        venv["SPARK_GRAFT_ONLY"] = ",".join(todo)
        r = subprocess.run(
            ["bash", os.path.join(REPO, "run_graft.sh"), "graft.Verify",
             sfdir, outdir], env=venv,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        tail = "\n".join(r.stdout.splitlines()[-12:])
        print(f"[chunks] chunk {ci}: Verify exit={r.returncode} "
              f"({time.time() - t0:.0f}s)\n{tail}", flush=True)
        # nonzero exit = some query failed to dump; the sweep marks those
        # 'missing' per-query — never silently, so keep going either way
        r2 = subprocess.run(
            [sys.executable, os.path.join(HERE, "sweep_oracle.py"),
             outdir, sfdir, ledger_path, "--timeout", str(timeout),
             "--only", ",".join(todo)], env=env)
        print(f"[chunks] chunk {ci}: sweep exit={r2.returncode} "
              f"(total {time.time() - t0:.0f}s)", flush=True)
        shutil.rmtree(outdir, ignore_errors=True)
    # summary
    led = load(ledger_path)["queries"]
    from collections import Counter
    print("[chunks] final ledger:",
          dict(Counter(v["status"] for v in led.values())), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
