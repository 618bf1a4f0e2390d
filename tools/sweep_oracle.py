#!/usr/bin/env python3
"""Checkpointed full-surface differential sweep driver (VERDICT r14 next #5).

Runs the per-query oracle compare for EVERY query that has an engine dump
under <outdir>, one fresh process per query (the retry_oracle_subset
isolation — one un-spillable oracle must not cascade onto the rest), with a
per-query timeout, an automatic STAGED retry (tools/staged_oracle.py — each
CTE materialized in its own fresh DuckDB process, the proven-equal stage
rewrites applied) when the single-process compare hits a resource wall, and
an incrementally-checkpointed ledger so an interrupted sweep resumes where
it stopped instead of redoing hours of compares.

The ledger records, per query: status (ok | ok_staged | mismatch |
oracle_wall | timeout | missing), wall seconds, and the tail of the
failing output — the "explicit exclusion ledger" shape the sf100 sweep
needs for oracles whose DuckDB wall is fundamental on this host.

Usage:
  sweep_oracle.py <outdir> <sfdir> <ledger.json> [--timeout SEC]
                  [--only q1,q2,...] [--no-staged]
Env: GRAFT_DUCKDB_MEM (passed through), GRAFT_BIGHASH defaults to 1 here
(multi-million-row outputs must compare inside DuckDB).
"""
import json
import os
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def load_ledger(path):
    if os.path.exists(path):
        with open(path) as fh:
            return json.load(fh)
    return {"queries": {}}


def save_ledger(path, ledger):
    tmp = path + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(ledger, fh, indent=1, sort_keys=True)
    os.replace(tmp, path)


def classify(output):
    """Map a failing check_oracle output to a ledger status. Only outputs
    carrying a recognized marker land in a known bucket; anything else is a
    distinct 'error' (an engine crash or harness bug must demand attention,
    never be ledgered as an excusable oracle resource wall — ADVICE r15)."""
    if "MISSING" in output:
        return "missing"
    if "ORAERR" in output or "OutOfMemory" in output:
        return "oracle_wall"
    if "SCHEMA" in output or "ROWS" in output:
        return "mismatch"
    return "error"


def run_check(outdir, sfdir, q, oracle, timeout, env):
    """check_oracle.py for ONE query in a fresh process."""
    shadow = tempfile.mkdtemp(prefix=f"sweep_{q}_")
    with open(f"{shadow}/oracle_sql.json", "w") as fh:
        json.dump({q: oracle[q]}, fh)
    os.symlink(os.path.abspath(f"{outdir}/{q}"), f"{shadow}/{q}")
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(HERE, "check_oracle.py"),
             shadow, sfdir],
            capture_output=True, text=True, timeout=timeout, env=env)
        out = (r.stdout or "") + (r.stderr or "")
        status = "ok" if r.returncode == 0 else classify(out)
    except subprocess.TimeoutExpired:
        status, out = "timeout", "(timeout)"
    finally:
        import shutil
        shutil.rmtree(shadow, ignore_errors=True)
    return status, time.time() - t0, out


def run_staged(outdir, sfdir, q, timeout, env):
    """staged_oracle.py retry: per-CTE fresh-process materialization."""
    t0 = time.time()
    try:
        r = subprocess.run(
            [sys.executable, os.path.join(HERE, "staged_oracle.py"),
             outdir, sfdir, q],
            capture_output=True, text=True, timeout=timeout, env=env)
        out = (r.stdout or "") + (r.stderr or "")
        status = "ok_staged" if r.returncode == 0 else (
            "mismatch" if "MISMATCH" in out else "oracle_wall")
    except subprocess.TimeoutExpired:
        status, out = "timeout", "(staged timeout)"
    return status, time.time() - t0, out


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    outdir, sfdir, ledger_path = args[0], args[1], args[2]
    timeout = 1800
    only = None
    staged_retry = "--no-staged" not in argv
    for i, a in enumerate(argv):
        if a == "--timeout":
            timeout = int(argv[i + 1])
        if a == "--only":
            only = {q.strip() for q in argv[i + 1].split(",") if q.strip()}

    env = dict(os.environ)
    env.setdefault("GRAFT_BIGHASH", "1")
    with open(f"{outdir}/oracle_sql.json") as fh:
        oracle = json.load(fh)
    names = [n for n in sorted(oracle)
             if os.path.isdir(os.path.join(outdir, n))
             and (only is None or n in only)]
    skipped_no_dump = [n for n in sorted(oracle)
                       if not os.path.isdir(os.path.join(outdir, n))
                       and (only is None or n in only)]
    ledger = load_ledger(ledger_path)
    qs = ledger["queries"]
    print(f"[sweep] {len(names)} dumps to compare, "
          f"{len(skipped_no_dump)} without engine dumps, "
          f"{sum(1 for n in names if qs.get(n, {}).get('status', '').startswith('ok'))} "
          f"already ok in ledger")

    for n in names:
        prior = qs.get(n, {}).get("status", "")
        # skip settled queries and ones being adjudicated out-of-band
        # (e.g. the sliced_oracle runs for the recorded resource walls)
        if prior.startswith("ok") or prior.startswith("adjudicating"):
            continue
        status, wall, out = run_check(outdir, sfdir, n, oracle, timeout, env)
        if status not in ("ok", "mismatch") and staged_retry:
            print(f"[sweep] {n}: {status} after {wall:.0f}s — staged retry")
            s2, w2, out2 = run_staged(outdir, sfdir, n, timeout * 2, env)
            if s2 == "ok_staged" or s2 == "mismatch":
                status, wall, out = s2, wall + w2, out2
            else:
                wall += w2
                out += "\n--- staged ---\n" + out2
        qs[n] = {"status": status, "wall_sec": round(wall, 1)}
        if status not in ("ok", "ok_staged"):
            qs[n]["note"] = out.strip()[-600:]
        save_ledger(ledger_path, ledger)
        print(f"[sweep] {n}: {status} ({wall:.0f}s)")

    counts = {}
    for n in names:
        counts[qs[n]["status"]] = counts.get(qs[n]["status"], 0) + 1
    ledger["summary"] = {
        "sfdir": sfdir, "outdir": outdir,
        "compared": len(names), "no_engine_dump": skipped_no_dump,
        "counts": counts}
    save_ledger(ledger_path, ledger)
    print(f"[sweep] done: {counts}")
    bad = sum(v for k, v in counts.items() if not k.startswith("ok"))
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
