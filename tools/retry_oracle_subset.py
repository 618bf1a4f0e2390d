#!/usr/bin/env python3
"""Re-run check_oracle.py for a subset of queries, each chunk in a FRESH
process/DuckDB connection.

Needed for full-surface sweeps at sf10+: one un-spillable heavy oracle
(pivot/list aggregation) can saturate the shared connection's allocator and
cascade "Failed to allocate block (bad allocation)" ORAERRs onto every
later query in the same process — a fresh connection per chunk isolates
them so only the genuinely-infeasible oracles fail.

Usage: retry_oracle_subset.py <outdir> <sfdir> <q1,q2,...> [chunk_size]
Builds a shadow outdir with symlinks to the subset's dumps + a filtered
oracle_sql.json per chunk, then invokes check_oracle.py on each.
"""
import json
import os
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))


def main(outdir, sfdir, names, chunk_size=1):
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    missing = [n for n in names if n not in oracle]
    if missing:
        sys.exit(f"not in oracle_sql.json: {missing}")
    rc = 0
    for i in range(0, len(names), chunk_size):
        chunk = names[i:i + chunk_size]
        shadow = tempfile.mkdtemp(prefix="oracle_retry_")
        with open(f"{shadow}/oracle_sql.json", "w") as fh:
            json.dump({n: oracle[n] for n in chunk}, fh)
        for n in chunk:
            os.symlink(os.path.abspath(f"{outdir}/{n}"), f"{shadow}/{n}")
        r = subprocess.run(
            [sys.executable, os.path.join(HERE, "check_oracle.py"),
             shadow, sfdir])
        rc |= r.returncode
    return rc


if __name__ == "__main__":
    qs = [q.strip() for q in sys.argv[3].split(",") if q.strip()]
    cs = int(sys.argv[4]) if len(sys.argv) > 4 else 1
    sys.exit(main(sys.argv[1], sys.argv[2], qs, cs))
