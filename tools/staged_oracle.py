#!/usr/bin/env python3
"""Staged-materialization oracle for heavy CTE chains (VERDICT r13 next #1).

The 8 sf10 oracle exclusions all fail the same way: an unrolled iterative /
vector chain (kmeans rounds, pagerank rounds, all-candidate vector scoring)
evaluated as ONE DuckDB query exceeds the memory limit AND the free-disk
spill budget — DuckDB re-materializes giant intermediates inside a single
allocator. q_scd2_lookup fails differently: a 15M-probe as-of range join
evaluated as a general inequality join never finishes.

The fix is mechanical and changes NOTHING about what is computed:

  1. Parse the oracle SQL's `WITH a AS (...), b AS (...) SELECT ...` chain.
  2. Materialize each CTE to parquet IN ITS OWN fresh DuckDB process
     (base tables + previously-staged CTEs exposed as views over parquet;
     the CTE body runs verbatim).
  3. Run the final SELECT in a last fresh process and compare it against
     the engine's dump with the same order-free bighash check_oracle uses.

Per-stage REWRITES (STAGE_SQL below) are allowed only where the verbatim
stage body still exceeds the host (the row_number-over-cross-product
argmax pattern, and the as-of range join): each rewrite is an equivalent
formulation (aggregate argmax / ASOF JOIN), and `--selfcheck <sfdir>`
proves rewritten == verbatim stage-by-stage at a scale where verbatim
runs (sf0.01/sf1 are oracle-green for all nine queries).

Usage:
  staged_oracle.py <outdir> <sfdir> <query>            # staged compare
  staged_oracle.py <outdir> <sfdir> <query> --selfcheck
      # additionally re-runs every REWRITTEN stage verbatim and asserts
      # the parquet outputs are bighash-identical (use at sf0.01/sf1)
"""
import json
import os
import re
import shutil
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


# ---------------------------------------------------------------- parsing
def split_ctes(sql):
    """`WITH n1 AS (b1), n2 AS (b2) SELECT ...` -> ([(n1,b1),(n2,b2)], final).
    Paren- and quote-aware; handles AS MATERIALIZED. Returns ([], sql) when
    there is no WITH chain."""
    s = sql.strip()
    m = re.match(r"WITH\s+", s, re.I)
    if not m:
        return [], s
    i = m.end()
    ctes = []
    while True:
        m = re.match(r"\s*([A-Za-z_]\w*)\s+AS\s+(?:MATERIALIZED\s+)?\(",
                     s[i:], re.I)
        if not m:
            break
        name = m.group(1)
        j = i + m.end()  # position right after the opening paren
        depth, k, quote = 1, j, None
        while k < len(s) and depth:
            c = s[k]
            if quote:
                if c == quote:
                    quote = None
            elif c in ("'", '"'):
                quote = c
            elif c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
            k += 1
        ctes.append((name, s[j:k - 1].strip()))
        i = k
        m2 = re.match(r"\s*,", s[i:])
        if m2:
            i += m2.end()
        else:
            break
    return ctes, s[i:].strip()


# ------------------------------------------------- per-query stage rewrites
# 2^40: the pack shift must clear the largest centroid id. ScaleGen ids are
# copy*1e8 + base, so sf10 reaches ~9.9e9 and sf100 ~9.9e10 — both < 2^40,
# while the old 2^24 shift silently corrupted the ordering for any id
# >= 16.7M (i.e. every decade above sf0.1). |q| <= 1e4 (quantized cosine)
# or <= ~6.4e5 (quantized subvector L2^2), so |q|*2^40 stays far inside
# BIGINT. The --selfcheck mode proves the packing at any chosen scale.
PACK = 1 << 40


def argmax_cell_rewrite(round_sig, cent_cte, cent_ref, cent_col,
                        emb_alias, quant=10000.0):
    """Equivalent form of the assignment stage
        SELECT vec_id, <emb_alias>, cell FROM (SELECT ..., row_number()
          OVER (PARTITION BY vec_id ORDER BY floor(cos*Q+0.5)/Q DESC,
                <cent_ref>.<cent_col>) rn
        FROM embeddings e, <cent_cte> [<cent_ref>]) WHERE rn = 1
    that avoids sorting the N*K cross product: the ordering key
    (quantized-similarity DESC, cell ASC) is packed into one BIGINT and
    reduced with arg_max — a streaming hash aggregate over N groups.
    Ties are impossible to break differently: the packed key is a
    strictly monotone encoding of the original (q, -cell) order. The
    centroid relation keeps its original qualifier so `round_sig` runs
    verbatim."""
    alias = "" if cent_ref == cent_cte else f" {cent_ref}"
    return f"""
      SELECT a.vec_id, e.embedding AS {emb_alias}, a.cell FROM (
        SELECT e.vec_id,
          arg_max({cent_ref}.{cent_col},
                  CAST(floor({round_sig} * {quant} + 0.5) AS BIGINT) * {PACK}
                  + ({PACK - 1} - {cent_ref}.{cent_col})) AS cell
        FROM embeddings e, {cent_cte}{alias} GROUP BY e.vec_id) a
      JOIN embeddings e ON e.vec_id = a.vec_id"""


COS = ("(list_sum(list_transform(range(1, len(e.embedding)+1), "
       "i -> e.embedding[i]::DOUBLE * c.emb_cent[i]::DOUBLE)) / "
       "(sqrt(list_sum(list_transform(range(1, len(e.embedding)+1), "
       "i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE))) * "
       "sqrt(list_sum(list_transform(range(1, len(c.emb_cent)+1), "
       "i -> c.emb_cent[i]::DOUBLE * c.emb_cent[i]::DOUBLE)))))")

def argmin_code_rewrite(dist, xs_tbl, xs_ref, cb_tbl, cb_ref,
                        cent_col, quant=10000.0):
    """Equivalent form of q_pq_code's distance stage
        SELECT vec_id, <xs_ref>.sub AS sub, <cent_col>, floor(d*Q+0.5)/Q
        FROM <xs> x JOIN <cb> c ON x.sub = c.sub
    + the downstream rn=1 filter, fused: the (quantized-distance ASC,
    code ASC) order packs into one BIGINT, arg_min reduces the N*K join
    to one row per (vec_id, sub), and the surviving pair's distance is
    re-evaluated verbatim on a K=1 join. The downstream row_number stage
    then runs over N*m rows instead of N*m*K. L2^2 >= 0, so the packed
    key needs no sign handling."""
    return f"""
      SELECT am.vec_id, am.sub, am.{cent_col},
        floor(({dist}) * {quant} + 0.5) / {quant} AS dist
      FROM (
        SELECT {xs_ref}.vec_id, {xs_ref}.sub,
          arg_min({cb_ref}.{cent_col},
                  CAST(floor(({dist}) * {quant} + 0.5) AS BIGINT) * {PACK}
                  + {cb_ref}.{cent_col}) AS {cent_col}
        FROM {xs_tbl} {xs_ref} JOIN {cb_tbl} {cb_ref}
          ON {xs_ref}.sub = {cb_ref}.sub
        GROUP BY {xs_ref}.vec_id, {xs_ref}.sub) am
      JOIN {xs_tbl} {xs_ref}
        ON {xs_ref}.vec_id = am.vec_id AND {xs_ref}.sub = am.sub
      JOIN {cb_tbl} {cb_ref}
        ON {cb_ref}.sub = am.sub AND {cb_ref}.{cent_col} = am.{cent_col}"""


# (query, cte) -> replacement SQL. Generated lazily in rewrites_for().
def rewrites_for(query, ctes, final):
    """Detect the known scale-killer stage shapes and build equivalent
    bodies; everything else runs verbatim."""
    rw = {}
    for name, body in ctes:
        # centroid-assignment argmax: row_number over the N*K cross product,
        # quantized-cosine DESC + centroid-id ASC. Alias-flexible: matches
        # both `... AS emb_v, c.cell ... FROM embeddings e, cN c` (kmeans
        # rounds) and `... AS emb_c, c0.cent_id ... FROM embeddings e, c0`.
        m = re.match(
            r"SELECT vec_id, (?P<ea>emb_\w+), cell FROM \(\s*"
            r"SELECT e\.vec_id, e\.embedding AS (?P=ea), (?P<cr>\w+)\.(?P<cc>\w+)(?: AS cell)?,\s*"
            r"row_number\(\) OVER \(PARTITION BY e\.vec_id\s*"
            r"ORDER BY floor\(\((?P<sim>.*?)\) \* (?P<q>[0-9.]+) \+ 0\.5\) / [0-9.]+ DESC,\s*"
            r"(?P=cr)\.(?P=cc)\) AS rn\s*"
            r"FROM embeddings e, (?P<cent>\w+)(?: (?P<al>\w+))?\) WHERE rn = 1$",
            body, re.S)
        if m and m.group("cr") == (m.group("al") or m.group("cent")):
            sim = "(" + m.group("sim") + ")"
            rw[name] = argmax_cell_rewrite(sim, m.group("cent"),
                                           m.group("cr"), m.group("cc"),
                                           m.group("ea"), float(m.group("q")))
            continue
        # PQ code-distance argmin: the N*m x K sub-distance table that only
        # feeds an rn=1 filter downstream (q_pq_code's d stage).
        m = re.match(
            r"SELECT vec_id, (?P<xr>\w+)\.sub AS sub, (?P<cc>cent_\w+),\s*"
            r"floor\(\((?P<dist>.*?)\) \* (?P<q>[0-9.]+) \+ 0\.5\) / [0-9.]+ AS dist\s*"
            r"FROM (?P<xs>\w+) (?P=xr) JOIN (?P<cb>\w+) (?P<cr>\w+) "
            r"ON (?P=xr)\.sub = (?P<cr2>\w+)\.sub$",
            body, re.S)
        if m and m.group("cr") == m.group("cr2"):
            rw[name] = argmin_code_rewrite(
                m.group("dist"), m.group("xs"), m.group("xr"),
                m.group("cb"), m.group("cr"), m.group("cc"),
                float(m.group("q")))
    return rw


FINAL_REWRITES = {
    # q_scd2_lookup: the interval join is an as-of by construction — v's
    # versions per key are CONTIGUOUS (valid_to = lead(valid_from), NULL
    # last) and every probe key exists in v with min(valid_from) =
    # min(o_orderdate), so "latest valid_from <= o_orderdate" is exactly
    # the interval row and the LEFT join always matches. DuckDB's ASOF
    # JOIN evaluates it as a per-key binary search instead of a general
    # inequality join (the 25-min wall at 15M probes).
    "q_scd2_lookup": """
      SELECT o.o_orderkey, o.o_custkey, v.version, v.priority, v.valid_from
      FROM orders o ASOF LEFT JOIN v
        ON o.o_custkey = v.key AND o.o_orderdate >= v.valid_from
      ORDER BY o.o_orderkey""",
}


# ---------------------------------------------------------------- running
def views_sql(sfdir, stage_dir, upto):
    lines = []
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        if os.path.isdir(p):
            lines.append(f"CREATE VIEW {t} AS SELECT * FROM "
                         f"read_parquet('{p}/*.parquet');")
        elif os.path.exists(p):
            lines.append(f"CREATE VIEW {t} AS SELECT * FROM "
                         f"read_parquet('{p}');")
    for name in upto:
        lines.append(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM "
                     f"read_parquet('{stage_dir}/{name}.parquet');")
    return "\n".join(lines)


def run_stage(sfdir, stage_dir, upto, body, out_name, mem):
    """COPY one stage to parquet in a FRESH python/duckdb process (a dying
    allocator must not cascade; ENOSPC/OOM shows up as a nonzero exit)."""
    script = f"""
import duckdb, os
con = duckdb.connect()
os.makedirs('/tmp/duckdb_spill', exist_ok=True)
con.execute("SET temp_directory='/tmp/duckdb_spill'")
con.execute("SET memory_limit='{mem}'")
con.execute('''{views_sql(sfdir, stage_dir, upto)}''')
con.execute('''COPY ({body}) TO '{stage_dir}/{out_name}.parquet'
             (FORMAT PARQUET, COMPRESSION ZSTD)''')
"""
    r = subprocess.run([sys.executable, "-c", script])
    if r.returncode != 0:
        raise RuntimeError(f"stage {out_name} failed (exit {r.returncode})")


def bighash_file(path_expr, mem):
    """(cols, n, hash) of a SELECT in a fresh process, via check_oracle's
    bighash (same normalization the driver-faithful compare uses)."""
    script = f"""
import duckdb, os, sys, json
sys.path.insert(0, {HERE!r})
from check_oracle import bighash
con = duckdb.connect()
os.makedirs('/tmp/duckdb_spill', exist_ok=True)
con.execute("SET temp_directory='/tmp/duckdb_spill'")
con.execute("SET memory_limit='{mem}'")
cols, n, h = bighash(con, '''{path_expr}''')
print(json.dumps({{"cols": cols, "n": n, "h": h}}))
"""
    r = subprocess.run([sys.executable, "-c", script],
                       capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(f"bighash failed: {r.stderr[-800:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def bighash_sql(sfdir, stage_dir, upto, sql, mem):
    script = f"""
import duckdb, os, sys, json
sys.path.insert(0, {HERE!r})
from check_oracle import bighash
con = duckdb.connect()
os.makedirs('/tmp/duckdb_spill', exist_ok=True)
con.execute("SET temp_directory='/tmp/duckdb_spill'")
con.execute("SET memory_limit='{mem}'")
con.execute('''{views_sql(sfdir, stage_dir, upto)}''')
cols, n, h = bighash(con, '''{sql}''')
print(json.dumps({{"cols": cols, "n": n, "h": h}}))
"""
    r = subprocess.run([sys.executable, "-c", script],
                       capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(f"final select failed: {r.stderr[-800:]}")
    return json.loads(r.stdout.strip().splitlines()[-1])


def engine_files(outdir, query):
    d = os.path.join(outdir, query)
    fs = sorted(os.path.join(d, f) for f in os.listdir(d)
                if f.endswith(".parquet"))
    return "SELECT * FROM read_parquet(" + repr(fs) + ")"


def main(outdir, sfdir, query, selfcheck=False):
    mem = os.environ.get("GRAFT_DUCKDB_MEM", "80GB")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    sql = oracle[query]
    ctes, final = split_ctes(sql)
    rw = rewrites_for(query, ctes, final)
    stage_dir = tempfile.mkdtemp(prefix=f"staged_{query}_")
    print(f"[staged] {query}: {len(ctes)} stages "
          f"({len(rw)} rewritten), dir={stage_dir}")
    try:
        done = []
        for name, body in ctes:
            use = rw.get(name, body)
            tag = "rewrite" if name in rw else "verbatim"
            run_stage(sfdir, stage_dir, done, use, name, mem)
            if selfcheck and name in rw:
                run_stage(sfdir, stage_dir, done, body, name + "__vb", mem)
                a = bighash_file(
                    f"SELECT * FROM read_parquet('{stage_dir}/{name}.parquet')", mem)
                b = bighash_file(
                    f"SELECT * FROM read_parquet('{stage_dir}/{name}__vb.parquet')", mem)
                assert a == b, f"rewrite diverges at stage {name}: {a} vs {b}"
                print(f"[staged]   stage {name}: rewrite == verbatim "
                      f"({a['n']} rows)")
            done.append(name)
            n = bighash_file(
                f"SELECT count(*) AS n FROM read_parquet('{stage_dir}/{name}.parquet')",
                mem)
            print(f"[staged]   stage {name} ({tag}) done")
        fin = FINAL_REWRITES.get(query, final)
        if selfcheck and query in FINAL_REWRITES:
            a = bighash_sql(sfdir, stage_dir, done, fin, mem)
            b = bighash_sql(sfdir, stage_dir, done, final, mem)
            assert a == b, f"final rewrite diverges: {a} vs {b}"
            print(f"[staged]   final: rewrite == verbatim ({a['n']} rows)")
        got = bighash_sql(sfdir, stage_dir, done, fin, mem)
        want = bighash_file(engine_files(outdir, query), mem)
        ok = got == want
        print(f"[staged] {query}: oracle n={got['n']} h={got['h']} | "
              f"engine n={want['n']} h={want['h']} | "
              f"cols {'==' if got['cols'] == want['cols'] else '!='} | "
              f"{'OK' if ok else 'MISMATCH'}")
        return 0 if ok else 1
    finally:
        shutil.rmtree(stage_dir, ignore_errors=True)


if __name__ == "__main__":
    sc = "--selfcheck" in sys.argv
    args = [a for a in sys.argv[1:] if a != "--selfcheck"]
    sys.exit(main(args[0], args[1], args[2], sc))
