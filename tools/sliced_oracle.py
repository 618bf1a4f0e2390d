#!/usr/bin/env python3
"""Slice-partitioned oracle compare for the sf100 DuckDB resource walls
(VERDICT r15 next #1): q_tokenize (an ~800M-row compare), q_logreg_score
(an ~800M-row tokenize->hash pipeline) and q_lm_bucket (an ~800M-row
window + global bigram model that ENOSPCs DuckDB's spill).

The key fact: check_oracle's bighash is an ORDER-FREE MULTISET hash, and
`doc_id % K = i` partitions the output rows exactly — so per-slice
equality across all K slices IS full-surface equality, while each slice's
DuckDB process only ever holds ~1/K of the rows (memory and spill bounded,
resumable). Two modes:

 - generic (q_tokenize, q_logreg_score, anything per-doc): run the
   VERBATIM oracle SQL against a `documents` view that carries the slice
   predicate (`WHERE <col> % K = i`) and compare against the engine dump
   filtered the same way, one fresh process per slice. The predicate is
   pushed at the SOURCE — DuckDB's optimizer does not reliably push a
   modulus filter through unnest + grouped aggregates, and an unpushed
   slice recomputes (and re-spills) the full corpus K times. Source-level
   slicing is only exact for PER-DOCUMENT-independent queries; that is
   precisely what `--selfcheck` proves (sliced == one-shot) at a scale
   where the one-shot runs.

 - q_lm_bucket (global aggregates): the bigram model is additive over
   disjoint doc slices, so the chain restages as
     (1) per-slice bigram counts (the doc-partitioned window runs on 1/K
         of the corpus per process),
     (2) one global sum -> cb/cl (bigram + left-context totals, verbatim
         aggregation over the slice partials),
     (3) per-slice per-doc scoring against the materialized model,
     (4) quantile cuts + final select over the per-doc table (~n_docs
         rows), bighash-compared to the engine dump.
   Nothing about WHAT is computed changes — `--selfcheck <small sfdir>`
   proves sliced == verbatim where verbatim runs (sf0.01/sf1 are green).

Usage:
  sliced_oracle.py <outdir> <sfdir> <query> [--col doc_id] [--k 10]
                   [--selfcheck] [--mem 60GB]
Exit 0 = every slice OK (and selfcheck passed, when asked).
"""
import json
import os
import shutil
import subprocess
import sys
import tempfile

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def views_sql(sfdir, extra=(), slice_pred=None):
    """Base-table views; `slice_pred = (table, predicate)` bakes the slice
    filter into that table's view so every consumer of it is sliced at the
    scan (the manual pushdown the generic mode relies on)."""
    lines = []
    for t in TABLES:
        p = f"{sfdir}/{t}.parquet"
        src = None
        if os.path.isdir(p):
            src = f"read_parquet('{p}/*.parquet')"
        elif os.path.exists(p):
            src = f"read_parquet('{p}')"
        if src:
            where = ""
            if slice_pred and slice_pred[0] == t:
                where = f" WHERE {slice_pred[1]}"
            lines.append(f"CREATE VIEW {t} AS SELECT * FROM {src}{where};")
    for name, path in extra:
        lines.append(f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM "
                     f"read_parquet('{path}');")
    return "\n".join(lines)


def fresh(script):
    """Run a DuckDB snippet in a fresh process; return last stdout line."""
    r = subprocess.run([sys.executable, "-c", script],
                       capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(f"slice process failed: {r.stderr[-800:]}")
    return r.stdout.strip().splitlines()[-1]


def bighash_pair(sfdir, sql_a, sql_b, mem, extra=(), slice_pred=None):
    """bighash both queries in ONE fresh process (same hash universe)."""
    script = f"""
import duckdb, os, sys, json
sys.path.insert(0, {HERE!r})
from check_oracle import bighash
con = duckdb.connect()
os.makedirs('/tmp/duckdb_spill', exist_ok=True)
con.execute("SET temp_directory='/tmp/duckdb_spill'")
con.execute("SET memory_limit='{mem}'")
con.execute('''{views_sql(sfdir, extra, slice_pred)}''')
ca, na, ha = bighash(con, '''{sql_a}''')
cb, nb, hb = bighash(con, '''{sql_b}''')
print(json.dumps({{"a": [ca, na, ha], "b": [cb, nb, hb]}}))
"""
    return json.loads(fresh(script))


def copy_stage(sfdir, body, out_path, mem, extra=()):
    script = f"""
import duckdb, os
con = duckdb.connect()
os.makedirs('/tmp/duckdb_spill', exist_ok=True)
con.execute("SET temp_directory='/tmp/duckdb_spill'")
con.execute("SET memory_limit='{mem}'")
con.execute('''{views_sql(sfdir, extra)}''')
con.execute('''COPY ({body}) TO '{out_path}'
             (FORMAT PARQUET, COMPRESSION ZSTD)''')
print('done')
"""
    fresh(script)


def engine_sql(outdir, query):
    d = os.path.join(outdir, query)
    fs = sorted(os.path.join(d, f) for f in os.listdir(d)
                if f.endswith(".parquet"))
    return "SELECT * FROM read_parquet(" + repr(fs) + ")"


# ------------------------------------------------- generic per-doc slicing
def run_generic(outdir, sfdir, query, sql, col, k, mem, table="documents"):
    eng = engine_sql(outdir, query)
    ok = True
    for i in range(k):
        got = bighash_pair(
            sfdir, sql,
            f"SELECT * FROM ({eng}) q WHERE {col} % {k} = {i}", mem,
            slice_pred=(table, f"{col} % {k} = {i}"))
        match = got["a"] == got["b"]
        ok = ok and match
        print(f"[sliced] {query} slice {i}/{k}: oracle n={got['a'][1]} "
              f"engine n={got['b'][1]} {'OK' if match else 'MISMATCH ' + json.dumps(got)}",
              flush=True)
    return ok


# ---------------------------------------------------- q_lm_bucket staging
LM_BG = """
WITH t AS (SELECT doc_id,
        regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]') AS l
      FROM documents WHERE doc_id % {k} = {i}),
tok AS (SELECT doc_id, i, lower(l[i]) AS w
        FROM t, unnest(range(1, len(l) + 1)) u(i)),
b AS (SELECT doc_id, w AS w1,
        lead(w) OVER (PARTITION BY doc_id ORDER BY i) AS w2 FROM tok)
SELECT doc_id, w1, w2 FROM b WHERE w2 IS NOT NULL"""

LM_SLICE_COUNT = ("SELECT w1, w2, CAST(count(*) AS BIGINT) AS c "
                  f"FROM ({LM_BG}) GROUP BY 1, 2")

LM_CB = """SELECT w1, w2, CAST(sum(c) AS BIGINT) AS c_bigram
FROM read_parquet('{parts}') GROUP BY 1, 2"""

LM_CBL = """SELECT cb.w1, cb.w2, cb.c_bigram, cl.c_w1
FROM cbv cb JOIN (SELECT w1, CAST(sum(c_bigram) AS BIGINT) AS c_w1
                  FROM cbv GROUP BY 1) cl USING (w1)"""

LM_A = f"""
WITH bg AS ({LM_BG}),
sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(sum(CAST(floor(c_bigram::DOUBLE / c_w1 * 1e6) AS BIGINT))
           AS BIGINT) AS sq
       FROM bg JOIN cblv USING (w1, w2) GROUP BY doc_id)
SELECT d.doc_id,
  CAST(COALESCE(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
  COALESCE(CAST(sc.sq AS DOUBLE) / sc.n_bigrams, 0.0) AS score
FROM (SELECT doc_id FROM documents WHERE doc_id % {{k}} = {{i}}) d
LEFT JOIN sc ON d.doc_id = sc.doc_id"""

LM_FINAL = """
WITH cuts AS (SELECT quantile_cont(score, CAST(1 AS DOUBLE) / 3) AS t1,
                     quantile_cont(score, CAST(2 AS DOUBLE) / 3) AS t2
              FROM av)
SELECT doc_id, n_bigrams, floor((score) * 10000.0 + 0.5) / 10000.0 AS score,
  CASE WHEN score > t2 THEN 'head'
       WHEN score > t1 THEN 'middle' ELSE 'tail' END AS bucket
FROM av, cuts"""


def run_lm_bucket(outdir, sfdir, query, sql, k, mem, selfcheck):
    work = tempfile.mkdtemp(prefix="sliced_lm_")
    try:
        # (1) per-slice bigram counts — the 800M-row window runs 1/K at a time
        for i in range(k):
            copy_stage(sfdir, LM_SLICE_COUNT.format(k=k, i=i),
                       f"{work}/bgc_{i}.parquet", mem)
            print(f"[sliced] {query}: bigram counts slice {i}/{k} done", flush=True)
        # (2) the global model: additive sum of the disjoint slice counts
        copy_stage(sfdir, LM_CB.format(parts=f"{work}/bgc_*.parquet"),
                   f"{work}/cb.parquet", mem)
        copy_stage(sfdir, LM_CBL, f"{work}/cbl.parquet", mem,
                   extra=[("cbv", f"{work}/cb.parquet")])
        print(f"[sliced] {query}: global bigram model materialized", flush=True)
        # (3) per-slice per-doc scores against the stored model
        for i in range(k):
            copy_stage(sfdir, LM_A.format(k=k, i=i),
                       f"{work}/a_{i}.parquet", mem,
                       extra=[("cblv", f"{work}/cbl.parquet")])
            print(f"[sliced] {query}: scores slice {i}/{k} done", flush=True)
        # (4) cuts + final over the per-doc table; compare vs engine dump
        got = bighash_pair(
            sfdir, LM_FINAL, engine_sql(outdir, query), mem,
            extra=[("av", f"{work}/a_*.parquet")])
        ok = got["a"] == got["b"]
        print(f"[sliced] {query}: oracle n={got['a'][1]} h={got['a'][2]} | "
              f"engine n={got['b'][1]} h={got['b'][2]} | "
              f"{'OK' if ok else 'MISMATCH'}")
        if selfcheck:
            chk = bighash_pair(sfdir, LM_FINAL, sql, mem,
                               extra=[("av", f"{work}/a_*.parquet")])
            same = chk["a"] == chk["b"]
            print(f"[sliced] {query} selfcheck: sliced == verbatim "
                  f"{'OK' if same else 'MISMATCH ' + json.dumps(chk)}")
            ok = ok and same
        return ok
    finally:
        shutil.rmtree(work, ignore_errors=True)


# ------------------------------------- q_pq_code: xs-stratified, cb full
def run_pq_code(outdir, sfdir, query, sql, k, mem, selfcheck):
    """Stratify the xs CTE (the 2M query vectors) by vec_id % K while the
    codebook CTE keeps reading the FULL embeddings table: per-(vec_id,sub)
    argmin depends only on that vector and the whole codebook, and the
    output rows partition exactly by vec_id % K — so K per-slice bighash
    equalities ARE full-surface equality, with each DuckDB process holding
    a ~4e11/K-pair cross product instead of the whole thing."""
    marker = "FROM embeddings, subs),"
    if sql.count(marker) != 1:
        raise RuntimeError(f"pq_code xs CTE marker not unique: "
                           f"{sql.count(marker)} occurrences")
    eng = engine_sql(outdir, query)
    ok = True
    for i in range(k):
        sliced = sql.replace(
            marker, f"FROM embeddings, subs WHERE vec_id % {k} = {i}),")
        got = bighash_pair(
            sfdir, sliced,
            f"SELECT * FROM ({eng}) q WHERE vec_id % {k} = {i}", mem)
        match = got["a"] == got["b"]
        ok = ok and match
        print(f"[sliced] {query} stratum {i}/{k}: oracle n={got['a'][1]} "
              f"engine n={got['b'][1]} "
              f"{'OK' if match else 'MISMATCH ' + json.dumps(got)}",
              flush=True)
    if ok and selfcheck:
        got = bighash_pair(sfdir, sql, engine_sql(outdir, query), mem)
        same = got["a"] == got["b"]
        print(f"[sliced] {query} selfcheck (one-shot): "
              f"{'OK' if same else 'MISMATCH'}", flush=True)
        ok = ok and same
    return ok


# ------------------- q_cosine_neardup_lsh: bucket-stratified pair compare
def run_lsh_neardup(outdir, sfdir, query, sql, k, mem, selfcheck):
    """Both members of every output pair share one SRP bucket, so pairs
    partition exactly by bucket % K: per-slice, the oracle's b CTE keeps
    only bucket % K = i vectors (the quadratic within-bucket join runs on
    ~1/K of the candidate mass per fresh process) and the engine dump is
    filtered by vec_id_a's recomputed bucket."""
    head = "WITH b AS ("
    tail = "FROM embeddings)"
    if not sql.startswith(head) or sql.count(tail) != 1:
        raise RuntimeError("lsh_neardup SQL shape changed; update rewrite")
    bucket_expr = sql[len(head):sql.index(tail)]  # SELECT ... bucket\n
    eng = engine_sql(outdir, query)
    ok = True
    for i in range(k):
        sliced = sql.replace(head, "WITH b0 AS (", 1).replace(
            tail,
            f"FROM embeddings), b AS "
            f"(SELECT * FROM b0 WHERE bucket % {k} = {i})", 1)
        eng_sliced = (
            f"SELECT e.* FROM ({eng}) e JOIN "
            f"({bucket_expr} FROM embeddings) bb ON e.vec_id_a = bb.vec_id "
            f"WHERE bb.bucket % {k} = {i}")
        got = bighash_pair(sfdir, sliced, eng_sliced, mem)
        match = got["a"] == got["b"]
        ok = ok and match
        print(f"[sliced] {query} bucket-stratum {i}/{k}: "
              f"oracle n={got['a'][1]} engine n={got['b'][1]} "
              f"{'OK' if match else 'MISMATCH ' + json.dumps(got)}",
              flush=True)
    if ok and selfcheck:
        got = bighash_pair(sfdir, sql, engine_sql(outdir, query), mem)
        same = got["a"] == got["b"]
        print(f"[sliced] {query} selfcheck (one-shot): "
              f"{'OK' if same else 'MISMATCH'}", flush=True)
        ok = ok and same
    return ok


def main(argv):
    args = [a for a in argv if not a.startswith("--")]
    outdir, sfdir, query = args[0], args[1], args[2]
    col, k = "doc_id", 10
    mem = os.environ.get("GRAFT_DUCKDB_MEM", "60GB")
    selfcheck = "--selfcheck" in argv
    for i, a in enumerate(argv):
        if a == "--col":
            col = argv[i + 1]
        if a == "--k":
            k = int(argv[i + 1])
        if a == "--mem":
            mem = argv[i + 1]
    sql = json.load(open(f"{outdir}/oracle_sql.json"))[query]
    if query == "q_lm_bucket":
        ok = run_lm_bucket(outdir, sfdir, query, sql, k, mem, selfcheck)
    elif query == "q_pq_code":
        ok = run_pq_code(outdir, sfdir, query, sql, k, mem, selfcheck)
    elif query == "q_cosine_neardup_lsh":
        ok = run_lsh_neardup(outdir, sfdir, query, sql, k, mem, selfcheck)
    else:
        ok = run_generic(outdir, sfdir, query, sql, col, k, mem)
        if ok and selfcheck:
            # the generic mode is exact by construction (a % K predicate
            # partitions the output multiset); still, prove it end-to-end
            # against the one-shot bighash where the host allows it
            got = bighash_pair(sfdir, sql, engine_sql(outdir, query), mem)
            same = got["a"] == got["b"]
            print(f"[sliced] {query} selfcheck (one-shot): "
                  f"{'OK' if same else 'MISMATCH'}")
            ok = ok and same
    print(f"[sliced] {query}: {'OK' if ok else 'FAILED'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
