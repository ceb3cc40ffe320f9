"""Local replica of the driver's correctness gate: run every query's Spark
implementation AND its DuckDB oracle at a given scale factor, compare row
count, column names and (order-insensitive) values.

Usage: python tools/check_correctness.py [--sf /root/testdata/sf0.01] [names...]
"""

from __future__ import annotations

import argparse
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd


def normalize(df: pd.DataFrame) -> list[tuple]:
    df = df[sorted(df.columns)]

    def norm_val(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            # Tag floats so 38.0 (a DuckDB HUGEINT sum widened to float64 in
            # pandas) does NOT compare equal to Spark's bigint 38 — the
            # driver's value-hasher is dtype-sensitive and flags exactly this
            # drift (q32 was red at the driver for two rounds while == -based
            # local comparison stayed green). Local red must predict driver
            # red.
            return ("f", round(v, 6))
        if isinstance(v, (list, tuple)):
            return tuple(norm_val(x) for x in v)
        if hasattr(v, "tolist"):  # numpy arrays from duckdb/spark
            return tuple(norm_val(x) for x in v.tolist())
        if isinstance(v, dict):
            return tuple(sorted((k, norm_val(x)) for k, x in v.items()))
        return v

    rows = [tuple(norm_val(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=repr)


# ---------------------------------------------------------------------------
# Big-oracle mode (r11, VERDICT r10 order 1): alternative oracle
# implementations for the queries whose plain-SQL oracles are intractable in
# DuckDB at sf10 (the r10 skips). Each is EXACT, not approximate — a
# different algorithm for the same definition — and is cross-checked against
# the plain SQL oracle at small SF by test_big_oracles_match_sql_oracles.
# ---------------------------------------------------------------------------


def _q31_big_oracle(con: "duckdb.DuckDBPyConnection", sf_dir: str) -> pd.DataFrame:
    """Connected components via driver-side union-find over the DuckDB
    pair list, replacing the recursive-CTE transitive closure (which
    builds O(n*m) reach rows and spilled >60 GB at 500k docs). The pair
    extraction (minhash LSH + jaccard verify) stays in DuckDB; the
    closure is a 20-line union-find over the dup pairs — bounded by the
    dup RATE, not the corpus."""
    from exon_spark.queries.pipeline import _MINHASH_PAIRS_CTES

    pairs = con.execute(
        f"with {_MINHASH_PAIRS_CTES} select doc_a, doc_b from pairs"
    ).fetchall()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # min-root union
    comp_min: dict[int, int] = {}
    for x in parent:
        r = find(x)
        comp_min[r] = min(comp_min.get(r, x), x)
    rows = sorted((x, comp_min[find(x)]) for x in parent)
    return pd.DataFrame(rows, columns=["doc_id", "cluster_id"])


def _q37_big_oracle(
    con: "duckdb.DuckDBPyConnection",
    sf_dir: str,
    shards: int = 16,
    doc_shards: int = 8,
) -> pd.DataFrame:
    """Double-sharded spelling of the q37 oracle: the all-ngram index
    (dupg: group EVERY 8-gram of the corpus) OOMed DuckDB at 500k docs,
    and so did the monolithic final assembly (otok + string_agg
    reassembles every document's text in one query). Phase 1
    hash-partitions the GRAM universe into ``shards`` disjoint slices —
    the dup-window extraction is a pure per-gram function, so per-shard
    results union to exactly the unsharded ``dup`` CTE; the gram stream
    is spilled to a temp parquet once so each shard pass is a
    scan+filter, not a re-tokenization. Phase 2 partitions the FINAL
    per-doc assembly by doc_id — per-doc rows depend only on the shared
    (small) dup table, so doc shards concatenate to the exact result."""
    import os
    import tempfile

    from exon_spark.queries.pipeline import _BOILERPLATE, _Q37_GRAM

    # bound DuckDB so big intermediates spill instead of malloc-failing
    # (the sf10 box also carries a 24g Spark JVM); session-level, sticky
    con.execute("set preserve_insertion_order=false")
    con.execute(f"set temp_directory='{tempfile.gettempdir()}/duckdb_q37_spill'")
    con.execute("set memory_limit='48GB'")

    base = f"""planted as (
  select doc_id,
         case when doc_id % 7 = 2 then text || ' {_BOILERPLATE}'
              else text end as text
  from documents
),
tok as (
  select doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') as toks
  from planted
)"""
    gram_expr = _Q37_GRAM.replace("toks[i+0]", "toks[i]")
    tmp = tempfile.mkdtemp(prefix="q37_oracle_")
    gpath = os.path.join(tmp, "g.parquet")
    try:
        con.execute(
            f"""copy (
  with {base}
  select doc_id, i as pos, {gram_expr} as gram
  from tok, unnest(range(1, greatest(len(toks) - 7, 0) + 1)) as t(i)
) to '{gpath}' (format parquet)"""
        )
        con.execute(
            "create or replace temp table q37_dup "
            "(doc_id bigint, pos bigint, keep_doc bigint)"
        )
        for s in range(shards):
            con.execute(
                f"""insert into q37_dup
with gs as (
  select * from '{gpath}' where hash(gram) % {shards} = {s}
),
dupg as (
  select gram, min(doc_id) as keep_doc
  from gs group by gram having count(distinct doc_id) >= 2
)
select gs.doc_id, gs.pos, d.keep_doc from gs join dupg d using (gram)"""
            )
        parts = []
        for ds in range(doc_shards):
            parts.append(
                con.execute(
                    f"""with {base},
dup as (select * from q37_dup where doc_id % {doc_shards} = {ds}),
docs_s as (select * from tok where doc_id % {doc_shards} = {ds}),
cov as (
  select doc_id, count(*) as covered_tokens from (
    select distinct doc_id, pos + k as p
    from dup, unnest(range(0, 8)) as u(k)
  ) group by doc_id
),
wins as (select doc_id, count(*) as n_dup_ngrams from dup group by doc_id),
rem as (
  select distinct doc_id, pos + k as p
  from dup, unnest(range(0, 8)) as u(k)
  where doc_id != keep_doc
),
otok as (
  select doc_id,
         unnest(range(1, len(arr) + 1)) as tokpos,
         unnest(arr) as tok
  from (select doc_id, regexp_split_to_array(trim(text), '\\s+') as arr
        from planted where doc_id % {doc_shards} = {ds})
),
red as (
  select o.doc_id, string_agg(o.tok, ' ' order by o.tokpos) as text,
         count(*) as n_kept
  from otok o left join rem r on o.doc_id = r.doc_id and o.tokpos = r.p
  where r.doc_id is null
  group by o.doc_id
),
nt as (select doc_id, cast(len(toks) as int) as n_toks from docs_s)
select nt.doc_id, nt.n_toks,
       coalesce(w.n_dup_ngrams, 0) as n_dup_ngrams,
       coalesce(c.covered_tokens, 0) as covered_tokens,
       round(cast(coalesce(c.covered_tokens, 0) as double)
             / greatest(nt.n_toks, 1), 6) as covered_frac,
       coalesce(red.text, '') as text,
       cast(nt.n_toks - coalesce(red.n_kept, 0) as int) as n_removed
from nt
left join cov c on nt.doc_id = c.doc_id
left join wins w on nt.doc_id = w.doc_id
left join red on nt.doc_id = red.doc_id"""
                ).df()
            )
        out = pd.concat(parts, ignore_index=True)
    finally:
        try:
            os.unlink(gpath)
            os.rmdir(tmp)
        except OSError:
            pass
    return out


BIG_ORACLES = {
    "q31_dedup_clusters": _q31_big_oracle,
    "q37_dup_ngram_coverage": _q37_big_oracle,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--big-oracle",
        action="store_true",
        help="use the sf10-tractable alternative oracles where one exists",
    )
    ap.add_argument(
        "--duck-mem",
        default=None,
        help="cap DuckDB memory (e.g. 48GB) and route spills to a temp dir "
        "— required for sf100-class oracle runs that would otherwise "
        "malloc-fail next to the Spark JVM",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    from exon_spark import get_spark
    from exon_spark.queries import ALL_QUERIES, TABLES

    spark = get_spark(app_name="check-correctness")
    con = duckdb.connect()
    if args.duck_mem:
        import tempfile

        con.execute("set preserve_insertion_order=false")
        con.execute(
            f"set temp_directory='{tempfile.gettempdir()}/duckdb_gate_spill'"
        )
        con.execute(f"set memory_limit='{args.duck_mem}'")
    for t in TABLES:
        try:
            con.execute(
                f"create or replace view {t} as select * from '{args.sf}/{t}.parquet'"
            )
        except duckdb.Error:
            # partial replicas (sf100 keeps only documents/embeddings/
            # events + dims for disk) — queries over missing tables will
            # fail individually with a clear message
            print(f"# view {t}: missing at {args.sf}, skipped", file=sys.stderr)

    names = args.names or list(ALL_QUERIES)
    failures = 0
    for name in names:
        spec = ALL_QUERIES[name]
        try:
            sdf = spec.spark_fn(spark, args.sf).toPandas()
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(sdf)} rows (no oracle — rows-only)")
            continue
        try:
            if args.big_oracle and name in BIG_ORACLES:
                odf = BIG_ORACLES[name](con, args.sf)
            else:
                odf = con.execute(spec.oracle).df()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            failures += 1
            continue
        if len(sdf) != len(odf):
            print(f"FAIL  {name}: row count {len(sdf)} vs oracle {len(odf)}")
            failures += 1
            continue
        if sorted(sdf.columns) != sorted(odf.columns):
            print(
                f"FAIL  {name}: columns {sorted(sdf.columns)} vs {sorted(odf.columns)}"
            )
            failures += 1
            continue
        a, b = normalize(sdf), normalize(odf)
        if a != b:
            bad = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
            print(f"FAIL  {name}: value mismatch at sorted-row {bad}:")
            print(f"      spark : {a[bad]}")
            print(f"      oracle: {b[bad]}")
            failures += 1
            continue
        print(f"OK    {name}: {len(sdf)} rows")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
