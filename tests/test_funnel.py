"""Unit tests for filter_funnel: first-failing-rule attribution, funnel
arithmetic, null-predicate semantics, kept-vs-sequential-filter parity,
and a randomized pure-Python oracle."""

from __future__ import annotations

import random

import pyspark.sql.functions as F
import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, n int, lang string")


RULES = lambda: [  # noqa: E731 — fresh Columns per test
    ("min_len", F.col("n") >= 10),
    ("lang_en", F.col("lang") == "en"),
    ("max_len", F.col("n") <= 100),
]


def test_filter_funnel_hand_computed(spark):
    from exon_spark.operators import filter_funnel

    rows = [
        (1, 5, "en"),  # fails min_len (also lang-irrelevant: charged once)
        (2, 50, "de"),  # fails lang_en
        (3, 500, "en"),  # fails max_len
        (4, 20, "en"),  # survives
        (5, 3, "de"),  # fails min_len FIRST (not lang_en)
    ]
    kept, report = filter_funnel(_docs(spark, rows), RULES())
    assert [r["doc_id"] for r in kept.collect()] == [4]
    rep = {r["rule"]: r for r in report.collect()}
    assert rep["min_len"]["n_in"] == 5
    assert rep["min_len"]["n_dropped"] == 2  # docs 1 and 5
    assert rep["lang_en"]["n_in"] == 3
    assert rep["lang_en"]["n_dropped"] == 1  # doc 2 only
    assert rep["max_len"]["n_in"] == 2
    assert rep["max_len"]["n_dropped"] == 1
    assert rep["max_len"]["n_out"] == 1
    assert rep["min_len"]["drop_rate"] == pytest.approx(0.4)
    # zero-drop rule reports 0, not a missing row
    kept2, report2 = filter_funnel(
        _docs(spark, rows), [("always", F.lit(True)), *RULES()]
    )
    rep2 = {r["rule"]: r for r in report2.collect()}
    assert rep2["always"]["n_dropped"] == 0
    assert rep2["always"]["n_in"] == 5


def test_filter_funnel_null_predicate_fails(spark):
    from exon_spark.operators import filter_funnel

    rows = [(1, None, "en"), (2, 20, "en")]
    kept, report = filter_funnel(_docs(spark, rows), RULES())
    assert [r["doc_id"] for r in kept.collect()] == [2]
    rep = {r["rule"]: r for r in report.collect()}
    assert rep["min_len"]["n_dropped"] == 1  # null n -> charged to rule 0


def test_filter_funnel_matches_sequential_filters(spark):
    from exon_spark.operators import filter_funnel

    rows = [
        (i, random.Random(i).randint(0, 120), random.Random(i * 7).choice(["en", "de"]))
        for i in range(200)
    ]
    df = _docs(spark, rows)
    kept, _ = filter_funnel(df, RULES())
    seq = df
    for _name, p in RULES():
        seq = seq.filter(p)
    assert sorted(kept.collect()) == sorted(seq.collect())


def test_filter_funnel_randomized_python_oracle(spark):
    from exon_spark.operators import filter_funnel

    rng = random.Random(80)
    rows = [
        (i, rng.choice([None, rng.randint(0, 130)]), rng.choice(["en", "de", "fr"]))
        for i in range(300)
    ]
    _, report = filter_funnel(_docs(spark, rows), RULES())

    def keep(rule, r):
        _id, n, lang = r
        if rule == "min_len":
            return n is not None and n >= 10
        if rule == "lang_en":
            return lang == "en"
        return n is not None and n <= 100

    alive = rows
    exp = []
    for name, _ in RULES():
        survivors = [r for r in alive if keep(name, r)]
        exp.append((name, len(alive), len(alive) - len(survivors), len(survivors)))
        alive = survivors
    got = [
        (r["rule"], r["n_in"], r["n_dropped"], r["n_out"])
        for r in report.orderBy("rule_idx").collect()
    ]
    assert got == exp


def test_filter_funnel_guards(spark):
    from exon_spark.operators import filter_funnel

    df = _docs(spark, [(1, 1, "en")])
    with pytest.raises(ValueError, match="at least one"):
        filter_funnel(df, [])
    with pytest.raises(ValueError, match="duplicate"):
        filter_funnel(df, [("a", F.lit(True)), ("a", F.lit(False))])


def test_filter_funnel_single_scan_plan(spark):
    """The report must scan the corpus once — the naive per-stage count()
    spelling scans it n_rules times."""
    from exon_spark.operators import filter_funnel

    df = spark.range(100).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("int").alias("n"),
        F.lit("en").alias("lang"),
    )
    _, report = filter_funnel(df, RULES())
    plan = report._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 100") == 1
