"""Filter-funnel accounting: apply an ordered chain of keep-predicates and
report, per rule, how many documents it dropped — the "funnel report"
every corpus-curation pipeline publishes next to its filtered output
(e.g. the RefinedWeb / Dolma processing-stage tables).

Beyond-reference layer (no exon counterpart).

100 TB design: ONE corpus scan. Each row is tagged with the index of its
first failing rule (a coalesce over the predicates — pure JVM columns),
then a groupBy on that tiny key (≤ n_rules+1 distinct values) with
map-side combine produces the entire funnel; the cumulative arithmetic
runs on the ≤ n_rules+1-row report frame. The naive spelling — one
count() per stage — scans the corpus n_rules times.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def filter_funnel(
    df: DataFrame, rules: list[tuple[str, Column]] | dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Apply ``rules`` (ordered ``name -> keep-predicate``) progressively.

    Returns ``(kept, report)``:
      * ``kept`` — rows passing EVERY predicate (a null predicate result
        counts as a fail, matching ``DataFrame.filter`` semantics).
      * ``report`` — one row per rule in application order:
        ``(rule_idx, rule, n_in, n_dropped, n_out, drop_rate)`` where
        ``n_in`` is the survivors of all earlier rules (funnel
        semantics: a doc is charged only to its FIRST failing rule).

    ``report`` is a DataFrame (collect it for display); ``kept`` shares
    the input plan and composes lazily.
    """
    items = list(rules.items()) if isinstance(rules, dict) else list(rules)
    if not items:
        raise ValueError("filter_funnel needs at least one rule")
    names = [n for n, _ in items]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")
    # null predicate -> fail (filter() would drop the row too)
    safe = [F.coalesce(p, F.lit(False)) for _, p in items]
    fail_idx = F.coalesce(
        *[F.when(~p, F.lit(i)) for i, p in enumerate(safe)],
        F.lit(len(items)),
    )
    counts = (
        df.select(fail_idx.alias("rule_idx"))
        .groupBy("rule_idx")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # spine rows 0..R-1 are the rules; row R is the survivors sentinel —
    # joining it in lets ONE window over the <= R+1-row frame recover the
    # corpus total without a second scan or a driver collect
    spine = df.sparkSession.createDataFrame(
        [(i, name) for i, name in enumerate(names)]
        + [(len(names), None)],
        "rule_idx int, rule string",
    )
    full = spine.join(counts, "rule_idx", "left").select(
        "rule_idx", "rule", F.coalesce("n", F.lit(0)).alias("n_dropped")
    )
    total = F.sum("n_dropped").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    before = F.coalesce(
        F.sum("n_dropped").over(
            Window.orderBy("rule_idx").rowsBetween(
                Window.unboundedPreceding, -1
            )
        ),
        F.lit(0),
    )
    n_in = total - before
    report = full.select(
        "rule_idx",
        "rule",
        n_in.alias("n_in"),
        "n_dropped",
        (n_in - F.col("n_dropped")).alias("n_out"),
        F.round(
            F.col("n_dropped")
            / F.greatest(n_in, F.lit(1)).cast("double"),
            6,
        ).alias("drop_rate"),
    ).where(F.col("rule_idx") < len(names))
    kept = df
    for p in safe:
        kept = kept.filter(p)
    return kept, report
