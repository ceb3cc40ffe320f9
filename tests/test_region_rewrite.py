"""Raw-coordinate predicate → region rewrite (the reference's
designed-but-never-compiled chrom_optimizer_rule:
docs/vcf_expression_rewriting.md rules A-K, SURVEY.md §4.6).

``chrom = 'X' AND pos BETWEEN lo AND hi`` (and >=/<= spellings) must drive
the same tabix index pruning as the explicit ``vcf_region_filter`` form —
without the user spelling the UDF. The rewrite is optimization-only: the
residual SQL predicate still runs, so every test also checks values."""

from __future__ import annotations

import random

import pytest

from exon_spark.session import (
    ExonSession,
    _raw_rewrite_target,
    _regions_from_raw_predicates,
)


# ---------------------------------------------------------------- parse unit


@pytest.mark.parametrize(
    "sql,expect",
    [
        # rule E/I composition: chrom eq + BETWEEN
        ("SELECT * FROM t WHERE chrom = 'chr1' AND pos BETWEEN 10 AND 20", ["chr1:10-20"]),
        # >= / <= pair (rules C+D+I)
        ("SELECT * FROM t WHERE chrom = 'chr1' AND pos >= 10 AND pos <= 20", ["chr1:10-20"]),
        # rule A alone: whole-sequence region
        ("SELECT * FROM t WHERE chrom = 'chr1'", ["chr1"]),
        # rule B: pos equality → point interval
        ("SELECT * FROM t WHERE chrom = 'chr1' AND pos = 5", ["chr1:5-5"]),
        # rule D alone: open upper bound
        ("SELECT * FROM t WHERE chrom = 'chr1' AND pos >= 100", ["chr1:100"]),
        # rule C alone: lower bound defaults to 1
        ("SELECT * FROM t WHERE chrom = 'chr1' AND pos <= 100", ["chr1:1-100"]),
        # intersection of multiple intervals (rule I)
        (
            "SELECT * FROM t WHERE chrom = 'c' AND pos BETWEEN 1 AND 50 AND pos >= 10",
            ["c:10-50"],
        ),
        # BAM/GFF column spellings
        ("SELECT * FROM t WHERE reference_name = 'chr2' AND start >= 7", ["chr2:7"]),
        ("SELECT * FROM t WHERE seqname = 'chr3'", ["chr3"]),
        # ambiguous / unsupported → no pushdown
        ("SELECT * FROM t WHERE chrom = 'a' AND chrom = 'b'", []),
        ("SELECT * FROM t WHERE pos >= 10", []),
        ("SELECT count(*) FROM t", []),
        # contradictory interval (rule K false case) → leave plan alone
        ("SELECT * FROM t WHERE chrom = 'c' AND pos BETWEEN 20 AND 10", []),
    ],
)
def test_regions_from_raw_predicates(sql, expect):
    assert _regions_from_raw_predicates(sql) == expect


# ------------------------------------------------------------- rewrite gate
# The rewrite must NOT fire when the coordinate text is not a top-level
# WHERE conjunct of a single-table statement: CASE WHEN expressions,
# joins (the region would wrongly prune the OTHER table too), subqueries,
# comma-FROM, or a predicate on a table that isn't the one registered.


@pytest.mark.parametrize(
    "sql",
    [
        # coordinate text inside CASE WHEN is not a filter
        "SELECT CASE WHEN chrom = 'chr1' THEN 1 ELSE 0 END AS f FROM t",
        # join: predicate constrains one side only — binding both is wrong
        "SELECT * FROM t JOIN u ON t.gene = u.gene "
        "WHERE t.chrom = 'chr1' AND t.pos <= 100",
        # comma-FROM is a join too
        "SELECT * FROM t, u WHERE t.chrom = 'chr1' AND t.pos <= 100",
        # subquery: inner predicate must not escape to the outer table
        "SELECT * FROM t WHERE gene IN "
        "(SELECT gene FROM u WHERE chrom = 'chr1' AND pos <= 100)",
        # EXISTS subquery
        "SELECT * FROM t WHERE EXISTS "
        "(SELECT 1 FROM u WHERE u.chrom = 'chr1' AND u.pos = t.pos)",
        # UNION arms may have different tables
        "SELECT * FROM t WHERE chrom = 'chr1' UNION ALL SELECT * FROM u",
    ],
)
def test_raw_rewrite_gate_bails(sql):
    regions, table = _raw_rewrite_target(sql, ["t", "u"])
    assert regions == [] and table is None


def test_raw_rewrite_gate_accepts_single_table():
    regions, table = _raw_rewrite_target(
        "SELECT chrom, pos FROM t WHERE chrom = 'chr1' AND pos BETWEEN 5 AND 9"
        " ORDER BY pos LIMIT 10",
        ["t", "u"],
    )
    assert regions == ["chr1:5-9"] and table == "t"
    # coordinate text in the select list alone (no WHERE) must not fire
    regions, table = _raw_rewrite_target(
        "SELECT concat(chrom, ':', pos) FROM t", ["t"]
    )
    assert regions == []
    # two registered tables referenced → ambiguous → bail
    regions, table = _raw_rewrite_target(
        "SELECT * FROM t WHERE chrom = 'chr1' AND gene = 'u'", ["t", "u"]
    )
    assert regions == [] and table is None
    # scan-UDTF argument commas are not a comma-join
    regions, table = _raw_rewrite_target(
        "SELECT * FROM vcf_scan('f.vcf.gz', 'parse_info=true') AS t "
        "WHERE chrom = 'chr1' AND pos <= 100",
        ["t"],
    )
    assert regions == ["chr1:1-100"] and table == "t"


# ---------------------------------------------------------- end-to-end prune


@pytest.fixture(scope="module")
def indexed_vcf_table(tmp_path_factory):
    root = tmp_path_factory.mktemp("raw_pred")
    plain = root / "raw.vcf"
    rng = random.Random(7)
    lines = [
        "##fileformat=VCFv4.2",
        "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO",
    ]
    expected: dict[str, list[int]] = {}
    for chrom in ("1", "9"):
        positions = sorted(rng.sample(range(1, 2_000_000), 800))
        expected[chrom] = positions
        for pos in positions:
            lines.append(f"{chrom}\t{pos}\t.\tA\tT\t50\tPASS\tDP=5")
    plain.write_text("\n".join(lines) + "\n")

    from exon_spark.sources.bgzf import bgzip_file
    from exon_spark.sources.indexes import build_tabix_vcf

    gz = root / "raw.vcf.gz"
    bgzip_file(str(plain), str(gz))
    build_tabix_vcf(str(gz))
    return gz, expected


def test_raw_predicate_prunes_and_matches(spark, indexed_vcf_table, monkeypatch):
    gz, expected = indexed_vcf_table
    sess = ExonSession(spark)
    sess.sql(
        f"CREATE EXTERNAL TABLE raw_vcf STORED AS INDEXED_VCF LOCATION '{gz}'"
    )
    try:
        # observe the regions option the rewrite binds into the reader
        import exon_spark.sources as sources

        seen: list[str] = []
        real_read_format = sources.read_format

        def spy(spark_, fmt, path, **options):
            if "regions" in options:
                seen.append(options["regions"])
            return real_read_format(spark_, fmt, path, **options)

        monkeypatch.setattr(sources, "read_format", spy)

        lo, hi = 250_000, 750_000
        rows = sess.sql(
            "SELECT chrom, pos FROM raw_vcf "
            f"WHERE chrom = '9' AND pos BETWEEN {lo} AND {hi}"
        ).collect()
        assert seen == [f"9:{lo}-{hi}"], "raw predicate must rebind the reader"
        want = [p for p in expected["9"] if lo <= p <= hi]
        assert sorted(r.pos for r in rows) == want
        assert {r.chrom for r in rows} == {"9"}

        # >= / <= spelling drives the same rewrite
        seen.clear()
        n = sess.sql(
            "SELECT count(*) AS n FROM raw_vcf "
            f"WHERE chrom = '9' AND pos >= {lo} AND pos <= {hi}"
        ).collect()[0].n
        assert seen == [f"9:{lo}-{hi}"]
        assert n == len(want)

        # OR disables the rewrite; INDEXED_VCF requires a region at scan
        # time, so run the OR case over a plain VCF view of the same file
        # and check values stay correct without any pushdown
        sess.sql(
            f"CREATE EXTERNAL TABLE raw_vcf_plain STORED AS VCF LOCATION '{gz}'"
        )
        seen.clear()
        n_or = sess.sql(
            "SELECT count(*) AS n FROM raw_vcf_plain "
            f"WHERE chrom = '9' AND (pos <= {lo} OR pos >= {hi})"
        ).collect()[0].n
        assert seen == []
        assert n_or == sum(1 for p in expected["9"] if p <= lo or p >= hi)
        sess.sql("DROP TABLE raw_vcf_plain")
    finally:
        sess.sql("DROP TABLE raw_vcf")
