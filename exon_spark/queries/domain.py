"""Domain-function queries (SURVEY.md §2.4 surface through the oracle gate).

The driver's testdata has no FASTA/VCF files, so these queries derive
deterministic domain columns from the relational tables (md5-based DNA
sequences, SAM flags from order keys, chrom/pos from events) and run the
exon_spark function surface over them. Each has a hand-written DuckDB oracle
reproducing the reference semantics independently.

The file-format readers themselves are tested against real fixture files in
tests/ (pytest), mirroring the reference's slt corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

import exon_spark.functions as xf
from exon_spark.queries.base import QuerySpec, table

# deterministic DNA from doc_id: 16 hex chars -> 16 bases
_SEQ_SQL = (
    "upper(translate(substr(md5(cast(doc_id as string)), 1, 16),"
    " '0123456789abcdef', 'ACGTACGTACGTACGT'))"
)
_SEQ_DUCK = (
    "upper(translate(substr(md5(cast(doc_id as varchar)), 1, 16),"
    " '0123456789abcdef', 'ACGTACGTACGTACGT'))"
)


def _q12_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_SEQ_SQL).alias("seq")
    )
    return d.select(
        "doc_id",
        "seq",
        xf.reverse_complement("seq").alias("rc"),
        F.round(xf.gc_content("seq").cast("double"), 6).alias("gc"),
        F.length(xf.trim_polya("seq")).cast("int").alias("trimmed_len"),
        # joined to a scalar string so the driver's canonicalizer (pandas
        # sort_values + hash) can handle the column — list cells are
        # unhashable there (CORRECTNESS_r01.json q12/q13/q16 errors)
        F.array_join(
            F.transform(xf.integer_encoding("seq", "ACGT"), lambda x: x.cast("string")),
            ",",
        ).alias("enc"),
        xf.alignment_score("seq", "seq").alias("self_align"),
        xf.alignment_score("seq", F.substring("seq", 1, 8)).alias("prefix_align"),
    )


# Smith-Waterman oracle shortcuts: SW(s, s) == len(s); SW(s, s[0:8]) == 8
# (exact substring ⇒ all-match local alignment; match=+1).
Q12_ORACLE = f"""
with d as (select doc_id, {_SEQ_DUCK} as seq from documents)
select doc_id, seq,
       translate(reverse(seq), 'ACGTacgt', 'TGCAtgca') as rc,
       round(cast(length(seq) - length(translate(seq, 'GC', '')) as double)
             / length(seq), 6) as gc,
       cast(length(regexp_replace(seq, '[Aa]+$', '')) as int) as trimmed_len,
       array_to_string(list_transform(range(1, length(seq) + 1),
                      i -> cast(instr('ACGT', substr(seq, i, 1)) - 1 as int)), ',') as enc,
       cast(length(seq) as int) as self_align,
       8 as prefix_align
from d
"""


def _q13_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr("substr(md5(concat(cast(doc_id as string), '-q')), 1, 16)").alias("qual"),
    )
    quals = xf.quality_scores_to_list("qual")
    mean_q = F.round(
        F.aggregate(quals, F.lit(0), lambda a, x: a + x).cast("double")
        / F.size(quals),
        6,
    )
    return (
        d.select(
            "doc_id",
            "qual",
            # scalar string form — see q12 'enc' note on the driver canonicalizer
            F.array_join(
                F.transform(quals, lambda x: x.cast("string")), ","
            ).alias("quals"),
            mean_q.alias("mean_q"),
            (xf.quality_scores_to_string(quals) == F.col("qual")).alias("roundtrip_ok"),
        )
        .filter(F.col("mean_q") >= 40.0)
    )


Q13_ORACLE = """
with d as (
  select doc_id, substr(md5(concat(cast(doc_id as varchar), '-q')), 1, 16) as qual
  from documents
),
q as (
  select doc_id, qual,
         list_transform(range(1, length(qual) + 1),
                        i -> ascii(substr(qual, i, 1)) - 33) as quals
  from d
)
select doc_id, qual, array_to_string(quals, ',') as quals,
       round(cast(list_sum(quals) as double) / len(quals), 6) as mean_q,
       array_to_string(list_transform(quals, s -> chr(s + 33)), '') = qual as roundtrip_ok
from q
where round(cast(list_sum(quals) as double) / len(quals), 6) >= 40.0
"""


def _q14_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders").select(
        (F.col("o_orderkey") % 4096).cast("int").alias("flag")
    )
    aggs = [
        F.count_if(getattr(xf, name)("flag")).alias(f"n_{name[3:]}")
        for name in xf.SAM_FLAG_MASKS
    ]
    return o.agg(F.count("*").alias("n_total"), *aggs)


Q14_ORACLE = "select count(*) as n_total, " + ", ".join(
    f"count(*) filter (where (cast(o_orderkey % 4096 as int) & {mask}) != 0)"
    f" as n_{name[3:]}"
    for name, mask in xf.SAM_FLAG_MASKS.items()
) + " from orders"


def _q15_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = table(spark, sf_dir, "events").select(
        F.element_at(
            F.array(F.lit("1"), F.lit("2"), F.lit("17"), F.lit("20"), F.lit("X")),
            (F.col("user_id") % 5).cast("int") + 1,
        ).alias("chrom"),
        (F.floor(F.col("value") * 10000).cast("bigint") + 1).alias("pos"),
        "value",
    )
    hits = e.filter(xf.region_match("chrom", "pos", "17:100000-3000000"))
    return hits.agg(
        F.count("*").alias("n_hits"),
        F.round(
            F.sum(F.round("value", 6).cast("decimal(38,10)")).cast("double"), 4
        ).alias("sum_value"),
        F.count_if(
            xf.bam_region_filter("17:100000-3000000", "chrom", "pos", "pos")
        ).alias("n_overlap"),
    )


Q15_ORACLE = """
with e as (
  select (['1','2','17','20','X'])[cast(user_id % 5 as int) + 1] as chrom,
         cast(floor(value * 10000) as bigint) + 1 as pos,
         value
  from events
)
select count(*) as n_hits,
       round(cast(sum(cast(round(value, 6) as decimal(38,10))) as double), 4) as sum_value,
       count(*) filter (where chrom = '17' and pos <= 3000000 and pos >= 100000) as n_overlap
from e
where chrom = '17' and pos between 100000 and 3000000
"""


def _q16_spark(spark: SparkSession, sf_dir: str) -> DataFrame:
    # bin_spectra = the scale spelling of bin_vectors + contains_peak: one
    # posexplode + codegen'd wide aggregate instead of the per-row HOF that
    # traverses the array once per bin in interpreted evaluation (sf10:
    # 15.3s -> ~3s; the scalar functions stay slt-pinned). The mz/intensity
    # maps run post-explode as plain codegen'd scalars. Intensities are
    # integer-valued (round(mz, 0)) so the bin sums are exact in double and
    # the oracle hash matches bit-for-bit (no FP sum-order sensitivity).
    binned = xf.bin_spectra(
        table(spark, sf_dir, "embeddings"),
        "embedding",
        100.0,
        8,
        25.0,
        mz=lambda x: F.round(F.lit(200.0) + x.cast("double") * 100.0, 6),
        intensity=lambda m: F.round(m, 0),
        peak=250.0,
        tol=5.0,
    )
    return binned.select(
        "vec_id",
        "has_peak",
        # bins are integer-valued; emit as a comma-joined bigint string so
        # the driver canonicalizer can hash it
        F.array_join(
            F.transform("bins", lambda x: x.cast("bigint").cast("string")), ","
        ).alias("bins"),
    )


Q16_ORACLE = """
with em as (
  select vec_id,
         list_transform(embedding, x -> round(200.0 + cast(x as double) * 100.0, 6)) as mz
  from embeddings
)
select vec_id,
       len(list_filter(mz, x -> abs(x - 250.0) <= 5.0)) > 0 as has_peak,
       array_to_string(list_transform(range(0, 8), b -> cast(coalesce(list_sum(
           list_transform(list_filter(mz, x -> x >= 100.0 and x <= 100.0 + 8 * 25.0
                          and cast(floor((x - 100.0) / 25.0) as int) = b),
                          x -> round(x, 0))), 0.0) as bigint)), ',') as bins
from em
"""


DOMAIN_QUERIES: list[QuerySpec] = [
    QuerySpec("q12_sequence_ops", _q12_spark, Q12_ORACLE, "sequence UDF surface"),
    QuerySpec("q13_quality_filter", _q13_spark, Q13_ORACLE, "phred decode/encode + filter"),
    QuerySpec("q14_samflag_summary", _q14_spark, Q14_ORACLE, "13 SAM-flag predicates"),
    QuerySpec("q15_region_query", _q15_spark, Q15_ORACLE, "region predicates"),
    QuerySpec("q16_mass_spec", _q16_spark, Q16_ORACLE, "contains_peak + bin_vectors"),
]
