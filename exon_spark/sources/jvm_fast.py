"""JVM-side fast paths for text formats (no Python in the data path).

The Python DataSources (fasta.py, vcf.py, ...) are the fully-featured
readers: header-driven schemas, index-pruned region scans, integer
encodings. But for the *plain scan* case their per-record Python parse is
the bottleneck (~20x slower per record than the reference's Rust parsers).

These readers express the same parse as Column expressions over
``spark.read.text`` / ``spark.read.csv`` — whole-stage-codegen'd, Arrow-free,
zero Python workers — and are used by ``read_format`` automatically when no
Python-only option (regions, sequence_data_type, parse_info) is requested.
Schemas are identical to the DataSource schemas, so callers can't tell
which path served them. gzip input is decompressed by the JVM codec;
uncompressed input splits by byte range (Hadoop line reader semantics), so
a single large file fans out across executors — same scale behavior as the
reference's regrouped file scans (SURVEY.md §4.4).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession


def _partition_cols(df: DataFrame, data_col: str = "value") -> list[str]:
    return [c for c in df.columns if c != data_col]


def read_fasta_jvm(spark: SparkSession, path: str) -> DataFrame:
    """FASTA via lineSep='>': one text row per record, then pure Column
    expressions (schema: id, description, sequence — config.rs:166-168).

    The record is parsed with instr/substring/replace on the raw buffer —
    no split-to-array — and the (header, sequence) pair is pinned behind an
    ``explode(array(struct(...)))`` Generate barrier so the id/description
    projections reference the computed header instead of Catalyst inlining
    the substring chain into each (measured 30% faster than the
    split + array_join formulation)."""
    txt = spark.read.option("lineSep", ">").text(path)
    parts = _partition_cols(txt)
    hpos = F.instr("value", "\n")
    header = F.replace(
        F.when(hpos > 0, F.substring("value", F.lit(1), hpos - 1)).otherwise(
            F.col("value")
        ),
        F.lit("\r"),
        F.lit(""),
    )
    seq = F.when(
        hpos > 0,
        F.replace(
            F.replace(
                F.expr("substring(value, instr(value, '\\n') + 1)"),
                F.lit("\r"),
                F.lit(""),
            ),
            F.lit("\n"),
            F.lit(""),
        ),
    ).otherwise(F.lit(""))
    rec = (
        txt.filter(F.length(F.trim(F.col("value"))) > 0)
        .select(
            F.explode(
                F.array(F.struct(header.alias("h"), seq.alias("s")))
            ).alias("r"),
            *parts,
        )
    )
    sp = F.instr("r.h", " ")
    return rec.select(
        F.when(sp > 0, F.expr("substring(r.h, 1, instr(r.h, ' ') - 1)"))
        .otherwise(F.col("r.h"))
        .alias("id"),
        F.when(
            sp > 0, F.nullif(F.expr("substring(r.h, instr(r.h, ' ') + 1)"), F.lit(""))
        ).alias("description"),
        F.col("r.s").alias("sequence"),
        *[F.col(c).cast("string").alias(c) for c in parts],
    )


def read_vcf_jvm(spark: SparkSession, path: str) -> DataFrame:
    """Flat VCF via the csv reader (tab sep, '#' comment lines skipped) +
    Column expressions. Schema matches VcfSource.BASE_SCHEMA
    (schema_builder.rs:88-122)."""
    df = (
        spark.read.option("sep", "\t")
        .option("comment", "#")
        .csv(path, inferSchema=False)
    )
    import re as _re

    data = [c for c in df.columns if _re.fullmatch(r"_c\d+", c)]
    parts = [c for c in df.columns if not _re.fullmatch(r"_c\d+", c)]

    def dot_null(c):
        return F.when(F.col(c).isin(".", ""), None).otherwise(F.col(c))

    arr = "array<string>"  # cast fixes containsNull to match the DataSource schema
    cols = [
        F.col("_c0").alias("chrom"),
        F.col("_c1").try_cast("bigint").alias("pos"),
        F.split(dot_null("_c2"), ";").cast(arr).alias("id"),
        F.col("_c3").alias("ref"),
        F.split(dot_null("_c4"), ",").cast(arr).alias("alt"),
        dot_null("_c5").try_cast("float").alias("qual"),
        F.split(dot_null("_c6"), ";").cast(arr).alias("filter"),
        dot_null("_c7").alias("info"),
    ]
    if len(data) > 8:
        fmt_cols = [F.col(c) for c in data[8:]]
        cols.append(
            F.nullif(F.concat_ws("\t", *fmt_cols), F.lit("")).alias("formats")
        )
    else:
        cols.append(F.lit(None).cast("string").alias("formats"))
    cols += [F.col(c).cast("string").alias(c) for c in parts]
    return df.select(*cols)


# mzML columns expressible without the base64/zlib binary decode
_MZML_META_COLS = ("id", "precursor_mz", "precusor_charge")


def read_mzml_meta_jvm(spark: SparkSession, path: str, cols) -> DataFrame:
    """mzML metadata projection via lineSep='</spectrum>': one text row per
    spectrum, metadata extracted with codegen'd regexps — no XML parse, no
    base64/zlib, no Python workers.

    This is the Spark-side mirror of the reference's projection pushdown:
    DataFusion hands ListingMzMLTable a column projection, so a
    ``COUNT(*)``/metadata query over the Rust engine never decodes peak
    arrays either (exon-mzml scan with empty projection). Spark can't push
    projections into Python DataSources, so the pruning decision rides the
    explicit ``columns`` option instead and ``read_format`` routes here
    when the projection avoids the binary-array/cv_params columns.

    Splittable like the FASTA fast path: uncompressed input scans as byte
    ranges (custom-lineSep Hadoop text semantics), so one large run file
    fans out across executors. cvParam attribute order is not fixed by the
    schema — both orders are matched.
    """
    txt = spark.read.option("lineSep", "</spectrum>").text(path)
    spec = txt.filter(F.col("value").contains("<spectrum "))

    def cv_value(acc: str):
        # [^>]*? spans attribute text (incl. newlines — cvParam elements
        # wrap, and name="... m/z" contains '/') but cannot escape the
        # element: '>' terminates it
        a = F.regexp_extract("value", f'accession="{acc}"[^>]*?value="([^"]*)"', 1)
        b = F.regexp_extract("value", f'value="([^"]*)"[^>]*?accession="{acc}"', 1)
        return F.when(a != "", a).when(b != "", b)

    exprs = {
        "id": F.regexp_extract("value", r'<spectrum\b[^>]*?\bid="([^"]*)"', 1),
        "precursor_mz": cv_value("MS:1000744").cast("double"),
        "precusor_charge": cv_value("MS:1000041").cast("bigint"),
    }
    return spec.select(*[exprs[c].alias(c) for c in cols])


def jvm_fast_reader(fmt: str, path: str, options: dict):
    """Return the JVM fast-path reader for fmt if the requested options are
    compatible with it, else None."""
    python_only = {"regions", "region", "sequence_data_type", "parse_info",
                   "parse_formats", "indexed", "file_extension"}
    if any(str(options.get(k, "")).strip() not in ("", "false")
           for k in python_only):
        return None
    from exon_spark.sources.fs import scheme_of

    scheme = scheme_of(path)
    if scheme is not None and scheme not in ("s3a", "gs", "hdfs", "abfss", "wasbs"):
        # exon_spark fs-handler schemes (s3://, mock://) are Python-side
        # only; Hadoop-native schemes pass straight through to the JVM
        return None
    comp = str(options.get("compression", "")).lower()
    if comp not in ("", "none", "gzip"):
        return None  # zstd etc. need the Python codec path
    if path.lower().endswith((".zst", ".zstd", ".bz2", ".xz")):
        return None  # no JVM codec for these here
    if comp == "gzip" and not path.lower().endswith((".gz", ".bgz")):
        return None  # JVM codecs dispatch on extension only
    if fmt == "fasta":
        # The lineSep='>' text scan IS byte-range splittable (verified:
        # 183 MB file, 32 splits, record counts agree with the Python
        # byte-range reader) and measures ~400 MB/s aggregate on 32 cores
        # — faster at every size tried (19-183 MB plain, 2.4-23 MB gzip
        # shards) than the Python DataSource route, whose Arrow pipe caps
        # ~150 MB/s aggregate here. So the JVM path keeps ALL plain/gzip
        # scans; the vectorized Python framing (fasta.py
        # read_arrow_partition) still serves scans the JVM can't take:
        # object-store schemes (s3://, mock://), regions, encodings.
        return read_fasta_jvm
    if fmt == "vcf":
        if path.lower().endswith((".gz", ".bgz")):
            from exon_spark.sources.fs import fs_exists

            if fs_exists(path + ".tbi"):
                # bgzf + tabix: the Python path splits the stream at
                # linear-index record boundaries and fans out across the
                # cluster; the JVM gzip codec is one unsplittable partition
                # per file — ~15x slower on a 2.5 GB VCF (measured)
                return None
        return read_vcf_jvm
    if fmt == "mzml":
        cols = options.get("columns")
        if isinstance(cols, str):
            cols = [c.strip() for c in cols.split(",") if c.strip()]
        if cols and set(cols) <= set(_MZML_META_COLS):
            return lambda spark, path: read_mzml_meta_jvm(spark, path, cols)
        return None  # full schema needs the Python binary-decode path
    return None
