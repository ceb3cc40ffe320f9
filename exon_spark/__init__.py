"""exon_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of wheretrue/exon (reference studied read-only at
/root/reference, v0.32.4).

Architecture (SURVEY.md §7): Spark SQL / Catalyst supplies the entire
relational layer; this package supplies

* domain scalar functions (``exon_spark.functions``) — sequence ops, quality
  scores, SAM-flag predicates, mass-spec helpers, genomic-region predicates.
  Implemented as JVM-side Column expressions wherever possible (whole-stage
  codegen; no Python in the hot path), Arrow-vectorized pandas UDFs otherwise.
* file-format data sources (``exon_spark.sources``) — FASTA/FASTQ/GFF/GTF/
  BED/SAM/VCF/… readers built on the Python DataSource API (Spark 4) with
  Arrow-batch output, file-split planning and driver-side header/index reads.
* sinks (``exon_spark.sinks``) — FASTA/FASTQ writers.
* scale-out operators (``exon_spark.operators``) — interval joins, dedup
  (exact/minhash-LSH/simhash/ngram-jaccard), embedding similarity search,
  text analysis; the "beyond-parity" LLM-data-pipeline layer.

Entry point::

    from exon_spark import register_all
    spark = SparkSession.builder.getOrCreate()
    register_all(spark)   # UDFs for the SQL surface + data sources

Reference parity map: see SURVEY.md §2 and docstrings citing
``exon/exon-core/src/...`` file:line throughout.
"""

from exon_spark.session import ExonSession, get_spark, register_all

__version__ = "0.1.0"

__all__ = ["ExonSession", "get_spark", "register_all", "__version__"]
