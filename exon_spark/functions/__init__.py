"""Domain scalar functions (SURVEY.md §2.4 parity surface).

DataFrame API: import and call — every function returns a Column built from
JVM-side expressions where possible (whole-stage codegen), pandas UDFs only
for ``alignment_score`` and ``locate_regex``.

SQL surface: ``exon_spark.functions.registry.register_sql_functions(spark)``
registers every function under its reference name so ``spark.sql("SELECT
reverse_complement(sequence) ...")`` works (matching the reference's
``register_udfs``, exon_context_ext.rs:192-213).
"""

from exon_spark.functions.massspec import bin_spectra, bin_vectors, contains_peak
from exon_spark.functions.quality import (
    quality_scores_to_list,
    quality_scores_to_string,
)
from exon_spark.functions.region import (
    bam_region_filter,
    bigwig_region_filter,
    chrom_match,
    cram_region_filter,
    fasta_region_filter,
    gff_region_filter,
    interval_match,
    parse_region,
    region_match,
    vcf_region_filter,
)
from exon_spark.functions.samflags import (  # noqa: F401
    SAM_FLAG_MASKS,
    is_duplicate,
    is_first_segment,
    is_last_segment,
    is_mate_reverse_complemented,
    is_mate_unmapped,
    is_properly_aligned,
    is_properly_segmented,
    is_qc_fail,
    is_reverse_complemented,
    is_secondary,
    is_segmented,
    is_supplementary,
    is_unmapped,
    sam_flag_test,
)
from exon_spark.functions.sequence import (
    alignment_score,
    gc_content,
    integer_encoding,
    locate_regex,
    reverse_complement,
    trim_polya,
)

__all__ = [
    "gc_content",
    "reverse_complement",
    "trim_polya",
    "alignment_score",
    "locate_regex",
    "integer_encoding",
    "quality_scores_to_list",
    "quality_scores_to_string",
    "contains_peak",
    "bin_vectors",
    "bin_spectra",
    "parse_region",
    "region_match",
    "chrom_match",
    "interval_match",
    "vcf_region_filter",
    "bam_region_filter",
    "cram_region_filter",
    "gff_region_filter",
    "bigwig_region_filter",
    "fasta_region_filter",
    "SAM_FLAG_MASKS",
    "sam_flag_test",
    *SAM_FLAG_MASKS.keys(),
]
