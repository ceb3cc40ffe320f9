"""Formats whose codecs are unavailable in this environment — registered so
the SQL/DDL surface exists with the right schemas, with clearly-marked
NotImplementedError reads and guidance.

* CRAM (reference: datasources/cram/, needs a FASTA reference + rANS/codec
  stack; exon_context_ext.rs:985-996) — pysam-based decode when available.
"""

from __future__ import annotations

from exon_spark.sources.base import FileFormatSource


class CramSource(FileFormatSource):
    NAME = "cram"
    EXTENSIONS = ("cram",)
    # schema parity with SAM/BAM (exon-sam/src/schema_builder.rs:383-397)
    BASE_SCHEMA = (
        "name string, flag int, reference string, start bigint, end bigint, "
        "mapping_quality string, cigar string, mate_reference string, "
        "sequence string, quality_score array<bigint>, "
        "tags array<struct<tag string, value string>>"
    )

    @classmethod
    def parse_partition(cls, partition, options):
        try:
            import pysam  # type: ignore  # noqa: F401
        except ImportError:
            raise NotImplementedError(
                "CRAM decoding requires pysam (not in this environment). "
                "Convert with 'samtools view -b' to BAM and use format 'bam', "
                "or install pysam and pass .option('reference', 'ref.fasta')."
            )
        ref = options.get("reference")
        with pysam.AlignmentFile(
            partition.path, "rc", reference_filename=ref
        ) as af:  # pragma: no cover - needs pysam
            for r in af:
                yield {
                    "name": r.query_name,
                    "flag": r.flag,
                    "reference": r.reference_name,
                    "start": None if r.reference_start < 0 else r.reference_start + 1,
                    "end": r.reference_end,
                    "mapping_quality": str(r.mapping_quality),
                    "cigar": r.cigarstring or "",
                    "mate_reference": r.next_reference_name,
                    "sequence": r.query_sequence or "",
                    "quality_score": list(r.query_qualities or []),
                    "tags": [
                        {"tag": t, "value": str(v)} for t, v in (r.tags or [])
                    ]
                    or None,
                }
