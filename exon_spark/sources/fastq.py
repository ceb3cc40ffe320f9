"""FASTQ data source.

Parity: reference ListingFASTQTable (exon/exon-core/src/datasources/fastq/;
schema exon/exon-fastq/src/config.rs:81-84: name, description, sequence,
quality_scores). One partition per file — FASTQ is not safely byte-splittable
('@' legally begins quality lines), matching the reference's file-level
parallelism.
"""

from __future__ import annotations

from collections.abc import Iterator

from exon_spark.sources.base import FileFormatSource
from exon_spark.sources.util import open_maybe_compressed


class FastqSource(FileFormatSource):
    NAME = "fastq"
    EXTENSIONS = ("fastq", "fq")
    BASE_SCHEMA = (
        "name string, description string, sequence string, quality_scores string"
    )

    @classmethod
    def parse_records(cls, path: str, compression: str, options: dict) -> Iterator[dict]:
        with open_maybe_compressed(path, compression) as fh:
            while True:
                header = fh.readline()
                if not header:
                    return
                header = header.decode("utf-8", "replace").rstrip("\r\n")
                if not header:
                    continue
                if not header.startswith("@"):
                    raise ValueError(f"{path}: malformed FASTQ header: {header!r}")
                seq = fh.readline().decode("utf-8", "replace").rstrip("\r\n")
                plus = fh.readline()
                if not plus.startswith(b"+"):
                    raise ValueError(f"{path}: malformed FASTQ separator")
                qual = fh.readline().decode("utf-8", "replace").rstrip("\r\n")
                name, _, desc = header[1:].partition(" ")
                yield {
                    "name": name,
                    "description": desc or None,
                    "sequence": seq,
                    "quality_scores": qual,
                }
