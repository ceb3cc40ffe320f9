"""FASTA data source.

Parity: reference ListingFASTATable
(exon/exon-core/src/datasources/fasta/table_provider.rs:327-342; schema
exon/exon-fasta/src/config.rs:166-168: id, description, sequence) with
``.fai``-driven region slicing (indexed_file/fai.rs:29-47) and gzip/zstd
compression.

Scale behavior matches the reference: uncompressed FASTA splits by byte
range (boundary-aligned on the next '>' header), so a single large file
parallelizes across executors; gzip input is one partition per file
(non-splittable — same cap as the reference's parallel-scan benchmark).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from exon_spark.sources.fs import fs_open
from exon_spark.sources.base import FileFormatSource, FilePartition
from exon_spark.sources.util import FoundFile, detect_compression, open_maybe_compressed

SPLIT_BYTES = 128 * 1024 * 1024


def _fasta_records_from_stream(stream) -> Iterator[dict]:
    header: str | None = None
    seq_parts: list[str] = []
    for raw in stream:
        line = raw.decode("utf-8", "replace").rstrip("\r\n")
        if line.startswith(">"):
            if header is not None:
                yield _emit(header, seq_parts)
            header = line[1:]
            seq_parts = []
        elif line:
            seq_parts.append(line)
    if header is not None:
        yield _emit(header, seq_parts)


def _emit(header: str, seq_parts: list[str]) -> dict:
    ident, _, desc = header.partition(" ")
    return {
        "id": ident,
        "description": desc or None,
        "sequence": "".join(seq_parts),
    }


# ML integer encodings (exon-fasta/src/array_builder.rs:144-205 semantics):
# DNA A=1 C=2 G=3 T=4 N=5; protein = 1-based index in A..Z minus J
_DNA_ENCODE = {"A": 1, "C": 2, "G": 3, "T": 4, "N": 5}
_PROTEIN_ENCODE = {
    c: i + 1 for i, c in enumerate("ABCDEFGHIKLMNOPQRSTUVWY")
}
_PROTEIN_ENCODE["X"] = 24
_PROTEIN_ENCODE["Z"] = 25


def _encode_sequence(seq: str, table: dict[str, int], kind: str) -> list[int]:
    try:
        return [table[c] for c in seq]
    except KeyError as e:
        raise ValueError(f"invalid {kind} character {e.args[0]!r} in sequence") from None


class FastaSource(FileFormatSource):
    NAME = "fasta"
    EXTENSIONS = ("fasta", "fa", "faa", "fna")
    BASE_SCHEMA = "id string, description string, sequence string"

    def base_schema(self) -> str:
        # config-switched sequence type (exon-fasta/src/config.rs:189-213):
        # utf8 (default) | large_utf8 | integer_encode_dna | integer_encode_protein
        sdt = str(self.options.get("sequence_data_type", "")).lower()
        if sdt.startswith("integer_encode"):
            return "id string, description string, sequence array<tinyint>"
        return self.BASE_SCHEMA

    @classmethod
    def plan_partitions(cls, f: FoundFile, options: dict) -> list[FilePartition]:
        comp = detect_compression(f.path, options.get("compression"))
        regions = options.get("regions") or options.get("region")
        if regions:
            # .fai-pruned scan: one partition per requested sequence, using
            # the byte offsets from the index (fai.rs:29-47). Regions may be
            # literal or a path to a region file (one region per line).
            from exon_spark.functions.region import expand_regions
            from exon_spark.sources.indexes import fai_byte_ranges

            parts = []
            for name, start, end in fai_byte_ranges(f.path, expand_regions(regions)):
                parts.append(
                    FilePartition(
                        path=f.path,
                        compression=comp,
                        partition_values=tuple(sorted(f.partition_values.items())),
                        start=start,
                        end=end,
                        extra=(name,),
                    )
                )
            return parts
        pv = tuple(sorted(f.partition_values.items()))
        if comp != "none" or f.size <= SPLIT_BYTES:
            return [FilePartition(f.path, comp, pv)]
        # byte-range splits for big plain FASTA; the reader aligns each
        # range start to the next '>' record boundary
        parts = []
        for off in range(0, f.size, SPLIT_BYTES):
            parts.append(
                FilePartition(f.path, comp, pv, start=off, end=min(off + SPLIT_BYTES, f.size))
            )
        return parts

    @classmethod
    def parse_partition(cls, partition: FilePartition, options: dict) -> Iterator[dict]:
        sdt = str(options.get("sequence_data_type", "")).lower()
        if sdt == "integer_encode_dna":
            enc, kind = _DNA_ENCODE, "nucleotide"
        elif sdt == "integer_encode_protein":
            enc, kind = _PROTEIN_ENCODE, "amino acid"
        else:
            enc = None
        for rec in cls._parse_partition_text(partition):
            if enc is not None:
                rec["sequence"] = _encode_sequence(rec["sequence"], enc, kind)
            yield rec

    @classmethod
    def _parse_partition_text(cls, partition: FilePartition) -> Iterator[dict]:
        if partition.extra:  # fai region slice: range covers one sequence
            yield from cls._read_fai_slice(partition)
            return
        if partition.compression == "none" and (
            partition.start or partition.end is not None
        ):
            yield from cls._read_byte_range(partition)
            return
        with open_maybe_compressed(partition.path, partition.compression) as fh:
            yield from _fasta_records_from_stream(fh)

    @staticmethod
    def _read_byte_range(partition: FilePartition) -> Iterator[dict]:
        """Parse records whose '>' header starts within [start, end)."""
        with fs_open(partition.path) as fh:
            fh.seek(partition.start)
            if partition.start != 0:
                # skip the (possibly partial) record the previous split owns
                while True:
                    pos = fh.tell()
                    line = fh.readline()
                    if not line:
                        return
                    if line.startswith(b">"):
                        fh.seek(pos)
                        break
            header: str | None = None
            seq_parts: list[str] = []
            while True:
                pos = fh.tell()
                line = fh.readline()
                at_eof = not line
                if not at_eof and line.startswith(b">") and pos >= (partition.end or 0):
                    break  # next split owns this record
                if at_eof:
                    break
                text = line.decode("utf-8", "replace").rstrip("\r\n")
                if text.startswith(">"):
                    if header is not None:
                        yield _emit(header, seq_parts)
                    header = text[1:]
                    seq_parts = []
                elif text:
                    seq_parts.append(text)
            if header is not None:
                yield _emit(header, seq_parts)

    @staticmethod
    def _read_fai_slice(partition: FilePartition) -> Iterator[dict]:
        (name,) = partition.extra
        with fs_open(partition.path) as fh:
            fh.seek(partition.start)
            blob = fh.read((partition.end or 0) - partition.start)
        seq = b"".join(blob.split(b"\n")).decode("utf-8", "replace")
        yield {"id": name, "description": None, "sequence": seq}
