"""SAM data source (text alignments).

Parity: reference ListingSAMTable (exon/exon-core/src/datasources/sam/;
schema exon/exon-sam/src/schema_builder.rs:383-397: name, flag, reference,
start, end, mapping_quality, cigar, mate_reference, sequence,
quality_score list<i64>, tags list<struct<tag,value>>).

``end`` is derived from the CIGAR reference-consuming ops (M/D/N/=/X), and
``quality_score`` is the Phred+33 decode of the QUAL string — matching
noodles' record accessors used by the reference's array builders.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from exon_spark.sources.base import FileFormatSource
from exon_spark.sources.util import open_maybe_compressed

_CIGAR_RE = re.compile(r"(\d+)([MIDNSHP=X])")
_REF_CONSUMING = frozenset("MDN=X")


def cigar_reference_len(cigar: str) -> int:
    return sum(
        int(n) for n, op in _CIGAR_RE.findall(cigar) if op in _REF_CONSUMING
    )


class SamSource(FileFormatSource):
    NAME = "sam"
    EXTENSIONS = ("sam",)
    BASE_SCHEMA = (
        "name string, flag int, reference string, start bigint, end bigint, "
        "mapping_quality string, cigar string, mate_reference string, "
        "sequence string, quality_score array<bigint>, "
        "tags array<struct<tag string, value string>>"
    )

    @classmethod
    def parse_records(cls, path: str, compression: str, options: dict) -> Iterator[dict]:
        with open_maybe_compressed(path, compression) as fh:
            for raw in fh:
                line = raw.decode("utf-8", "replace").rstrip("\n")
                if not line or line.startswith("@"):
                    continue
                f = line.split("\t")
                if len(f) < 11:
                    continue
                pos = int(f[3])
                unmapped = f[2] == "*" or pos == 0
                cigar = f[5]
                ref_len = 0 if cigar == "*" else cigar_reference_len(cigar)
                yield {
                    "name": None if f[0] == "*" else f[0],
                    "flag": int(f[1]),
                    "reference": None if f[2] == "*" else f[2],
                    "start": None if unmapped else pos,
                    "end": None if unmapped or ref_len == 0 else pos + ref_len - 1,
                    "mapping_quality": None if f[4] == "255" else f[4],
                    "cigar": "" if cigar == "*" else cigar,
                    "mate_reference": None
                    if f[6] == "*"
                    else (f[2] if f[6] == "=" else f[6]),
                    "sequence": "" if f[9] == "*" else f[9],
                    "quality_score": []
                    if f[10] == "*"
                    else [ord(c) - 33 for c in f[10]],
                    "tags": [
                        {"tag": t.split(":", 2)[0], "value": t.split(":", 2)[2]}
                        for t in f[11:]
                        if t.count(":") >= 2
                    ]
                    or None,
                }
