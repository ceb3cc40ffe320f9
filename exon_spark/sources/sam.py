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


def _untyped_tag_value(typ: str, raw: str) -> str:
    """noodles-style Display for a SAM tag value (what the reference's
    default list<struct<tag,value>> schema shows, schema_builder.rs:344-397):
    B integer arrays join with ',', B float arrays with ', ' at 2 decimals."""
    if typ == "B" and raw:
        import numpy as np

        sub, _, rest = raw.partition(",")
        vals = rest.split(",") if rest else []
        if sub in ("f", "d"):
            # noodles stores f32 — 2.9979e9 displays as 2997900032.00
            return ", ".join(f"{np.float32(v):.2f}" for v in vals)
        return ",".join(vals)
    return raw


def typed_tag(field: str) -> tuple[str, object, str] | None:
    """Parse ``TAG:TYPE:VALUE`` into (tag, python value, ddl type) for the
    parse_tags struct schema (sampling rule, schema_builder.rs:344-397)."""
    parts = field.split(":", 2)
    if len(parts) < 3:
        return None
    tag, typ, raw = parts
    try:
        if typ == "i":
            return tag, int(raw), "bigint"
        if typ == "f":
            return tag, float(raw), "double"
        if typ == "B":
            sub, _, rest = raw.partition(",")
            vals = rest.split(",") if rest else []
            if sub in ("f", "d"):
                return tag, [float(v) for v in vals], "array<double>"
            return tag, [int(v) for v in vals], "array<bigint>"
        if typ == "A":  # character tags are numeric in the typed schema
            return tag, ord(raw[0]) if raw else None, "bigint"
    except ValueError:
        return tag, raw, "string"
    return tag, raw, "string"  # Z, H


def sample_tag_schema(tag_iter) -> str:
    """struct DDL from sampled (tag, value, ddl) tuples, first-seen order."""
    fields: dict[str, str] = {}
    for tag, _v, ddl in tag_iter:
        if tag not in fields:
            fields[tag] = ddl
        elif fields[tag] != ddl:
            fields[tag] = "string"  # conflicting types widen to string
    inner = ", ".join(f"`{t}` {d}" for t, d in fields.items())
    return f"struct<{inner}>" if inner else "struct<`_no_tags` string>"


def parse_tags_enabled(options: dict) -> bool:
    return str(options.get("parse_tags", "")).lower() in ("true", "1")


class SamSource(FileFormatSource):
    NAME = "sam"
    EXTENSIONS = ("sam",)
    BASE_SCHEMA = (
        "name string, flag int, reference string, start bigint, end bigint, "
        "mapping_quality string, cigar string, mate_reference string, "
        "sequence string, quality_score array<bigint>, "
        "tags array<struct<tag string, value string>>"
    )

    def base_schema(self) -> str:
        if not parse_tags_enabled(self.options):
            return self.BASE_SCHEMA
        # sample the first file's records to type the tags struct
        # (reference's schema-by-sampling, exon-sam/src/schema_builder.rs:344-397)
        first = self._files()[0]

        def tag_samples():
            n = 0
            with open_maybe_compressed(
                first.path, self.options.get("compression")
            ) as fh:
                for raw in fh:
                    line = raw.decode("utf-8", "replace").rstrip("\n")
                    if not line or line.startswith("@"):
                        continue
                    for t in line.split("\t")[11:]:
                        tt = typed_tag(t)
                        if tt:
                            yield tt
                    n += 1
                    if n >= 100:
                        return

        struct_ddl = sample_tag_schema(tag_samples())
        return self.BASE_SCHEMA.replace(
            "tags array<struct<tag string, value string>>", f"tags {struct_ddl}"
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
                    "tags": cls._tags_value(f[11:], options),
                }

    @staticmethod
    def _tags_value(fields: list[str], options: dict):
        if parse_tags_enabled(options):
            out = {}
            for t in fields:
                tt = typed_tag(t)
                if tt:
                    out[tt[0]] = tt[1]
            return out or None
        tags = []
        for t in fields:
            parts = t.split(":", 2)
            if len(parts) < 3:
                continue
            tags.append(
                {"tag": parts[0], "value": _untyped_tag_value(parts[1], parts[2])}
            )
        return tags or None
