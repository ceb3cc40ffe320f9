"""GenBank flat-file source.

Parity: reference ListingGenbankTable (exon/exon-genbank/; schema
exon-genbank/src/config.rs:23-57: sequence, accession, comments, contig,
date, dblink, definition, division, keywords, molecule_type, name, source,
version, topology, features list<struct<kind, location,
qualifiers list<struct<keys, values>>>>).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from exon_spark.sources.base import FileFormatSource
from exon_spark.sources.util import open_maybe_compressed

_LOCUS_RE = re.compile(
    r"^LOCUS\s+(?P<name>\S+)(?:\s+\d+\s+bp)?"
    r"(?:\s+(?P<moltype>[A-Za-z-]*DNA|[A-Za-z-]*RNA|protein))?"
    r"(?:\s+(?P<topology>linear|circular))?"
    r"(?:\s+(?P<division>[A-Z]{3}))?"
    r"(?:\s+(?P<date>\d{2}-[A-Z]{3}-\d{4}))?"
)


class GenbankSource(FileFormatSource):
    NAME = "genbank"
    EXTENSIONS = ("gb", "gbk", "genbank")
    BASE_SCHEMA = (
        "sequence string, accession string, comments array<string>, "
        "contig string, date string, dblink string, definition string, "
        "division string, keywords string, molecule_type string, name string, "
        "source string, version string, topology string, "
        "features array<struct<kind string, location string, "
        "qualifiers array<struct<keys string, values string>>>>"
    )

    @classmethod
    def parse_records(cls, path: str, compression: str, options: dict) -> Iterator[dict]:
        rec_lines: list[str] = []
        with open_maybe_compressed(path, compression) as fh:
            for raw in fh:
                line = raw.decode("utf-8", "replace").rstrip("\r\n")
                if line.strip() == "//":
                    if rec_lines:
                        yield cls._parse_record(rec_lines)
                    rec_lines = []
                else:
                    rec_lines.append(line)
        if any(l.strip() for l in rec_lines):
            yield cls._parse_record(rec_lines)

    @staticmethod
    def _parse_record(lines: list[str]) -> dict:
        rec: dict = {
            "sequence": "",
            "accession": None,
            "comments": None,
            "contig": None,
            "date": None,
            "dblink": None,
            "definition": None,
            "division": "UNK",
            "keywords": None,
            "molecule_type": None,
            "name": None,
            "source": None,
            "version": None,
            "topology": "linear",
            "features": None,
        }
        comments: list[str] = []
        features: list[dict] = []
        i = 0
        n = len(lines)

        def continuation(start: int, first: str) -> tuple[str, int]:
            vals = [first]
            j = start + 1
            while j < n and lines[j].startswith(" " * 12):
                vals.append(lines[j].strip())
                j += 1
            return " ".join(v for v in vals if v), j

        while i < n:
            line = lines[i]
            key = line[:12].strip()
            val = line[12:].strip()
            if key == "LOCUS":
                m = _LOCUS_RE.match(line)
                if m:
                    rec["name"] = m.group("name")
                    if m.group("moltype"):
                        rec["molecule_type"] = m.group("moltype")
                    if m.group("topology"):
                        rec["topology"] = m.group("topology")
                    if m.group("division"):
                        rec["division"] = m.group("division")
                    if m.group("date"):
                        rec["date"] = m.group("date")
                i += 1
            elif key == "DEFINITION":
                rec["definition"], i = continuation(i, val)
            elif key == "ACCESSION":
                rec["accession"] = val.split()[0] if val else None
                i += 1
            elif key == "VERSION":
                rec["version"] = val.split()[0] if val else None
                i += 1
            elif key == "DBLINK":
                rec["dblink"], i = continuation(i, val)
            elif key == "KEYWORDS":
                kw, i = continuation(i, val)
                rec["keywords"] = kw.rstrip(".") or None
            elif key == "SOURCE":
                rec["source"], i = continuation(i, val)
            elif key == "COMMENT":
                c, i = continuation(i, val)
                comments.append(c)
            elif key == "CONTIG":
                rec["contig"], i = continuation(i, val)
            elif key == "FEATURES":
                i += 1
                cur: dict | None = None
                while i < n and (lines[i].startswith("     ") or not lines[i].strip()):
                    fl = lines[i]
                    if len(fl) > 5 and fl[5] != " ":
                        if cur:
                            features.append(cur)
                        kind = fl[5:21].strip()
                        cur = {
                            "kind": kind,
                            "location": fl[21:].strip(),
                            "qualifiers": [],
                        }
                    elif cur is not None:
                        q = fl.strip()
                        if q.startswith("/"):
                            k, _, v = q[1:].partition("=")
                            cur["qualifiers"].append(
                                {"keys": k, "values": v.strip('"') or None}
                            )
                        elif q and cur["qualifiers"]:
                            last = cur["qualifiers"][-1]
                            last["values"] = (last["values"] or "") + " " + q.strip('"')
                        elif q and not cur["qualifiers"]:
                            cur["location"] += q
                    i += 1
                if cur:
                    features.append(cur)
            elif key == "ORIGIN":
                i += 1
                seq_parts: list[str] = []
                while i < n:
                    seq_parts.append(re.sub(r"[\d\s]", "", lines[i]))
                    i += 1
                rec["sequence"] = "".join(seq_parts).upper()
            else:
                i += 1
        rec["comments"] = comments or None
        rec["features"] = features or None
        return rec


SOURCE = GenbankSource
