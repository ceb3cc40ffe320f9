"""FCS (flow cytometry standard) source.

Parity: reference ListingFCSTable (exon/exon-fcs/; schema
exon-fcs/src/config.rs:58-85: one Float32 column per channel, names from
the TEXT segment's $PnN keywords — header-derived, first-file-wins).

Supports FCS 3.x with float ($DATATYPE F/D) or integer (I) list-mode data.
"""

from __future__ import annotations

import re
import struct as _struct
from collections.abc import Iterator

from exon_spark.sources.fs import fs_open
from exon_spark.sources.base import FileFormatSource


def _read_text_segment(path: str) -> tuple[dict[str, str], int, int]:
    with fs_open(path) as fh:
        header = fh.read(58)
        if not header[:3] == b"FCS":
            raise ValueError(f"{path}: not an FCS file")
        text_start = int(header[10:18].strip() or 0)
        text_end = int(header[18:26].strip() or 0)
        data_start = int(header[26:34].strip() or 0)
        data_end = int(header[34:42].strip() or 0)
        fh.seek(text_start)
        text = fh.read(text_end - text_start + 1).decode("ascii", "replace")
    delim = text[0]
    parts = text[1:].split(delim)
    kv = {
        parts[i].strip().upper(): parts[i + 1]
        for i in range(0, len(parts) - 1, 2)
        if parts[i].strip()
    }
    if not data_start and "$BEGINDATA" in kv:
        data_start = int(kv["$BEGINDATA"])
    if not data_end and "$ENDDATA" in kv:
        data_end = int(kv["$ENDDATA"])
    return kv, data_start, data_end


def _channel_names(kv: dict[str, str]) -> list[str]:
    n = int(kv.get("$PAR", "0"))
    names = []
    for i in range(1, n + 1):
        raw = kv.get(f"$P{i}N", f"channel_{i}")
        name = re.sub(r"[^A-Za-z0-9_]", "_", raw.strip()) or f"channel_{i}"
        names.append(name.lower())
    return names


class FcsSource(FileFormatSource):
    NAME = "fcs"
    EXTENSIONS = ("fcs",)
    BASE_SCHEMA = "event float"

    def base_schema(self) -> str:
        first = self._files()[0]
        kv, _ds, _de = _read_text_segment(first.path)
        names = _channel_names(kv)
        if not names:
            raise ValueError(f"{first.path}: no $PnN channels in TEXT segment")
        return ", ".join(f"`{n}` float" for n in names)

    @classmethod
    def parse_records(cls, path: str, compression: str, options: dict) -> Iterator[dict]:
        kv, data_start, data_end = _read_text_segment(path)
        names = _channel_names(kv)
        n_par = len(names)
        dtype = kv.get("$DATATYPE", "F").upper()
        big_endian = kv.get("$BYTEORD", "1,2,3,4").startswith("4")
        tot = int(kv.get("$TOT", "0"))
        with fs_open(path) as fh:
            fh.seek(data_start)
            blob = fh.read(data_end - data_start + 1)
        order = ">" if big_endian else "<"
        if dtype == "F":
            fmt, size = "f", 4
        elif dtype == "D":
            fmt, size = "d", 8
        elif dtype == "I":
            bits = int(kv.get("$P1B", "16"))
            fmt, size = ("H", 2) if bits <= 16 else ("I", 4)
        else:
            raise ValueError(f"unsupported $DATATYPE {dtype}")
        n_events = tot or len(blob) // (size * n_par)
        vals = _struct.unpack(
            f"{order}{n_events * n_par}{fmt}", blob[: n_events * n_par * size]
        )
        for e in range(n_events):
            row = vals[e * n_par : (e + 1) * n_par]
            yield {name: float(v) for name, v in zip(names, row)}


SOURCE = FcsSource
