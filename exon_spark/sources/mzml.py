"""mzML (mass spectrometry) source — stdlib XML + base64/zlib binary decode.

Parity: reference ListingMzMLTable (exon/exon-mzml/; schema
exon-mzml/src/config.rs:93-145: id, mz struct{mz list<f64>},
intensity struct{intensity list<f64>}, wavelength struct, cv_params
list<struct{accession,name,value}>, precursor_mz, precusor_charge — the
reference's 'precusor' spelling is preserved for parity).

Scale: a single uncompressed mzML file is byte-range-splittable — the
driver plans [start, end) ranges and each executor scans forward from its
start offset to the first ``<spectrum`` tag (Hadoop text-split semantics:
a spectrum belongs to the range its start tag falls in). One 100 GB run
file fans out across the cluster instead of one task. gzip input stays one
partition per file (unsplittable), as in the reference.
"""

from __future__ import annotations

import base64
import os
import struct as _struct
import zlib
from collections.abc import Iterator
from xml.etree import ElementTree as ET

from exon_spark.sources.fs import fs_open
from exon_spark.sources.base import FileFormatSource, FilePartition
from exon_spark.sources.util import FoundFile, detect_compression, open_maybe_compressed

_NS = "{http://psi.hupo.org/ms/mzml}"

# CV accessions for binary array metadata
_ACC_MZ = "MS:1000514"
_ACC_INTENSITY = "MS:1000515"
_ACC_WAVELENGTH = "MS:1000617"
_ACC_F64 = "MS:1000523"
_ACC_F32 = "MS:1000521"
_ACC_ZLIB = "MS:1000574"
_ACC_PRECURSOR_MZ = "MS:1000744"
_ACC_CHARGE = "MS:1000041"


def _decode_binary(b64_text: str, is_f64: bool, zlib_compressed: bool):
    """Decode a <binary> payload to a float64 numpy array (vectorized — no
    per-float Python objects)."""
    import numpy as np

    raw = base64.b64decode(b64_text)
    if zlib_compressed:
        raw = zlib.decompress(raw)
    arr = np.frombuffer(raw, dtype="<f8" if is_f64 else "<f4")
    return arr.astype(np.float64, copy=False)


def _spectrum_record(elem, ns: str) -> dict:
    """Build one output record from a <spectrum> element. ``ns`` is the
    Clark-notation namespace prefix ('{...}') for documents parsed with
    their root xmlns, or '' for standalone fragments."""
    rec = {
        "id": elem.get("id"),
        "mz": None,
        "intensity": None,
        "wavelength": None,
        "cv_params": [],
        "precursor_mz": None,
        "precusor_charge": None,
    }
    for cv in elem.findall(f"{ns}cvParam"):
        rec["cv_params"].append(
            {
                "accession": cv.get("accession"),
                "name": cv.get("name"),
                "value": cv.get("value"),
            }
        )
    for cv in elem.iter(f"{ns}cvParam"):
        acc = cv.get("accession")
        if acc == _ACC_PRECURSOR_MZ:
            try:
                rec["precursor_mz"] = float(cv.get("value"))
            except (TypeError, ValueError):
                pass
        elif acc == _ACC_CHARGE:
            try:
                rec["precusor_charge"] = int(cv.get("value"))
            except (TypeError, ValueError):
                pass
    for bda in elem.iter(f"{ns}binaryDataArray"):
        accs = {cv.get("accession") for cv in bda.findall(f"{ns}cvParam")}
        binary = bda.find(f"{ns}binary")
        if binary is None or binary.text is None:
            continue
        vals = _decode_binary(
            binary.text.strip(),
            is_f64=_ACC_F64 in accs or _ACC_F32 not in accs,
            zlib_compressed=_ACC_ZLIB in accs,
        )
        if _ACC_MZ in accs:
            rec["mz"] = {"mz": vals}
        elif _ACC_INTENSITY in accs:
            rec["intensity"] = {"intensity": vals}
        elif _ACC_WAVELENGTH in accs:
            rec["wavelength"] = {"wavelength": vals}
    return rec


def _is_spectrum_start(buf: bytes, i: int) -> bool:
    """True when buf[i:] begins a <spectrum ...> start tag (and not
    <spectrumList>)."""
    j = i + len(b"<spectrum")
    return j < len(buf) and buf[j : j + 1] in (b" ", b"\t", b"\r", b"\n", b">")


def _iter_spectrum_fragments(
    fh, start: int, end: int | None, chunk: int = 4 << 20
) -> Iterator[bytes]:
    """Yield raw <spectrum>...</spectrum> byte fragments whose start tag
    offset falls in [start, end). Scans forward from ``start``; the final
    spectrum may extend past ``end`` (next partition skips it because its
    start offset is < its own range)."""
    fh.seek(start)
    buf = b""
    base = start  # absolute offset of buf[0]
    scan = 0  # search position within buf
    mark = len(b"<spectrum")
    close = b"</spectrum>"
    while True:
        while True:
            i = buf.find(b"<spectrum", scan)
            if i < 0:
                # no marker: keep a small tail in case one is split across
                # the read boundary
                cut = max(len(buf) - mark, scan)
                base += cut
                buf = buf[cut:]
                scan = 0
                break
            if len(buf) < i + mark + 1:
                base += i
                buf = buf[i:]
                scan = 0
                break  # tag-name boundary char not read yet
            if not _is_spectrum_start(buf, i):
                scan = i + 1
                continue
            if end is not None and base + i >= end:
                return  # next partition owns this spectrum
            e = buf.find(close, i)
            if e < 0:
                base += i
                buf = buf[i:]
                scan = 0
                break  # spectrum incomplete: read more
            e += len(close)
            yield buf[i:e]
            base += e
            buf = buf[e:]
            scan = 0
        data = fh.read(chunk)
        if not data:
            return
        buf += data


class MzmlSource(FileFormatSource):
    NAME = "mzml"
    EXTENSIONS = ("mzml",)
    BASE_SCHEMA = (
        "id string, mz struct<mz array<double>>, "
        "intensity struct<intensity array<double>>, "
        "wavelength struct<wavelength array<double>>, "
        "cv_params array<struct<accession string, name string, value string>>, "
        "precursor_mz double, precusor_charge bigint"
    )

    @classmethod
    def plan_partitions(cls, f: FoundFile, options: dict) -> list[FilePartition]:
        comp = detect_compression(f.path, options.get("compression"))
        pv = tuple(sorted(f.partition_values.items()))
        size = f.size
        if comp in (None, "", "none") and size > 4 << 20:
            from exon_spark.sources.indexes import adaptive_target_bytes

            par = int(options.get("target_parallelism", 0) or 0)
            target = adaptive_target_bytes(
                size, par or 16, floor=1 << 20, ceil=64 << 20
            )
            n = max(1, size // target)
            step = (size + n - 1) // n
            return [
                FilePartition(
                    f.path, "none", pv, start=s, end=min(s + step, size)
                )
                for s in range(0, size, step)
            ]
        return [FilePartition(f.path, comp or "none", pv)]

    @classmethod
    def _iter_raw_records(cls, partition: FilePartition) -> Iterator[dict]:
        """Records with numpy-array binary columns (internal)."""
        if partition.end is not None:
            # byte-range split of an uncompressed file: parse standalone
            # <spectrum> fragments (no inherited xmlns -> empty namespace)
            with fs_open(partition.path) as fh:
                for frag in _iter_spectrum_fragments(
                    fh, partition.start, partition.end
                ):
                    yield _spectrum_record(ET.fromstring(frag), "")
            return
        comp = None if partition.compression in ("", "none") else partition.compression
        with open_maybe_compressed(partition.path, comp) as fh:
            for _event, elem in ET.iterparse(fh, events=("end",)):
                if elem.tag != f"{_NS}spectrum":
                    continue
                yield _spectrum_record(elem, _NS)
                elem.clear()

    @classmethod
    def parse_partition(cls, partition: FilePartition, options: dict) -> Iterator[dict]:
        for rec in cls._iter_raw_records(partition):
            for key, inner in (
                ("mz", "mz"),
                ("intensity", "intensity"),
                ("wavelength", "wavelength"),
            ):
                if rec[key] is not None:
                    rec[key] = {inner: rec[key][inner].tolist()}
            yield rec

    @classmethod
    def read_arrow_partition(cls, partition: FilePartition, options: dict, schema):
        """Vectorized batch builder: binary arrays decode straight to numpy
        and land in Arrow ListArrays via offsets — the ~250 floats per
        spectrum never become Python objects."""
        if options.get("columns"):
            return None

        def batches():
            import numpy as np
            import pyarrow as pa

            def flush(rows: list[dict]) -> pa.RecordBatch:
                def list_struct(key: str) -> pa.StructArray:
                    vals = [
                        None if r[key] is None else r[key][key] for r in rows
                    ]
                    offs = np.zeros(len(vals) + 1, dtype=np.int32)
                    chunks = []
                    total = 0
                    for i, v in enumerate(vals):
                        if v is not None:
                            total += len(v)
                            chunks.append(v)
                        offs[i + 1] = total
                    flat = (
                        np.concatenate(chunks)
                        if chunks
                        else np.array([], dtype=np.float64)
                    )
                    lst = pa.ListArray.from_arrays(
                        pa.array(offs, pa.int32()), pa.array(flat, pa.float64())
                    )
                    mask = pa.array([v is None for v in vals], pa.bool_())
                    return pa.StructArray.from_arrays(
                        [lst], names=[key], mask=mask
                    )

                arrays = [
                    pa.array([r["id"] for r in rows], pa.string()),
                    list_struct("mz"),
                    list_struct("intensity"),
                    list_struct("wavelength"),
                    pa.array(
                        [r["cv_params"] for r in rows],
                        pa.list_(
                            pa.struct(
                                [
                                    ("accession", pa.string()),
                                    ("name", pa.string()),
                                    ("value", pa.string()),
                                ]
                            )
                        ),
                    ),
                    pa.array([r["precursor_mz"] for r in rows], pa.float64()),
                    pa.array([r["precusor_charge"] for r in rows], pa.int64()),
                ]
                names = [
                    "id",
                    "mz",
                    "intensity",
                    "wavelength",
                    "cv_params",
                    "precursor_mz",
                    "precusor_charge",
                ]
                t = pa.Table.from_arrays(arrays, names=names)
                return t.select(schema.names).cast(schema).to_batches()[0]

            rows: list[dict] = []
            for rec in cls._iter_raw_records(partition):
                rows.append(rec)
                if len(rows) >= 2048:
                    yield flush(rows)
                    rows = []
            if rows:
                yield flush(rows)

        return batches()


SOURCE = MzmlSource
