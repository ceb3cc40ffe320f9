"""mzML (mass spectrometry) source — stdlib XML + base64/zlib binary decode.

Parity: reference ListingMzMLTable (exon/exon-mzml/; schema
exon-mzml/src/config.rs:93-145: id, mz struct{mz list<f64>},
intensity struct{intensity list<f64>}, wavelength struct, cv_params
list<struct{accession,name,value}>, precursor_mz, precusor_charge — the
reference's 'precusor' spelling is preserved for parity).
"""

from __future__ import annotations

import base64
import struct as _struct
import zlib
from collections.abc import Iterator
from xml.etree import ElementTree as ET

from exon_spark.sources.base import FileFormatSource
from exon_spark.sources.util import open_maybe_compressed

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


def _decode_binary(b64_text: str, is_f64: bool, zlib_compressed: bool) -> list[float]:
    raw = base64.b64decode(b64_text)
    if zlib_compressed:
        raw = zlib.decompress(raw)
    fmt = "d" if is_f64 else "f"
    n = len(raw) // _struct.calcsize(fmt)
    return list(_struct.unpack(f"<{n}{fmt}", raw))


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
    def parse_records(cls, path: str, compression: str, options: dict) -> Iterator[dict]:
        with open_maybe_compressed(path, compression) as fh:
            for _event, elem in ET.iterparse(fh, events=("end",)):
                if elem.tag != f"{_NS}spectrum":
                    continue
                rec = {
                    "id": elem.get("id"),
                    "mz": None,
                    "intensity": None,
                    "wavelength": None,
                    "cv_params": [],
                    "precursor_mz": None,
                    "precusor_charge": None,
                }
                for cv in elem.findall(f"{_NS}cvParam"):
                    rec["cv_params"].append(
                        {
                            "accession": cv.get("accession"),
                            "name": cv.get("name"),
                            "value": cv.get("value"),
                        }
                    )
                for cv in elem.iter(f"{_NS}cvParam"):
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
                for bda in elem.iter(f"{_NS}binaryDataArray"):
                    accs = {
                        cv.get("accession") for cv in bda.findall(f"{_NS}cvParam")
                    }
                    binary = bda.find(f"{_NS}binary")
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
                yield rec
                elem.clear()


SOURCE = MzmlSource
