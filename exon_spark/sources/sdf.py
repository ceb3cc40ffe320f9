"""SDF (structure-data file) source.

Parity: reference ListingSDFTable (exon/exon-sdf/; schema
exon-sdf/src/schema_builder.rs:31-46: header, atom_count, bond_count,
data struct with one string field per '> <key>' property). Data keys are
inferred from the FIRST file (schema_builder.rs:79-83 first-file rule).
"""

from __future__ import annotations

from collections.abc import Iterator

from exon_spark.sources.base import FileFormatSource
from exon_spark.sources.util import open_maybe_compressed


def iter_molecules(path: str, compression: str) -> Iterator[dict]:
    """Yield raw molecule dicts: header, atom_count, bond_count, data{k:v}."""
    with open_maybe_compressed(path, compression) as fh:
        lines: list[str] = []
        for raw in fh:
            line = raw.decode("utf-8", "replace").rstrip("\r\n")
            if line.strip() == "$$$$":
                if lines:
                    yield _parse_molecule(lines)
                lines = []
            else:
                lines.append(line)
        if any(l.strip() for l in lines):
            yield _parse_molecule(lines)


def _parse_molecule(lines: list[str]) -> dict:
    # header = first 3 lines, trimmed, empties dropped, '\n'-joined
    # (exon-sdf/src/record.rs:107-120)
    header = "\n".join(
        l.strip() for l in lines[:3] if l.strip()
    )
    atom_count = bond_count = 0
    if len(lines) > 3:
        counts = lines[3]
        try:
            atom_count = int(counts[0:3])
            bond_count = int(counts[3:6])
        except ValueError:
            pass
    data: dict[str, str] = {}
    i = 0
    while i < len(lines):
        line = lines[i]
        if line.startswith("> ") or line.startswith(">\t") or line.startswith(">  "):
            key = line[line.find("<") + 1 : line.rfind(">")]
            vals = []
            i += 1
            while i < len(lines) and lines[i].strip() != "":
                vals.append(lines[i])
                i += 1
            data[key] = "\n".join(vals)
        i += 1
    return {
        "header": header,
        "atom_count": atom_count,
        "bond_count": bond_count,
        "data": data,
    }


class SdfSource(FileFormatSource):
    NAME = "sdf"
    EXTENSIONS = ("sdf", "sd")
    BASE_SCHEMA = "header string, atom_count bigint, bond_count bigint"

    def base_schema(self) -> str:
        # dynamic data struct from the first file's property keys
        first = self._files()[0]
        comp = "none"
        from exon_spark.sources.util import detect_compression

        comp = detect_compression(first.path, self.options.get("compression"))
        keys: list[str] = []
        for i, mol in enumerate(iter_molecules(first.path, comp)):
            for k in mol["data"]:
                if k not in keys:
                    keys.append(k)
            if i >= 99:
                break
        if not keys:
            return self.BASE_SCHEMA + ", data map<string,string>"
        struct = ", ".join(f"`{k}` string" for k in keys)
        return self.BASE_SCHEMA + f", data struct<{struct}>"

    @classmethod
    def parse_records(cls, path: str, compression: str, options: dict) -> Iterator[dict]:
        yield from iter_molecules(path, compression)


SOURCE = SdfSource
