"""VCF data source with tabix-pruned region scans.

Parity: reference ListingVCFTable
(exon/exon-core/src/datasources/vcf/table_provider.rs:286-440; flat schema
per schema_builder.rs:88-122: chrom, pos, id(list), ref, alt(list), qual,
filter(list), info, formats). ``parse_info=true`` upgrades ``info`` to a
typed struct from the header's INFO declarations (schema_builder.rs:197-266).

Region pruning (the reference's flagship optimization, SURVEY.md §4.1):
``.option("regions", "chr1:1000-2000")`` on a bgzipped+tabixed file queries
the .tbi index DRIVER-SIDE at planning time and emits one partition per
merged BGZF chunk range; executors seek virtual offsets and apply the
residual interval check per record (indexed_bgzf_file.rs:52-150 semantics).
Without an index the same option degrades to a full scan + filter —
correctness never depends on pruning.
"""

from __future__ import annotations

import os
from collections.abc import Iterator

from exon_spark.functions.region import parse_region
from exon_spark.sources.fs import fs_exists
from exon_spark.sources.base import FileFormatSource, FilePartition
from exon_spark.sources.util import FoundFile, detect_compression, open_maybe_compressed

_INFO_TYPE_MAP = {
    "Integer": "int",
    "Float": "float",
    "Flag": "boolean",
    "Character": "string",
    "String": "string",
}


def _parse_line(line: str) -> dict | None:
    if line.startswith("#") or not line:
        return None
    f = line.split("\t")
    if len(f) < 8:
        return None
    qual = None
    if f[5] not in (".", ""):
        try:
            qual = float(f[5])
        except ValueError:
            qual = None
    return {
        "chrom": f[0],
        "pos": int(f[1]),
        "id": None if f[2] in (".", "") else f[2].split(";"),
        "ref": f[3],
        "alt": None if f[4] in (".", "") else f[4].split(","),
        "qual": qual,
        "filter": None if f[6] in (".", "") else f[6].split(";"),
        "info": None if f[7] in (".", "") else f[7],
        "formats": "\t".join(f[8:]) if len(f) > 8 else None,
    }


def parse_info_fields(header_lines: list[str]) -> list[tuple[str, str, bool]]:
    """(name, spark_type, is_list) per ##INFO declaration, in header order
    (schema_builder.rs:197-266)."""
    out = []
    for line in header_lines:
        if not line.startswith("##INFO=<"):
            continue
        body = line[len("##INFO=<") :].rstrip(">")
        kv = {}
        for part in body.split(","):
            if "=" in part:
                k, _, v = part.partition("=")
                if k in ("ID", "Number", "Type") and k not in kv:
                    kv[k] = v
        typ = _INFO_TYPE_MAP.get(kv.get("Type", "String"), "string")
        is_list = kv.get("Number", "1") not in ("0", "1")
        out.append((kv.get("ID", "?"), typ, is_list))
    return out


def parse_format_fields(header_lines: list[str]) -> list[tuple[str, str, bool]]:
    """(name, spark_type, is_list) per ##FORMAT declaration, in header order
    (schema_builder.rs vcf_formats_to_field)."""
    out = []
    for line in header_lines:
        if not line.startswith("##FORMAT=<"):
            continue
        body = line[len("##FORMAT=<") :].rstrip(">")
        kv = {}
        for part in body.split(","):
            if "=" in part:
                k, _, v = part.partition("=")
                if k in ("ID", "Number", "Type") and k not in kv:
                    kv[k] = v
        typ = _INFO_TYPE_MAP.get(kv.get("Type", "String"), "string")
        is_list = kv.get("Number", "1") not in ("0", "1")
        out.append((kv.get("ID", "?"), typ, is_list))
    return out


def formats_struct_ddl(format_fields: list[tuple[str, str, bool]]) -> str:
    inner = ", ".join(
        f"`{name}` {'array<' + typ + '>' if is_list else typ}"
        for name, typ, is_list in format_fields
    )
    return f"array<struct<{inner}>>" if inner else "string"


def convert_formats_text(
    raw: str | None, format_fields: list[tuple[str, str, bool]]
) -> list[dict] | None:
    """Parse the raw 'FORMAT\\tS1\\tS2...' text into one typed struct per
    sample (schema_builder.rs vcf_formats_to_field semantics)."""
    if raw is None:
        return None
    cols = raw.split("\t")
    keys = cols[0].split(":") if cols[0] else []
    out = []
    for sample in cols[1:]:
        vals = dict(zip(keys, sample.split(":")))
        out.append(
            {
                # FORMAT has no Flag type, so absent/'.' is always null
                name: _convert_info_value(
                    None if vals.get(name) in (None, ".", "") else vals[name],
                    typ if typ != "boolean" else "string",
                    is_list,
                )
                for name, typ, is_list in format_fields
            }
        )
    return out


def _convert_info_value(raw: str | None, typ: str, is_list: bool):
    def conv(v: str):
        try:
            if typ == "int":
                return int(v)
            if typ == "float":
                return float(v)
        except ValueError:
            return None
        return v

    if raw is None:
        return True if typ == "boolean" else None
    if typ == "boolean":
        return True
    if is_list:
        return [conv(v) for v in raw.split(",")]
    return conv(raw)


class VcfSource(FileFormatSource):
    NAME = "vcf"
    EXTENSIONS = ("vcf",)
    BASE_SCHEMA = (
        "chrom string, pos bigint, id array<string>, ref string, "
        "alt array<string>, qual float, filter array<string>, "
        "info string, formats string"
    )

    def base_schema(self) -> str:
        parse_info = str(self.options.get("parse_info", "")).lower() in ("true", "1")
        parse_formats = str(self.options.get("parse_formats", "")).lower() in (
            "true",
            "1",
        )
        if not parse_info and not parse_formats:
            return self.BASE_SCHEMA
        # header-driven struct schemas: read the FIRST file's header
        # (reference's first-file-wins rule, vcf/table_provider.rs:205)
        first = self._files()[0]
        headers = []
        with open_maybe_compressed(
            first.path, self.options.get("compression")
        ) as fh:
            for raw in fh:
                line = raw.decode("utf-8", "replace").rstrip("\n")
                if not line.startswith("#"):
                    break
                headers.append(line)
        schema = self.BASE_SCHEMA
        if parse_info:
            info_fields = parse_info_fields(headers)
            struct = ", ".join(
                f"`{name}` {'array<' + typ + '>' if is_list else typ}"
                for name, typ, is_list in info_fields
            )
            if struct:
                schema = schema.replace("info string", f"info struct<{struct}>")
        if parse_formats:
            ddl = formats_struct_ddl(parse_format_fields(headers))
            schema = schema.replace("formats string", f"formats {ddl}")
        return schema

    @classmethod
    def plan_partitions(cls, f: FoundFile, options: dict) -> list[FilePartition]:
        comp = detect_compression(f.path, options.get("compression"))
        pv = tuple(sorted(f.partition_values.items()))
        regions = options.get("regions") or options.get("region")
        if not regions and str(options.get("indexed", "")).lower() in ("true", "1"):
            # INDEXED_VCF requires a region (table_provider.rs:365-370)
            raise ValueError(
                "INDEXED_VCF scan requires a region filter — add "
                ".option('regions', 'chr:lo-hi') or WHERE "
                "vcf_region_filter('chr:lo-hi', chrom, pos)"
            )
        if regions:
            from exon_spark.functions.region import expand_regions

            region_list = expand_regions(regions)
            tbi = f.path + ".tbi"
            csi = f.path + ".csi"
            if comp == "gzip" and (fs_exists(tbi) or fs_exists(csi)):
                from exon_spark.sources.indexes import (
                    adaptive_target_bytes,
                    csi_chunks,
                    read_csi,
                    read_tabix,
                    split_chunk_groups,
                    tabix_chunks,
                )

                per_region = []
                if fs_exists(tbi):
                    index = read_tabix(tbi)
                    for region in region_list:
                        chunks = tabix_chunks(index, region)
                        if chunks:
                            per_region.append((region, chunks))
                else:
                    # htslib `tabix --csi` fallback: names ride in the
                    # index's tabix-style aux payload
                    cindex = read_csi(csi)
                    for region in region_list:
                        name, lo, hi = parse_region(region)
                        if name not in cindex.names:
                            continue
                        chunks = csi_chunks(
                            cindex, cindex.names.index(name), lo, hi
                        )
                        if chunks:
                            per_region.append((region, chunks))
                par = int(options.get("target_parallelism", 0) or 0)
                total = sum(
                    (ce >> 16) - (cb >> 16)
                    for _, chunks in per_region
                    for cb, ce in chunks
                )
                target = adaptive_target_bytes(total, par)
                parts = []
                for region, chunks in per_region:
                    # fan a big region out across executors: ~2 groups per
                    # core for bench-sized scans, 8 MB cap at cluster scale
                    for group in split_chunk_groups(chunks, target):
                        parts.append(
                            FilePartition(
                                path=f.path,
                                compression=comp,
                                partition_values=pv,
                                extra=("tabix", region, tuple(group)),
                            )
                        )
                if not parts:  # Spark needs >=1 partition; yield-nothing stub
                    parts = [FilePartition(f.path, comp, pv, extra=("empty",))]
                return parts
            # no index: full scan with residual filter per region set
            return [
                FilePartition(f.path, comp, pv, extra=("filter", regions, ()))
            ]
        return [FilePartition(f.path, comp, pv)]

    @classmethod
    def read_arrow_partition(cls, partition: FilePartition, options: dict, schema):
        """Vectorized scan for index-pruned partitions: decompress the BGZF
        chunk byte ranges (zlib, C speed), parse all lines at once with
        pyarrow.csv, and derive the typed columns with Arrow compute kernels
        — no per-row Python. ~10x faster than the per-record path; used
        whenever the flat schema is in play (no header-driven structs).
        Returns None to fall back to the generic reader."""
        parse_info = str(options.get("parse_info", "")).lower() in ("true", "1")
        parse_formats = str(options.get("parse_formats", "")).lower() in ("true", "1")
        if parse_info or parse_formats or options.get("columns"):
            return None
        if not partition.extra or partition.extra[0] not in ("tabix", "empty"):
            return None

        def batches():
            import pyarrow as pa

            if partition.extra[0] == "empty":
                return
            import pyarrow.compute as pc
            import pyarrow.csv as pacsv

            from exon_spark.sources.bgzf import BGZFReader

            _, region, chunks = partition.extra
            name, lo, hi = parse_region(region)
            with BGZFReader(partition.path) as bg:
                raw = b"".join(bg.read_range(cb, ce) for cb, ce in chunks)
            if not raw:
                return
            # tabix chunks are record-aligned: raw is whole data lines
            n_cols = raw.split(b"\n", 1)[0].count(b"\t") + 1
            cols = [f"c{i}" for i in range(n_cols)]
            tbl = pacsv.read_csv(
                pa.BufferReader(raw),
                read_options=pacsv.ReadOptions(column_names=cols),
                parse_options=pacsv.ParseOptions(
                    delimiter="\t", quote_char=False
                ),
                convert_options=pacsv.ConvertOptions(
                    column_types={c: pa.string() for c in cols}
                ),
            )
            pos = pc.cast(tbl["c1"], pa.int64())
            # residual region predicate — chunks are supersets
            keep = pc.and_(
                pc.equal(tbl["c0"], name),
                pc.and_(pc.greater_equal(pos, lo), pc.less_equal(pos, hi)),
            )
            tbl = tbl.filter(keep)
            pos = pc.cast(tbl["c1"], pa.int64())
            null_str = pa.scalar(None, pa.string())

            def dot_null(arr):
                return pc.if_else(
                    pc.is_in(arr, value_set=pa.array([".", ""])), null_str, arr
                )

            def split_col(arr, sep):
                return pc.split_pattern(dot_null(arr), sep)

            qual = pc.cast(
                pc.if_else(
                    pc.is_in(tbl["c5"], value_set=pa.array([".", ""])),
                    null_str,
                    tbl["c5"],
                ),
                pa.float32(),
            )
            if n_cols > 8:
                fmt = pc.binary_join_element_wise(
                    *[tbl[f"c{i}"] for i in range(8, n_cols)], "\t"
                )
            else:
                fmt = pa.nulls(tbl.num_rows, pa.string())
            arrays = [
                tbl["c0"],
                pos,
                split_col(tbl["c2"], ";"),
                tbl["c3"],
                split_col(tbl["c4"], ","),
                qual,
                split_col(tbl["c6"], ";"),
                dot_null(tbl["c7"]),
                fmt,
            ]
            out = pa.table(
                {n: a for n, a in zip(schema.names, arrays)}
            ).cast(schema)
            for batch in out.to_batches(max_chunksize=8192):
                yield batch

        return batches()

    @classmethod
    def parse_partition(cls, partition: FilePartition, options: dict) -> Iterator[dict]:
        parse_info = str(options.get("parse_info", "")).lower() in ("true", "1")
        parse_formats = str(options.get("parse_formats", "")).lower() in ("true", "1")
        info_fields = format_fields = None
        if parse_info or parse_formats:
            headers = []
            with open_maybe_compressed(partition.path, partition.compression) as fh:
                for raw in fh:
                    line = raw.decode("utf-8", "replace").rstrip("\n")
                    if not line.startswith("#"):
                        break
                    headers.append(line)
            if parse_info:
                info_fields = parse_info_fields(headers)
            if parse_formats:
                format_fields = parse_format_fields(headers)

        def records() -> Iterator[dict]:
            if partition.extra and partition.extra[0] == "empty":
                return
            if partition.extra and partition.extra[0] == "tabix":
                _, region, chunks = partition.extra
                name, lo, hi = parse_region(region)
                from exon_spark.sources.bgzf import BGZFReader

                with BGZFReader(partition.path) as bg:
                    for line in bg.lines_in_chunks(list(chunks)):
                        rec = _parse_line(line)
                        # residual predicate — chunks are supersets
                        if rec and rec["chrom"] == name and lo <= rec["pos"] <= hi:
                            yield rec
                return
            region_filters = None
            if partition.extra and partition.extra[0] == "filter":
                region_filters = [
                    parse_region(r.strip())
                    for r in partition.extra[1].split(",")
                    if r.strip()
                ]
            with open_maybe_compressed(partition.path, partition.compression) as fh:
                for raw in fh:
                    rec = _parse_line(raw.decode("utf-8", "replace").rstrip("\n"))
                    if rec is None:
                        continue
                    if region_filters is not None and not any(
                        rec["chrom"] == n and lo <= rec["pos"] <= hi
                        for n, lo, hi in region_filters
                    ):
                        continue
                    yield rec

        if not parse_info and not parse_formats:
            yield from records()
            return
        for rec in records():
            if parse_info:
                raw_info = rec["info"]
                kv: dict[str, str | None] = {}
                if raw_info:
                    for item in raw_info.split(";"):
                        k, eq, v = item.partition("=")
                        kv[k] = v if eq else None
                rec["info"] = {
                    name: _convert_info_value(kv.get(name), typ, is_list)
                    if name in kv
                    else None
                    for name, typ, is_list in (info_fields or [])
                }
            if parse_formats:
                rec["formats"] = convert_formats_text(
                    rec["formats"], format_fields or []
                )
            yield rec
