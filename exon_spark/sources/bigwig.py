"""BigWig data sources — pure-Python BBI format decoder.

Parity: reference exon-bigwig crate (value schema
value_batch_reader/config.rs:30-33; zoom schema
zoom_batch_reader/config.rs:33-41; table providers
datasources/bigwig/{value,zoom}/table_provider.rs:175-191 — zoom requires a
``reduction_level`` option, region filters prune via the native R-tree).

BBI layout (kent src bbiFile.h): 64-byte header (magic 0x888FFC26), zoom
header array, chromosome id<->name B+ tree, zlib-compressed data sections
located by an R-tree per level. Value sections decode bedGraph / varStep /
fixedStep items; zoom sections are 32-byte summary records.

Scale: region scans traverse the R-tree driver-side and emit one partition
per overlapping leaf-block group, so a big region fans out across
executors; full scans emit one partition per file (sections are compressed
and must be walked via the tree, like the reference).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

from exon_spark.sources.base import FileFormatSource, FilePartition
from exon_spark.sources.util import FoundFile

_BIGWIG_MAGIC = 0x888FFC26
_CHROM_TREE_MAGIC = 0x78CA8C91
_RTREE_MAGIC = 0x2468ACE0


class BbiFile:
    """Minimal random-access BBI reader (driver- and executor-side)."""

    def __init__(self, path: str):
        self.path = path
        from exon_spark.sources.fs import fs_open

        self.fh = fs_open(path)
        hdr = self.fh.read(64)
        (magic,) = struct.unpack_from("<I", hdr, 0)
        if magic != _BIGWIG_MAGIC:
            raise ValueError(f"{path}: not a BigWig file (magic {magic:#x})")
        (
            self.version,
            self.zoom_levels,
            self.chrom_tree_offset,
            self.full_data_offset,
            self.full_index_offset,
            self.field_count,
            self.defined_field_count,
            self.auto_sql_offset,
            self.total_summary_offset,
            self.uncompress_buf_size,
        ) = struct.unpack_from("<HHQQQHHQQI", hdr, 4)
        self.zooms = []  # (reduction_level, data_offset, index_offset)
        for _ in range(self.zoom_levels):
            rl, _res, do, io = struct.unpack("<IIQQ", self.fh.read(24))
            self.zooms.append((rl, do, io))
        self.chroms: dict[int, tuple[str, int]] = {}  # id -> (name, size)
        self._read_chrom_tree()

    def close(self) -> None:
        self.fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _read_chrom_tree(self) -> None:
        self.fh.seek(self.chrom_tree_offset)
        magic, _bs, key_size, _vs, _count, _res = struct.unpack(
            "<IIIIQQ", self.fh.read(32)
        )
        if magic != _CHROM_TREE_MAGIC:
            raise ValueError("bad chromosome B+ tree magic")

        def walk(offset: int) -> None:
            self.fh.seek(offset)
            is_leaf, _res, count = struct.unpack("<BBH", self.fh.read(4))
            if is_leaf:
                for _ in range(count):
                    key = self.fh.read(key_size).rstrip(b"\x00").decode()
                    cid, csize = struct.unpack("<II", self.fh.read(8))
                    self.chroms[cid] = (key, csize)
            else:
                children = []
                for _ in range(count):
                    self.fh.read(key_size)
                    (child,) = struct.unpack("<Q", self.fh.read(8))
                    children.append(child)
                for child in children:
                    walk(child)

        walk(self.chrom_tree_offset + 32)

    def rtree_leaves(
        self,
        index_offset: int,
        chrom_ix: int | None = None,
        start: int = 0,
        end: int = 1 << 62,
    ) -> list[tuple[int, int]]:
        """(data_offset, data_size) of leaf blocks overlapping the query
        (whole file when chrom_ix is None), in file order."""
        self.fh.seek(index_offset)
        magic = struct.unpack("<I", self.fh.read(4))[0]
        if magic != _RTREE_MAGIC:
            raise ValueError("bad R-tree magic")
        self.fh.read(44)  # blockSize..reserved
        root = index_offset + 48

        def overlaps(sci, sb, eci, eb) -> bool:
            if chrom_ix is None:
                return True
            if (eci, eb) <= (chrom_ix, start) if eci < chrom_ix else False:
                return False
            # interval [(sci,sb), (eci,eb)) vs [(ci,start), (ci,end))
            return (sci, sb) < (chrom_ix, end) and (chrom_ix, start) < (eci, eb)

        out: list[tuple[int, int]] = []

        def walk(offset: int) -> None:
            self.fh.seek(offset)
            is_leaf, _res, count = struct.unpack("<BBH", self.fh.read(4))
            if is_leaf:
                data = self.fh.read(32 * count)
                for i in range(count):
                    sci, sb, eci, eb, do, ds = struct.unpack_from(
                        "<IIIIQQ", data, 32 * i
                    )
                    if overlaps(sci, sb, eci, eb):
                        out.append((do, ds))
            else:
                data = self.fh.read(24 * count)
                children = []
                for i in range(count):
                    sci, sb, eci, eb, child = struct.unpack_from(
                        "<IIIIQ", data, 24 * i
                    )
                    if overlaps(sci, sb, eci, eb):
                        children.append(child)
                for child in children:
                    walk(child)

        walk(root)
        return out

    def read_block(self, data_offset: int, data_size: int) -> bytes:
        self.fh.seek(data_offset)
        raw = self.fh.read(data_size)
        if self.uncompress_buf_size > 0:
            raw = zlib.decompress(raw)
        return raw

    def iter_values(self, blocks: list[tuple[int, int]]) -> Iterator[dict]:
        """Decode value sections (bedGraph=1, varStep=2, fixedStep=3)."""
        for do, ds in blocks:
            data = self.read_block(do, ds)
            (
                chrom_id,
                _cstart,
                _cend,
                item_step,
                item_span,
                stype,
                _res,
                item_count,
            ) = struct.unpack_from("<IIIIIBBH", data, 0)
            name = self.chroms.get(chrom_id, (str(chrom_id), 0))[0]
            off = 24
            if stype == 1:  # bedGraph
                for _ in range(item_count):
                    s, e, v = struct.unpack_from("<IIf", data, off)
                    off += 12
                    yield {"name": name, "start": s, "end": e, "value": v}
            elif stype == 2:  # varStep
                for _ in range(item_count):
                    s, v = struct.unpack_from("<If", data, off)
                    off += 8
                    yield {"name": name, "start": s, "end": s + item_span, "value": v}
            elif stype == 3:  # fixedStep
                s = _cstart
                for _ in range(item_count):
                    (v,) = struct.unpack_from("<f", data, off)
                    off += 4
                    yield {"name": name, "start": s, "end": s + item_span, "value": v}
                    s += item_step

    def iter_zoom(self, blocks: list[tuple[int, int]]) -> Iterator[dict]:
        """Decode 32-byte zoom summary records. ``total_items`` is emitted as
        0 for parity with the reference (bigwig-tests.slt goldens)."""
        for do, ds in blocks:
            data = self.read_block(do, ds)
            for off in range(0, len(data) - 31, 32):
                cid, s, e, valid, mn, mx, sum_d, sum_sq = struct.unpack_from(
                    "<IIIIffff", data, off
                )
                yield {
                    "name": self.chroms.get(cid, (str(cid), 0))[0],
                    "start": s,
                    "end": e,
                    "total_items": 0,
                    "bases_covered": valid,
                    "max_value": float(mx),
                    "min_value": float(mn),
                    "sum_squares": float(sum_sq),
                    "sum": float(sum_d),
                }


def _region_plan(path: str, options: dict, index_of) -> list | None:
    """Shared region planning: parse the regions option, traverse the R-tree
    driver-side, return [(region, blocks)] or None for a full scan."""
    regions = options.get("regions") or options.get("region")
    if not regions:
        return None
    from exon_spark.functions.region import expand_regions, parse_region

    out = []
    with BbiFile(path) as bw:
        name_to_ix = {nm: cid for cid, (nm, _sz) in bw.chroms.items()}
        for region in expand_regions(regions):
            name, lo, hi = parse_region(region)
            if name not in name_to_ix:
                continue
            blocks = bw.rtree_leaves(
                index_of(bw),
                chrom_ix=name_to_ix[name],
                start=max(lo - 1, 0),
                end=min(hi, 1 << 31),
            )
            if blocks:
                out.append((region, tuple(blocks)))
    return out


class BigWigValueSource(FileFormatSource):
    NAME = "bigwig_value"
    EXTENSIONS = ("bw", "bigwig")
    # exon-bigwig/src/value_batch_reader/config.rs:30-33
    BASE_SCHEMA = "name string, start int, end int, value float"

    @classmethod
    def plan_partitions(cls, f: FoundFile, options: dict) -> list[FilePartition]:
        pv = tuple(sorted(f.partition_values.items()))
        plan = _region_plan(f.path, options, lambda bw: bw.full_index_offset)
        if plan is None:
            return [FilePartition(f.path, None, pv)]
        if not plan:
            return [FilePartition(f.path, None, pv, extra=("empty",))]
        return [
            FilePartition(f.path, None, pv, extra=("blocks", region, blocks))
            for region, blocks in plan
        ]

    @classmethod
    def parse_partition(cls, partition: FilePartition, options: dict) -> Iterator[dict]:
        if partition.extra and partition.extra[0] == "empty":
            return
        with BbiFile(partition.path) as bw:
            if partition.extra and partition.extra[0] == "blocks":
                from exon_spark.functions.region import parse_region

                _, region, blocks = partition.extra
                name, lo, hi = parse_region(region)
                for rec in bw.iter_values(list(blocks)):
                    # residual predicate — R-tree blocks are supersets
                    if rec["name"] == name and rec["end"] > lo - 1 and rec["start"] < hi:
                        yield rec
            else:
                yield from bw.iter_values(
                    bw.rtree_leaves(bw.full_index_offset)
                )


class BigWigZoomSource(FileFormatSource):
    NAME = "bigwig_zoom"
    EXTENSIONS = ("bw", "bigwig")
    # exon-bigwig/src/zoom_batch_reader/config.rs:33-41
    BASE_SCHEMA = (
        "name string, start int, end int, total_items int, bases_covered int, "
        "max_value double, min_value double, sum_squares double, sum double"
    )

    @staticmethod
    def _zoom_index(bw: BbiFile, options: dict) -> tuple[int, int]:
        """(data_offset, index_offset) of the zoom level matching the
        required reduction_level option (table_provider.rs:175-191)."""
        rl = options.get("reduction_level")
        if rl is None:
            raise ValueError(
                "BIGWIG_ZOOM requires OPTIONS (reduction_level '<n>') — "
                f"available: {[z[0] for z in bw.zooms]}"
            )
        rl = int(rl)
        for level, do, io in bw.zooms:
            if level == rl:
                return do, io
        raise ValueError(
            f"no zoom level {rl} in {bw.path}; available: {[z[0] for z in bw.zooms]}"
        )

    @classmethod
    def plan_partitions(cls, f: FoundFile, options: dict) -> list[FilePartition]:
        pv = tuple(sorted(f.partition_values.items()))
        plan = _region_plan(
            f.path, options, lambda bw: cls._zoom_index(bw, options)[1]
        )
        if plan is None:
            return [FilePartition(f.path, None, pv)]
        if not plan:
            return [FilePartition(f.path, None, pv, extra=("empty",))]
        return [
            FilePartition(f.path, None, pv, extra=("blocks", region, blocks))
            for region, blocks in plan
        ]

    @classmethod
    def parse_partition(cls, partition: FilePartition, options: dict) -> Iterator[dict]:
        if partition.extra and partition.extra[0] == "empty":
            return
        with BbiFile(partition.path) as bw:
            if partition.extra and partition.extra[0] == "blocks":
                from exon_spark.functions.region import parse_region

                _, region, blocks = partition.extra
                name, lo, hi = parse_region(region)
                for rec in bw.iter_zoom(list(blocks)):
                    if rec["name"] == name and rec["end"] > lo - 1 and rec["start"] < hi:
                        yield rec
            else:
                _do, io = cls._zoom_index(bw, options)
                yield from bw.iter_zoom(bw.rtree_leaves(io))
