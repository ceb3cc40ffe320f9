"""BAM data source — pure-Python binary decoder over BGZF, with .bai-pruned
region scans.

Parity: reference ListingBAMTable
(exon/exon-core/src/datasources/bam/table_provider.rs; schema shared with
SAM, exon-sam/src/schema_builder.rs:383-397) and the .bai indexed path
(indexed_file/indexed_bgzf_file.rs:88-108).

Format: SAM spec §4 (BAM). Also provides ``build_bai`` so BAM files can be
indexed without htslib.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

from exon_spark.functions.region import parse_region
from exon_spark.sources.fs import fs_exists
from exon_spark.sources.base import FileFormatSource, FilePartition
from exon_spark.sources.util import FoundFile, detect_compression

_SEQ_CODE = "=ACMGRSVTWYHKDBN"
_SEQ_BYTE2 = [_SEQ_CODE[b >> 4] + _SEQ_CODE[b & 0xF] for b in range(256)]
_CIGAR_OPS = "MIDNSHP=X"
_REF_CONSUMING = frozenset("MDN=X")


def read_bam_header(stream) -> list[tuple[str, int]]:
    """Parse the BAM header from a BGZFStream; leaves the stream positioned
    at the first alignment record. Returns [(ref_name, ref_len)]."""
    magic = stream.read(4)
    if magic != b"BAM\x01":
        raise ValueError("not a BAM file")
    (l_text,) = struct.unpack("<i", stream.read(4))
    stream.read(l_text)
    (n_ref,) = struct.unpack("<i", stream.read(4))
    refs: list[tuple[str, int]] = []
    for _ in range(n_ref):
        (l_name,) = struct.unpack("<i", stream.read(4))
        name = stream.read(l_name)[:-1].decode()
        (l_ref,) = struct.unpack("<i", stream.read(4))
        refs.append((name, l_ref))
    return refs


def _ddl_of_native(v) -> str:
    if isinstance(v, bool):
        return "string"
    if isinstance(v, int):
        return "bigint"
    if isinstance(v, float):
        return "double"
    if isinstance(v, list):
        if v and isinstance(v[0], float):
            return "array<double>"
        return "array<bigint>"
    return "string"


def decode_record(
    data: bytes, refs: list[tuple[str, int]], typed_tags: bool = False
) -> dict:
    refid, pos, l_rn, mapq, _bin, n_cig, flag, l_seq, nrefid, npos, _tlen = (
        struct.unpack_from("<iiBBHHHiiii", data, 0)
    )
    off = 32
    name = data[off : off + l_rn - 1].decode()
    off += l_rn
    cigar_ops = struct.unpack_from(f"<{n_cig}I", data, off)
    off += 4 * n_cig
    n_seq_bytes = (l_seq + 1) // 2
    seq_packed = data[off : off + n_seq_bytes]
    off += n_seq_bytes
    qual = data[off : off + l_seq]
    off += l_seq

    cigar = "".join(f"{op >> 4}{_CIGAR_OPS[op & 0xF]}" for op in cigar_ops)
    ref_len = sum(
        op >> 4 for op in cigar_ops if _CIGAR_OPS[op & 0xF] in _REF_CONSUMING
    )
    # table-driven unpack: each packed byte maps to its 2-base string
    sequence = "".join(map(_SEQ_BYTE2.__getitem__, seq_packed))[:l_seq]
    quality = [] if (l_seq == 0 or (qual and qual[0] == 0xFF)) else list(qual)

    tags: list | dict = {} if typed_tags else []
    while off + 3 <= len(data):
        tag = data[off : off + 2].decode("ascii", "replace")
        typ = chr(data[off + 2])
        off += 3
        val, off = _decode_tag_value(data, off, typ)
        if typed_tags:
            # type 'A' (character) is numeric in the typed schema: the
            # reference shows XS:A:'-' as 45 (bam-select-tests.slt)
            tags[tag] = ord(val) if typ == "A" else val
        else:
            if isinstance(val, list):
                val = ",".join(str(v) for v in val)
            tags.append({"tag": tag, "value": str(val)})

    reference = refs[refid][0] if 0 <= refid < len(refs) else None
    mate_ref = refs[nrefid][0] if 0 <= nrefid < len(refs) else None
    unmapped = refid < 0 or pos < 0
    return {
        "name": name or None,
        "flag": flag,
        "reference": reference,
        "start": None if unmapped else pos + 1,
        "end": None if unmapped or ref_len == 0 else pos + ref_len,
        "mapping_quality": None if mapq == 255 else str(mapq),
        "cigar": cigar,
        "mate_reference": mate_ref,
        "sequence": sequence,
        "quality_score": quality,
        "tags": tags or None,
    }


def _decode_tag_value(data: bytes, off: int, typ: str):
    """Decode one tag value to a native Python value (int/float/str/list)."""
    if typ == "A":
        return chr(data[off]), off + 1
    if typ in "cC":
        v = struct.unpack_from("<b" if typ == "c" else "<B", data, off)[0]
        return v, off + 1
    if typ in "sS":
        v = struct.unpack_from("<h" if typ == "s" else "<H", data, off)[0]
        return v, off + 2
    if typ in "iI":
        v = struct.unpack_from("<i" if typ == "i" else "<I", data, off)[0]
        return v, off + 4
    if typ == "f":
        return struct.unpack_from("<f", data, off)[0], off + 4
    if typ in "ZH":
        end = data.index(b"\x00", off)
        return data[off:end].decode("ascii", "replace"), end + 1
    if typ == "B":
        sub = chr(data[off])
        (n,) = struct.unpack_from("<i", data, off + 1)
        off += 5
        fmt = {"c": "b", "C": "B", "s": "h", "S": "H", "i": "i", "I": "I", "f": "f"}[sub]
        size = struct.calcsize("<" + fmt)
        vals = list(struct.unpack_from(f"<{n}{fmt}", data, off))
        return vals, off + n * size
    raise ValueError(f"unknown BAM tag type {typ!r}")


def iter_bam_records(
    stream,
    refs: list[tuple[str, int]],
    stop_voffset: int | None = None,
    typed_tags: bool = False,
) -> Iterator[tuple[dict, int, int]]:
    """Yield (record, voffset_start, voffset_end) from a positioned stream."""
    while True:
        v_start = stream.tell_virtual()
        if stop_voffset is not None and v_start >= stop_voffset:
            return
        head = stream.read(4)
        if len(head) < 4:
            return
        (block_size,) = struct.unpack("<i", head)
        data = stream.read(block_size)
        if len(data) < block_size:
            return
        yield decode_record(data, refs, typed_tags), v_start, stream.tell_virtual()


class BamSource(FileFormatSource):
    NAME = "bam"
    EXTENSIONS = ("bam",)
    BASE_SCHEMA = (
        "name string, flag int, reference string, start bigint, end bigint, "
        "mapping_quality string, cigar string, mate_reference string, "
        "sequence string, quality_score array<bigint>, "
        "tags array<struct<tag string, value string>>"
    )

    def base_schema(self) -> str:
        from exon_spark.sources.sam import parse_tags_enabled, sample_tag_schema

        if not parse_tags_enabled(self.options):
            return self.BASE_SCHEMA
        from exon_spark.sources.bgzf import BGZFReader

        first = self._files()[0]

        def tag_samples():
            with BGZFReader(first.path) as bg:
                stream = bg.stream_from(0)
                refs = read_bam_header(stream)
                for i, (rec, _vs, _ve) in enumerate(
                    iter_bam_records(stream, refs, typed_tags=True)
                ):
                    for tag, v in (rec["tags"] or {}).items():
                        yield tag, v, _ddl_of_native(v)
                    if i >= 100:
                        return

        struct_ddl = sample_tag_schema(tag_samples())
        return self.BASE_SCHEMA.replace(
            "tags array<struct<tag string, value string>>", f"tags {struct_ddl}"
        )

    @classmethod
    def plan_partitions(cls, f: FoundFile, options: dict) -> list[FilePartition]:
        pv = tuple(sorted(f.partition_values.items()))
        regions = options.get("regions") or options.get("region")
        comp = "bgzf"
        if not regions and str(options.get("indexed", "")).lower() in ("true", "1"):
            raise ValueError(
                "INDEXED_BAM scan requires a region filter — add "
                ".option('regions', 'chr:lo-hi') or WHERE "
                "bam_region_filter('chr:lo-hi', reference, start, end)"
            )
        if regions:
            bai = f.path + ".bai"
            csi = f.path + ".csi"
            region_list = [r.strip() for r in regions.split(",") if r.strip()]
            if fs_exists(bai) or fs_exists(csi):
                from exon_spark.sources.bgzf import BGZFReader
                from exon_spark.sources.indexes import (
                    adaptive_target_bytes,
                    bai_chunks,
                    csi_chunks,
                    read_bai,
                    read_csi,
                    split_chunk_groups,
                )

                with BGZFReader(f.path) as bg:
                    refs = read_bam_header(bg.stream_from(0))
                ref_names = [n for n, _ in refs]
                index = read_bai(bai) if fs_exists(bai) else None
                cindex = None if index is not None else read_csi(csi)

                per_region = []
                for region in region_list:
                    name, lo, hi = parse_region(region)
                    if name not in ref_names:
                        continue
                    rid = ref_names.index(name)
                    if index is not None:
                        chunks = bai_chunks(index, rid, region)
                    else:
                        # samtools `index -c` .csi fallback: names come
                        # from the BAM's own header
                        chunks = csi_chunks(cindex, rid, lo, hi)
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
                    for group in split_chunk_groups(chunks, target):
                        parts.append(
                            FilePartition(
                                f.path, comp, pv, extra=("bai", region, tuple(group))
                            )
                        )
                if not parts:
                    parts = [FilePartition(f.path, comp, pv, extra=("empty",))]
                return parts
            return [FilePartition(f.path, comp, pv, extra=("filter", regions, ()))]
        bai = f.path + ".bai"
        if fs_exists(bai):
            # full scan, but the linear index gives record-boundary virtual
            # offsets — split the file so one BAM fans out across executors
            # (without an index BAM is unsplittable: one partition per file,
            # same as the reference's per-file parallelism)
            from exon_spark.sources.bgzf import BGZFReader
            from exon_spark.sources.indexes import read_bai

            with BGZFReader(f.path) as bg:
                stream = bg.stream_from(0)
                read_bam_header(stream)
                start0 = stream.tell_virtual()
            index = read_bai(bai)
            offs = sorted({v for lin in index.linear for v in lin if v > start0})
            from exon_spark.sources.indexes import adaptive_target_bytes

            par = int(options.get("target_parallelism", 0) or 0)
            target = adaptive_target_bytes(
                f.size, par, floor=1 << 20, ceil=16 << 20
            )  # compressed bytes per split
            splits = [start0]
            for v in offs:
                if (v >> 16) - (splits[-1] >> 16) >= target:
                    splits.append(v)
            bounds = list(zip(splits, splits[1:] + [None]))
            return [
                FilePartition(f.path, comp, pv, extra=("range", s, e))
                for s, e in bounds
            ]
        return [FilePartition(f.path, comp, pv)]

    @classmethod
    def parse_partition(cls, partition: FilePartition, options: dict) -> Iterator[dict]:
        from exon_spark.sources.bgzf import BGZFReader
        from exon_spark.sources.sam import parse_tags_enabled

        typed = parse_tags_enabled(options)
        if partition.extra and partition.extra[0] == "empty":
            return
        with BGZFReader(partition.path) as bg:
            stream = bg.stream_from(0)
            refs = read_bam_header(stream)
            if partition.extra and partition.extra[0] == "range":
                _, v_start, v_stop = partition.extra
                s = bg.stream_from(v_start)
                for rec, _vs, _ve in iter_bam_records(s, refs, stop_voffset=v_stop, typed_tags=typed):
                    yield rec
                return
            if partition.extra and partition.extra[0] == "bai":
                _, region, chunks = partition.extra
                name, lo, hi = parse_region(region)
                for cb, ce in chunks:
                    s = bg.stream_from(cb)
                    for rec, _vs, _ve in iter_bam_records(s, refs, stop_voffset=ce, typed_tags=typed):
                        if (
                            rec["reference"] == name
                            and rec["start"] is not None
                            and rec["start"] <= hi
                            and (rec["end"] or rec["start"]) >= lo
                        ):
                            yield rec
                return
            region_filters = None
            if partition.extra and partition.extra[0] == "filter":
                region_filters = [
                    parse_region(r.strip())
                    for r in partition.extra[1].split(",")
                    if r.strip()
                ]
            for rec, _vs, _ve in iter_bam_records(stream, refs, typed_tags=typed):
                if region_filters is not None and not any(
                    rec["reference"] == n
                    and rec["start"] is not None
                    and rec["start"] <= hi
                    and (rec["end"] or rec["start"]) >= lo
                    for n, lo, hi in region_filters
                ):
                    continue
                yield rec


def sam_to_bam(sam_path: str, bam_path: str) -> str:
    """Convert a SAM text file to BAM (pure Python; htslib-free). Reference
    sequences come from @SQ header lines."""
    from exon_spark.sources.bgzf import BGZFWriter
    from exon_spark.sources.indexes import reg2bin

    refs: list[tuple[str, int]] = []
    header_lines: list[str] = []
    records: list[str] = []
    with open(sam_path, "r", encoding="utf-8") as fh:
        for line in fh:
            line = line.rstrip("\n")
            if not line:
                continue
            if line.startswith("@"):
                header_lines.append(line)
                if line.startswith("@SQ"):
                    kv = dict(
                        p.split(":", 1) for p in line.split("\t")[1:] if ":" in p
                    )
                    refs.append((kv["SN"], int(kv.get("LN", 0))))
            else:
                records.append(line)
    ref_ids = {name: i for i, (name, _l) in enumerate(refs)}
    text = ("\n".join(header_lines) + "\n").encode()

    out = bytearray()
    out += b"BAM\x01"
    out += struct.pack("<i", len(text)) + text
    out += struct.pack("<i", len(refs))
    for name, l_ref in refs:
        nb = name.encode() + b"\x00"
        out += struct.pack("<i", len(nb)) + nb + struct.pack("<i", l_ref)

    seq_idx = {c: i for i, c in enumerate(_SEQ_CODE)}
    op_idx = {c: i for i, c in enumerate(_CIGAR_OPS)}
    for line in records:
        f = line.split("\t")
        qname, flag, rname, pos, mapq = f[0], int(f[1]), f[2], int(f[3]), int(f[4])
        cigar, rnext, _pnext, _tlen, seq, qual = f[5], f[6], f[7], f[8], f[9], f[10]
        refid = ref_ids.get(rname, -1)
        nrefid = refid if rnext == "=" else ref_ids.get(rnext, -1)
        pos0 = pos - 1
        ops = [] if cigar == "*" else _CIGAR_RE_OPS.findall(cigar)
        cigar_enc = [(int(n) << 4) | op_idx[op] for n, op in ops]
        ref_len = sum(int(n) for n, op in ops if op in _REF_CONSUMING)
        seq_s = "" if seq == "*" else seq
        l_seq = len(seq_s)
        packed = bytearray((l_seq + 1) // 2)
        for i, c in enumerate(seq_s):
            code = seq_idx.get(c.upper(), 15)
            packed[i // 2] |= code << 4 if i % 2 == 0 else code
        if qual == "*":
            qual_b = b"\xff" * l_seq
        else:
            qual_b = bytes(ord(c) - 33 for c in qual)
        name_b = qname.encode() + b"\x00"
        tag_b = bytearray()
        for t in f[11:]:
            parts = t.split(":", 2)
            if len(parts) != 3:
                continue
            tag, typ, val = parts
            tag_b += tag.encode()
            if typ == "i":
                tag_b += b"i" + struct.pack("<i", int(val))
            elif typ == "f":
                tag_b += b"f" + struct.pack("<f", float(val))
            else:
                tag_b += b"Z" + val.encode() + b"\x00"
        end0 = pos0 + max(ref_len, 1)
        rec = struct.pack(
            "<iiBBHHHiiii",
            refid,
            pos0 if refid >= 0 else -1,
            len(name_b),
            mapq,
            reg2bin(pos0, end0) if refid >= 0 else 4680,
            len(cigar_enc),
            flag,
            l_seq,
            nrefid,
            (int(f[7]) - 1) if f[7] != "0" and nrefid >= 0 else -1,
            int(f[8]),
        )
        rec += name_b
        rec += struct.pack(f"<{len(cigar_enc)}I", *cigar_enc)
        rec += bytes(packed) + qual_b + bytes(tag_b)
        out += struct.pack("<i", len(rec)) + rec

    with BGZFWriter(bam_path) as w:
        w.write(bytes(out))
    return bam_path


import re as _re

_CIGAR_RE_OPS = _re.compile(r"(\d+)([MIDNSHP=X])")
