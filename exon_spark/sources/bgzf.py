"""Pure-Python BGZF reader with virtual-offset seeks.

BGZF (the blocked-gzip variant used by bgzipped VCF/BED/GFF and BAM) stores
a series of <=64 KiB gzip members; a *virtual offset* is
``coffset << 16 | uoffset`` — compressed offset of a block plus uncompressed
offset within it. Index-driven region scans (tabix/.bai chunks) seek these
offsets; mirrors the reference's use of noodles bgzf readers
(exon/exon-core/src/datasources/indexed_file/indexed_bgzf_file.rs:52-150).

Format reference: SAM spec §4.1 (BGZF compression format).
"""

from __future__ import annotations

import struct
import zlib


BGZF_EOF = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000"
)


def bgzf_block(chunk: bytes, level: int = 6) -> bytes:
    """One complete BGZF block (gzip member with BC extra field) holding
    ``chunk`` (must be <= 64 KiB uncompressed)."""
    comp = zlib.compressobj(level, zlib.DEFLATED, -15)
    cdata = comp.compress(chunk) + comp.flush()
    bsize = len(cdata) + 25 + 1  # header(12)+extra(6)+cdata+crc(4)+isize(4)
    header = (
        b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"
        + struct.pack("<H", 6)
        + b"BC"
        + struct.pack("<H", 2)
        + struct.pack("<H", bsize - 1)
    )
    footer = struct.pack("<I", zlib.crc32(chunk) & 0xFFFFFFFF) + struct.pack(
        "<I", len(chunk)
    )
    return header + cdata + footer


class BGZFWriter:
    """Write BGZF blocks (<=64 KiB uncompressed each) + EOF marker. Used by
    the bgzip compression codec for our writers and the tabix builder."""

    MAX_BLOCK = 0xFF00  # leave header room like htslib

    def __init__(self, path: str):
        self.fh = open(path, "wb")
        self.buf = bytearray()

    def write(self, data: bytes) -> None:
        self.buf += data
        while len(self.buf) >= self.MAX_BLOCK:
            self._flush_block(self.buf[: self.MAX_BLOCK])
            del self.buf[: self.MAX_BLOCK]

    def tell_virtual(self) -> int:
        """Virtual offset of the next byte to be written."""
        return (self.fh.tell() << 16) | len(self.buf)

    def _flush_block(self, chunk: bytes) -> None:
        self.fh.write(bgzf_block(bytes(chunk)))

    def close(self) -> None:
        if self.buf:
            self._flush_block(bytes(self.buf))
            self.buf.clear()
        self.fh.write(BGZF_EOF)
        self.fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def bgzip_file(src: str, dst: str) -> None:
    """Compress a plain file into BGZF."""
    with open(src, "rb") as fin, BGZFWriter(dst) as out:
        while True:
            chunk = fin.read(1 << 20)
            if not chunk:
                break
            out.write(chunk)


class BGZFReader:
    def __init__(self, path: str):
        from exon_spark.sources.fs import fs_open

        self.fh = fs_open(path)
        self._block_coffset = -1
        self._block_data = b""
        self._block_next_coffset = -1

    def close(self) -> None:
        self.fh.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def _load_block(self, coffset: int) -> None:
        """Decompress the block starting at compressed offset ``coffset``."""
        if coffset == self._block_coffset:
            return
        self.fh.seek(coffset)
        header = self.fh.read(18)
        if len(header) < 18:
            self._block_coffset = coffset
            self._block_data = b""
            self._block_next_coffset = coffset
            return
        if header[:2] != b"\x1f\x8b":
            raise ValueError(f"not a gzip block at offset {coffset}")
        xlen = struct.unpack_from("<H", header, 10)[0]
        extra = header[12:18]
        # find BSIZE in the extra field (SI1=66, SI2=67)
        bsize = None
        extra_full = extra + self.fh.read(xlen - 6) if xlen > 6 else extra
        i = 0
        while i + 4 <= len(extra_full):
            si1, si2, slen = extra_full[i], extra_full[i + 1], struct.unpack_from("<H", extra_full, i + 2)[0]
            if si1 == 66 and si2 == 67 and slen == 2:
                bsize = struct.unpack_from("<H", extra_full, i + 4)[0] + 1
                break
            i += 4 + slen
        if bsize is None:
            raise ValueError(f"missing BGZF BSIZE at offset {coffset}")
        self.fh.seek(coffset)
        block = self.fh.read(bsize)
        cdata = block[12 + xlen : -8]
        self._block_data = zlib.decompress(cdata, wbits=-15)
        self._block_coffset = coffset
        self._block_next_coffset = coffset + bsize

    def read_range(self, voff_start: int, voff_end: int) -> bytes:
        """Uncompressed bytes between two virtual offsets.

        Multi-block ranges take a bulk path: ONE contiguous compressed read
        covering the whole span, then an in-memory block walk — a range of
        N blocks costs 1 seek + 1 read instead of 2N (measured ~2x on
        index-pruned VCF scans; a BGZF block is <= 64 KiB compressed, so the
        span read is end_coffset - coffset + 65536 bytes)."""
        coffset = voff_start >> 16
        uoffset = voff_start & 0xFFFF
        end_coffset = voff_end >> 16
        end_uoffset = voff_end & 0xFFFF
        if end_coffset > coffset:
            self.fh.seek(coffset)
            span = self.fh.read(end_coffset - coffset + 65536)
            out = []
            off = 0
            while True:
                abs_co = coffset + off
                if abs_co > end_coffset or off + 18 > len(span):
                    break
                if span[off : off + 2] != b"\x1f\x8b":
                    raise ValueError(f"not a gzip block at offset {abs_co}")
                xlen = struct.unpack_from("<H", span, off + 10)[0]
                bsize = None
                i = off + 12
                ext_end = i + xlen
                while i + 4 <= ext_end:
                    si1, si2 = span[i], span[i + 1]
                    slen = struct.unpack_from("<H", span, i + 2)[0]
                    if si1 == 66 and si2 == 67 and slen == 2:
                        bsize = struct.unpack_from("<H", span, i + 4)[0] + 1
                        break
                    i += 4 + slen
                if bsize is None:
                    raise ValueError(f"missing BGZF BSIZE at offset {abs_co}")
                cdata = span[off + 12 + xlen : off + bsize - 8]
                data = zlib.decompress(cdata, wbits=-15)
                s = uoffset if abs_co == coffset else 0
                e = end_uoffset if abs_co == end_coffset else len(data)
                out.append(data[s:e])
                if abs_co == end_coffset:
                    break
                off += bsize
            return b"".join(out)
        out = []
        while True:
            self._load_block(coffset)
            data = self._block_data
            if not data and self._block_next_coffset == coffset:
                break  # EOF
            if coffset == end_coffset:
                out.append(data[uoffset:end_uoffset])
                break
            out.append(data[uoffset:])
            coffset = self._block_next_coffset
            uoffset = 0
            if coffset > end_coffset:
                break
        return b"".join(out)

    # -- sequential byte-stream interface (used by the BAM decoder) --

    def stream_from(self, voffset: int = 0) -> "BGZFStream":
        return BGZFStream(self, voffset)

    def lines_with_voffsets(self):
        """Sequentially yield (line_text, voffset_start, voffset_end) for
        every line — the scan the tabix builder runs."""
        coffset = 0
        leftover = b""
        leftover_voff = 0
        while True:
            self._load_block(coffset)
            data = self._block_data
            next_co = self._block_next_coffset
            if not data:
                if leftover:
                    yield leftover.decode("utf-8", "replace"), leftover_voff, coffset << 16
                return
            start = 0
            while start < len(data):
                nl = data.find(b"\n", start)
                if nl == -1:
                    if not leftover:
                        leftover_voff = (coffset << 16) | start
                    leftover += data[start:]
                    break
                chunk = data[start:nl]
                if leftover:
                    v_start = leftover_voff
                    chunk = leftover + chunk
                    leftover = b""
                else:
                    v_start = (coffset << 16) | start
                v_end = (
                    ((coffset << 16) | (nl + 1))
                    if nl + 1 < len(data)
                    else (next_co << 16)
                )
                yield chunk.decode("utf-8", "replace"), v_start, v_end
                start = nl + 1
            coffset = next_co

    def lines_in_chunks(self, chunks: list[tuple[int, int]]):
        """Yield complete text lines covered by the (merged, sorted) chunk
        list. A record straddling a chunk end is completed by reading on
        (tabix guarantees a record's start chunk covers it; we extend to the
        record's newline)."""
        for cb, ce in chunks:
            data = self.read_range(cb, ce)
            if not data.endswith(b"\n"):
                # finish the last record
                coffset = ce >> 16
                uoffset = ce & 0xFFFF
                while True:
                    self._load_block(coffset)
                    block = self._block_data
                    if not block:
                        break
                    nl = block.find(b"\n", uoffset)
                    if nl != -1:
                        data += block[uoffset : nl + 1]
                        break
                    data += block[uoffset:]
                    coffset = self._block_next_coffset
                    uoffset = 0
            for line in data.split(b"\n"):
                if line:
                    yield line.decode("utf-8", "replace")


class BGZFStream:
    """Sequential reader over BGZF content starting at a virtual offset,
    crossing block boundaries transparently. ``tell_virtual`` reports the
    current virtual offset (used by the .bai builder)."""

    def __init__(self, reader: BGZFReader, voffset: int = 0):
        self.r = reader
        self.coffset = voffset >> 16
        self.uoffset = voffset & 0xFFFF
        self.r._load_block(self.coffset)

    def tell_virtual(self) -> int:
        return (self.coffset << 16) | self.uoffset

    def read(self, n: int) -> bytes:
        out = bytearray()
        while n > 0:
            self.r._load_block(self.coffset)
            data = self.r._block_data
            if not data:
                break  # EOF
            take = data[self.uoffset : self.uoffset + n]
            out += take
            n -= len(take)
            self.uoffset += len(take)
            if self.uoffset >= len(data):
                self.coffset = self.r._block_next_coffset
                self.uoffset = 0
                # stop at EOF marker (empty final block)
                self.r._load_block(self.coffset)
                if not self.r._block_data:
                    break
        return bytes(out)
