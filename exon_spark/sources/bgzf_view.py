"""Index-pruned virtual views of BGZF files for JVM-side scans.

``build_region_view`` turns a set of tabix/CSI chunk ranges (virtual
offsets) into an ``exoncat://`` virtual file (ExonCatFileSystem,
exon_spark/jvm) that contains exactly the chunks' BGZF blocks:

- interior blocks are referenced *in place* (zero copy — the manifest
  points byte ranges of the original file);
- the partial blocks at each chunk boundary (virtual offsets carry an
  in-block byte offset) are decompressed, cut at the record boundary the
  index guarantees, and re-compressed into a tiny synthetic side file.

The resulting view is a valid standalone BGZF stream, so the splittable
BgzfCodec byte-range-splits it across executors like any .bgz file. This
is the JVM mirror of what the Python DataSources do with chunk-pruned
partitions (indexed_bgzf_file.rs:52-150 in the reference) — but the data
path stays entirely in the JVM text/csv readers.

Views are content-addressed ((path, mtime, size, chunks) hash) and cached
under $TMPDIR/exon_spark_views; rebuilding is a no-op when the manifest
already exists.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from exon_spark.sources.bgzf import BGZF_EOF, BGZFReader, bgzf_block


def codec_active(spark) -> bool:
    """True when the session was built with the splittable BGZF codec on
    io.compression.codecs (get_spark does this when the jar is present)."""
    try:
        from exon_spark.jvm import BGZF_CODEC_CLASS

        return BGZF_CODEC_CLASS in (
            spark.conf.get("spark.hadoop.io.compression.codecs", "") or ""
        )
    except Exception:
        return False


def full_view(path: str) -> str:
    """A ``.bgz``-named symlink to ``path`` — lets the splittable codec's
    suffix dispatch claim a bgzf file that carries a plain ``.gz`` name
    (the common bgzip convention), so full-file JVM text/csv scans
    byte-range split it with zero copies and zero Python."""
    st = os.stat(path)
    key = hashlib.sha1(
        repr((os.path.abspath(path), st.st_mtime_ns, st.st_size, "full")).encode()
    ).hexdigest()[:20]
    vdir = os.path.join(tempfile.gettempdir(), "exon_spark_views")
    os.makedirs(vdir, exist_ok=True)
    link = os.path.join(vdir, f"{key}.bgz")
    if not os.path.exists(link):
        tmp = link + f".tmp{os.getpid()}"
        try:
            os.symlink(os.path.abspath(path), tmp)
            os.replace(tmp, link)
        except OSError:
            if not os.path.exists(link):
                raise
    return link


def jvm_bgzf_src(spark, path: str, require_index: bool = True) -> str | None:
    """A path the JVM codec can byte-range split for a local bgzf text
    file, or None when the layout doesn't qualify. ``.bgz`` names pass
    through; ``.gz`` names qualify only when a ``.tbi`` proves the file is
    really BGZF (a plain-gzip .gff.gz must keep the unsplittable codec)."""
    low = path.lower()
    if not os.path.isfile(path) or not codec_active(spark):
        return None
    if low.endswith(".bgz"):
        return path
    if low.endswith(".gz") and os.path.exists(path + ".tbi"):
        return full_view(path)
    return None


def merge_chunks(chunks: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Sort + merge overlapping/adjacent virtual-offset ranges."""
    out: list[tuple[int, int]] = []
    for vb, ve in sorted(chunks):
        if ve <= vb:
            continue
        if out and vb <= out[-1][1]:
            out[-1] = (out[-1][0], max(out[-1][1], ve))
        else:
            out.append((vb, ve))
    return out


def build_region_view(path: str, chunks: list[tuple[int, int]]) -> str:
    """Build (or reuse) a virtual .bgz view of ``path`` holding exactly the
    records in ``chunks`` (tabix virtual-offset ranges). Returns the
    ``exoncat://`` URI of the view."""
    merged = merge_chunks(chunks)
    if not merged:
        raise ValueError("no chunks to view")
    st = os.stat(path)
    key = hashlib.sha1(
        repr((os.path.abspath(path), st.st_mtime_ns, st.st_size, merged)).encode()
    ).hexdigest()[:20]
    vdir = os.path.join(tempfile.gettempdir(), "exon_spark_views")
    os.makedirs(vdir, exist_ok=True)
    view = os.path.join(vdir, f"{key}.bgz")
    manifest = view + ".manifest"
    if os.path.exists(manifest):
        return "exoncat://" + view

    synth_path = view + ".synth"
    segments: list[tuple[str, int, int]] = []
    synth = bytearray()

    def add_synth(blob: bytes) -> None:
        if blob:
            segments.append((synth_path, len(synth), len(blob)))
            synth.extend(blob)

    with BGZFReader(path) as bg:
        for vb, ve in merged:
            cb, ub = vb >> 16, vb & 0xFFFF
            ce, ue = ve >> 16, ve & 0xFFFF
            bg._load_block(cb)
            if cb == ce:
                add_synth(bgzf_block(bg._block_data[ub:ue]))
                continue
            if ub > 0:
                add_synth(bgzf_block(bg._block_data[ub:]))
                mid_start = bg._block_next_coffset
            else:
                mid_start = cb
            if mid_start < ce:
                segments.append((os.path.abspath(path), mid_start, ce - mid_start))
            if ue > 0:
                bg._load_block(ce)
                add_synth(bgzf_block(bg._block_data[:ue]))
    add_synth(BGZF_EOF)

    tmp = manifest + f".tmp{os.getpid()}"
    with open(synth_path + f".tmp{os.getpid()}", "wb") as fh:
        fh.write(bytes(synth))
    os.replace(synth_path + f".tmp{os.getpid()}", synth_path)
    with open(tmp, "w") as fh:
        for p, start, length in segments:
            fh.write(f"{p}\t{start}\t{length}\n")
    os.replace(tmp, manifest)
    return "exoncat://" + view
