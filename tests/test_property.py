"""Property-based tests (hypothesis) for the pure-Python codec layer.

The reference has no randomized testing (SURVEY.md §5.4); these go beyond
it on the components where a subtle off-by-one corrupts everything
downstream: BGZF block framing / virtual offsets, Phred quality
encode/decode, and region-string parsing.

Session-free — no Spark; safe to run first and fast.
"""

from __future__ import annotations

import gzip
import os

from hypothesis import given, settings
from hypothesis import strategies as st

from exon_spark.sources.bgzf import BGZFReader, BGZFWriter

_SETTINGS = dict(max_examples=50, deadline=None)


@settings(**_SETTINGS)
@given(
    chunks=st.lists(st.binary(min_size=0, max_size=200_000), min_size=0, max_size=8)
)
def test_bgzf_roundtrip(tmp_path_factory, chunks):
    """Anything written through BGZFWriter reads back identically — via
    plain gzip (BGZF is valid multi-member gzip) AND via the block reader
    from virtual offset 0."""
    path = str(tmp_path_factory.mktemp("bgzf") / "t.bgz")
    payload = b"".join(chunks)
    with BGZFWriter(path) as w:
        for c in chunks:
            w.write(c)
    with gzip.open(path, "rb") as fh:
        assert fh.read() == payload
    with BGZFReader(path) as bg:
        stream = bg.stream_from(0)
        assert stream.read(len(payload) + 10)[: len(payload)] == payload


@settings(**_SETTINGS)
@given(data=st.binary(min_size=1, max_size=300_000), cut=st.integers(0, 299_999))
def test_bgzf_virtual_offset_seek(tmp_path_factory, data, cut):
    """tell_virtual() after writing a prefix is a valid seek target: the
    stream from that virtual offset yields exactly the suffix."""
    cut = cut % len(data)
    path = str(tmp_path_factory.mktemp("bgzf") / "t.bgz")
    with BGZFWriter(path) as w:
        w.write(data[:cut])
        voff = w.tell_virtual()
        w.write(data[cut:])
    with BGZFReader(path) as bg:
        stream = bg.stream_from(voff)
        assert stream.read(len(data)) == data[cut:]


@settings(**_SETTINGS)
@given(scores=st.lists(st.integers(0, 93), min_size=0, max_size=500))
def test_phred_roundtrip_python(scores):
    """Phred+33: encode(decode(s)) == s at the Python level the pandas path
    mirrors (chr(q+33) / ord(c)-33)."""
    encoded = "".join(chr(q + 33) for q in scores)
    decoded = [ord(c) - 33 for c in encoded]
    assert decoded == scores


@settings(**_SETTINGS)
@given(
    name=st.text(
        alphabet=st.characters(whitelist_categories=("L", "N"), whitelist_characters="_."),
        min_size=1,
        max_size=20,
    ),
    lo=st.integers(1, 2**31 - 2),
    span=st.integers(0, 10_000_000),
)
def test_parse_region_roundtrip(name, lo, span):
    from exon_spark.functions.region import parse_region

    hi = lo + span
    assert parse_region(f"{name}:{lo}-{hi}") == (name, lo, hi)
    # bare-chromosome form: full-range interval
    n2, l2, h2 = parse_region(name)
    assert n2 == name and l2 <= 1 and h2 >= 2**31 - 2


@settings(**_SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 10_000_000), st.binary(min_size=0, max_size=50)),
        min_size=1,
        max_size=60,
    )
)
def test_bgzf_lines_in_chunks_whole_file(tmp_path_factory, rows):
    """lines_in_chunks over the whole-file chunk returns every line written,
    regardless of how lines straddle block boundaries."""
    lines = [
        b"line" + str(pos).encode() + b"\t" + extra.replace(b"\n", b"").replace(b"\r", b"")
        for pos, extra in rows
    ]
    path = str(tmp_path_factory.mktemp("bgzf") / "t.bgz")
    with BGZFWriter(path) as w:
        for ln in lines:
            w.write(ln + b"\n")
        end = w.tell_virtual()
    with BGZFReader(path) as bg:
        got = list(bg.lines_in_chunks([(0, end)]))
    # the reader decodes utf-8 with errors="replace" (raw bytes may be
    # arbitrary); mirror that in the expectation
    assert got == [ln.decode("utf-8", "replace") for ln in lines]


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.integers(min_value=1, max_value=200_000),  # record lengths
        min_size=1,
        max_size=40,
    )
)
def test_fixtures_xl_voffset_arithmetic(tmp_path_factory, lens):
    """The XL fixture generator derives every record's BGZF virtual offset
    arithmetically (no re-read); reading each derived (start, end) range
    through the real BGZFReader must return exactly that record's bytes —
    including records straddling many blocks and records ending exactly on
    a block boundary."""
    import numpy as np

    from exon_spark.queries.fixtures_xl import _compress_blocks, _voffsets

    recs = [bytes([65 + (i % 26)]) * n for i, n in enumerate(lens)]
    blob = b"".join(recs)
    stream, sizes = _compress_blocks(blob)
    lens_a = np.array([len(r) for r in recs], np.int64)
    offs = np.zeros(len(recs), np.int64)
    np.cumsum(lens_a[:-1], out=offs[1:])
    v_start, v_end = _voffsets(offs, lens_a, sizes)
    d = tmp_path_factory.mktemp("xlprop")
    p = os.path.join(str(d), "x.bgzf")
    from exon_spark.sources.bgzf import BGZF_EOF

    with open(p, "wb") as fh:
        fh.write(stream)
        fh.write(BGZF_EOF)
    with BGZFReader(p) as bg:
        for i, rec in enumerate(recs):
            got = bg.read_range(int(v_start[i]), int(v_end[i]))
            assert got == rec, f"record {i} (len {len(rec)})"


@settings(max_examples=60, deadline=None)
@given(
    n_chunks=st.integers(1, 6),
    n_cuts=st.integers(0, 40),
    target=st.integers(1, 64),
    data=st.data(),
)
def test_dsv2_partition_planner_tiles_chunks(n_chunks, n_cuts, target, data):
    """_plan_dsv2_partitions must tile the tabix chunks exactly for ANY
    linear index / chunk layout / target: ranges are disjoint, ordered,
    and their union equals the chunk list — no record window lost or
    duplicated at a cut — and the partition count never exceeds the
    number of subranges."""
    from exon_spark.sources.indexes import TabixIndex
    from exon_spark.sources.jvm_fast import _plan_dsv2_partitions

    # random disjoint chunks in virtual-offset space
    points = sorted(
        data.draw(
            st.lists(
                st.integers(0, 1 << 40),
                min_size=2 * n_chunks,
                max_size=2 * n_chunks,
                unique=True,
            )
        )
    )
    chunks = [(points[2 * i], points[2 * i + 1]) for i in range(n_chunks)]
    # linear index: sorted voffsets anywhere in range (tabix ioffs are
    # monotonic record starts; the planner must not care where they fall)
    lin = sorted(
        data.draw(
            st.lists(st.integers(0, 1 << 40), min_size=n_cuts, max_size=n_cuts)
        )
    )
    index = TabixIndex(
        names=["c"],
        bins=[{4681: list(chunks)}],
        linear=[lin],
        col_seq=1,
        col_begin=2,
        col_end=0,
        zero_based=False,
        skip=0,
        meta_char="#",
    )
    parts = _plan_dsv2_partitions(index, ["c"], target)
    assert all(ridx == 0 for ridx, _ranges in parts)
    flat = [r for _ridx, ranges in parts for r in ranges]
    # disjoint + ordered
    for (b0, e0), (b1, _e1) in zip(flat, flat[1:]):
        assert b0 < e0 and e0 <= b1
    # union == chunks (merge adjacent subranges back together)
    merged = []
    for b, e in flat:
        if merged and merged[-1][1] == b:
            merged[-1][1] = e
        else:
            merged.append([b, e])
    # tabix_chunks merges overlapping chunk input; compare against that
    from exon_spark.sources.indexes import tabix_chunks

    expect = tabix_chunks(index, "c")
    assert [tuple(m) for m in merged] == [tuple(c) for c in expect]
    assert len(parts) <= max(1, len(flat))


@settings(**_SETTINGS)
@given(
    words=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=8),
        min_size=1,
        max_size=30,
    ),
    target=st.text(alphabet="abcde", min_size=1, max_size=12),
)
def test_bpe_segment_reconstructs_word(words, target):
    """For ANY learned merge table and ANY word (seen or unseen), the
    segmentation concatenates back to word + EOW — merges only ever fuse
    adjacent symbols, so no characters are lost, duplicated, or
    reordered."""
    from exon_spark.operators.bpe import EOW, _merge_loop, _segment_word

    merges = _merge_loop([(w, 1 + i % 3) for i, w in enumerate(words)], 20, 2)
    ranks = {p: i for i, p in enumerate(merges)}
    segs = _segment_word(target, ranks)
    assert "".join(segs) == target + EOW
    assert all(segs)  # no empty pieces


@settings(**_SETTINGS)
@given(
    pieces=st.lists(
        st.text(alphabet="abcd", min_size=1, max_size=6),
        min_size=1,
        max_size=25,
    ),
    word=st.text(alphabet="abcde", min_size=1, max_size=15),
)
def test_unigram_viterbi_reconstructs_word(pieces, word):
    """For ANY piece vocabulary (random logprobs; 'e' only ever enters
    via the UNK fallback) and ANY word, Viterbi segmentation covers the
    word exactly: pieces concatenate back, none empty, and the path
    respects max_piece_len."""
    import math

    from exon_spark.operators.unigram import _viterbi

    vocab = {
        p: math.log((i + 1) / (len(pieces) + 1) / 2)
        for i, p in enumerate(sorted(set(pieces)))
    }
    segs = _viterbi(word, vocab, max_piece_len=4)
    assert "".join(segs) == word
    assert all(segs)
    assert all(len(p) <= 4 for p in segs)


@settings(**_SETTINGS)
@given(
    pieces=st.lists(
        st.text(alphabet="ab", min_size=1, max_size=4),
        min_size=1,
        max_size=10,
    ),
    word=st.text(alphabet="ab", min_size=1, max_size=8),
)
def test_unigram_forward_backward_consistent_with_viterbi(pieces, word):
    """The lattice posterior gives every piece on the Viterbi path a
    strictly positive expected count, and Z upper-bounds the Viterbi
    path score (sum of all paths >= best path)."""
    import math

    from exon_spark.operators.unigram import _forward_backward, _viterbi

    vocab = {p: math.log(0.3 / (i + 1)) for i, p in enumerate(sorted(set(pieces)))}
    exp, Z = _forward_backward(word, vocab, max_piece_len=4)
    segs = _viterbi(word, vocab, max_piece_len=4)
    score = sum(
        vocab.get(p, -20.0) for p in segs
    )
    assert Z >= score - 1e-9
    for p in segs:
        assert exp.get(p, 0.0) > 0.0
    assert all(e >= 0.0 for e in exp.values())


@settings(**_SETTINGS)
@given(
    n_words=st.integers(1, 64),
    k=st.integers(1, 16),
    n_items=st.integers(0, 1 << 40),
    data=st.data(),
)
def test_bloom_filter_bytes_roundtrip(n_words, k, n_items, data):
    import numpy as np

    from exon_spark.operators.bloom import BloomFilter

    bits = np.array(
        data.draw(
            st.lists(
                st.integers(0, (1 << 64) - 1),
                min_size=n_words,
                max_size=n_words,
            )
        ),
        dtype=np.uint64,
    )
    bf = BloomFilter(m=n_words * 64, k=k, n_items=n_items, bits=bits)
    bf2 = BloomFilter.from_bytes(bf.to_bytes())
    assert (bf2.m, bf2.k, bf2.n_items) == (bf.m, bf.k, bf.n_items)
    assert np.array_equal(bf2.bits, bf.bits)


@settings(**_SETTINGS)
@given(
    n_sub=st.sampled_from([1, 2, 4, 8]),
    k=st.integers(1, 32),
    d_sub=st.integers(1, 8),
    data=st.data(),
)
def test_pq_codebook_bytes_roundtrip(n_sub, k, d_sub, data):
    import numpy as np

    from exon_spark.operators.pq import PQCodebook

    flat = data.draw(
        st.lists(
            st.floats(-1e6, 1e6, width=32),
            min_size=n_sub * k * d_sub,
            max_size=n_sub * k * d_sub,
        )
    )
    cents = np.array(flat, dtype=np.float32).reshape(n_sub, k, d_sub)
    cb = PQCodebook(n_sub=n_sub, k=k, dim=n_sub * d_sub, centroids=cents)
    cb2 = PQCodebook.from_bytes(cb.to_bytes())
    assert (cb2.n_sub, cb2.k, cb2.dim) == (cb.n_sub, cb.k, cb.dim)
    assert np.array_equal(cb2.centroids, cb.centroids)
