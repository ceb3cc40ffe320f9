"""Unit tests for BPE induction + segmentation: the Sennrich toy corpus
hand-check, driver-reference parity for the UDF segmenter, partitioning
invariance of the learned merges, and degenerate corpora."""

from __future__ import annotations

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _sennrich_corpus(spark):
    # the classic example: low x5, lower x2, newest x6, widest x3
    words = ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    return _docs(spark, [(1, " ".join(words))])


def test_bpe_train_sennrich_hand_computed(spark):
    from exon_spark.operators import bpe_train

    merges = bpe_train(_sennrich_corpus(spark), num_merges=5)
    # e+s (9) -> es+t (9) -> est+</w> (9) -> l+o (7, lexicographic over
    # the o+w tie) -> lo+w (7)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", "</w>"),
        ("l", "o"),
        ("lo", "w"),
    ]


def test_bpe_segment_matches_driver_reference(spark):
    from exon_spark.operators import bpe_segment, bpe_train
    from exon_spark.operators.bpe import _segment_word

    corpus = _sennrich_corpus(spark)
    merges = bpe_train(corpus, num_merges=10)
    ranks = {p: i for i, p in enumerate(merges)}
    rows = [
        (1, "low lower newest"),
        (2, "wide widest lowest"),  # 'lowest' recombines learned pieces
        (3, "zzz unseen"),  # chars never merged stay char-split
        (4, None),
        (5, "   "),
        # NBSP joins ONE word under the shared ASCII-\s tokenizer (r8
        # advice: Python str.split() used to split it, segmenting words
        # never seen at train time)
        (6, "low lower newest\tlow"),
    ]
    out = {
        r["doc_id"]: r
        for r in bpe_segment(_docs(spark, rows), merges).collect()
    }
    import re

    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    for doc_id, text in rows:
        exp = []
        for w in ws.split((text or "").lower().strip(" ")):
            if w:
                exp.extend(_segment_word(w, ranks))
        assert out[doc_id]["bpe_tokens"] == exp, doc_id
        assert out[doc_id]["n_bpe_tokens"] == len(exp)
    assert out[1]["bpe_tokens"][0] == "low</w>"  # 'low' fully merged
    assert out[4]["bpe_tokens"] == []


def test_bpe_train_partitioning_invariant(spark):
    from exon_spark.operators import bpe_train

    words = ("banana bandana anagram nanna banner " * 20).split()
    rows = [(i, " ".join(words[i::7])) for i in range(7)]
    a = bpe_train(_docs(spark, rows), num_merges=12)
    b = bpe_train(_docs(spark, rows).repartition(5), num_merges=12)
    assert a == b and len(a) == 12


def test_bpe_train_degenerate_corpora(spark):
    from exon_spark.operators import bpe_train

    # no pair reaches min_pair_count=2: single doc of disjoint bigrams
    assert bpe_train(_docs(spark, [(1, "ab cd ef")]), num_merges=5) == []
    with pytest.raises(ValueError, match="empty corpus"):
        bpe_train(_docs(spark, [(1, "   "), (2, None)]))


def test_bpe_train_max_words_truncates_tail(spark):
    from exon_spark.operators import bpe_train

    # with max_words=1 only 'aa' (count 3) survives -> merges learned
    # from 'aa' alone: (a,a) and (a,</w>) tie at 3, lexicographic picks
    # (a,'</w>') first ('<' < 'a'), then (a, a</w>) merges the rest
    df = _docs(spark, [(1, "aa aa aa bz bz")])
    merges = bpe_train(df, num_merges=3, max_words=1, min_pair_count=2)
    assert merges == [("a", "</w>"), ("a", "a</w>")]


def test_bpe_train_min_word_count_drops_hapax(spark):
    from exon_spark.operators import bpe_train

    # 'aa' x3 and one hapax 'ab': with the floor at 2 the hapax never
    # reaches the merge table, so no (a,b) merge can be learned even
    # though (a,b)+(a,a) pair stats would otherwise see it
    df = _docs(spark, [(1, "aa aa aa ab")])
    floored = bpe_train(df, num_merges=5, min_word_count=2)
    assert floored == [("a", "</w>"), ("a", "a</w>")]
    # default keeps r8 behavior: hapax participates in pair counts
    dflt = bpe_train(df, num_merges=5)
    assert ("a", "a</w>") in dflt and len(dflt) >= len(floored)


def test_bpe_merge_loop_matches_naive_rescan():
    """The incremental (indexed + lazy-heap) merge loop must produce the
    EXACT merge sequence of the naive full-rescan formulation on random
    word tables — counts and tie-breaks preserved."""
    import random

    from exon_spark.operators.bpe import EOW, _merge_loop

    def naive(word_counts, num_merges, min_pair_count):
        words = [(tuple(w) + (EOW,), int(c)) for w, c in word_counts if w]
        merges = []
        for _ in range(num_merges):
            pc = {}
            for syms, c in words:
                for i in range(len(syms) - 1):
                    p = (syms[i], syms[i + 1])
                    pc[p] = pc.get(p, 0) + c
            if not pc:
                break
            best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            if best[1] < min_pair_count:
                break
            (a, b), _n = best
            nxt = []
            for syms, c in words:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                nxt.append((tuple(out), c))
            words = nxt
            merges.append((a, b))
        return merges

    rng = random.Random(11)
    alphabet = "abcdef"
    for trial in range(8):
        table = [
            (
                "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8))),
                rng.randint(1, 9),
            )
            for _ in range(rng.randint(5, 40))
        ]
        got = _merge_loop(list(table), 25, 2)
        exp = naive(list(table), 25, 2)
        assert got == exp, (trial, table)


def test_bpe_vocab_covers_segmentations(spark):
    from exon_spark.operators.bpe import EOW, _segment_word, bpe_vocab
    from exon_spark.operators import bpe_train

    merges = bpe_train(_sennrich_corpus(spark), num_merges=10)
    vocab = bpe_vocab(merges)
    assert len(vocab) == len(set(vocab))  # no duplicate ids
    # every merge product present exactly once, after the sorted base
    for a, b in merges:
        assert a + b in vocab
    ranks = {p: i for i, p in enumerate(merges)}
    vset = set(vocab)
    for w in ("low", "lower", "newest", "widest", "lowest"):
        for piece in _segment_word(w, ranks):
            # pieces are vocab symbols or unseen base chars
            assert piece in vset or len(piece.replace(EOW, "x")) == 1
