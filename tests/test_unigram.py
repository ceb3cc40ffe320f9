"""Unigram-LM tokenizer: EM math hand-checks, Viterbi properties,
reconstruction, determinism across partitionings, UDF/driver parity,
and vocab-size control."""

import math

import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_forward_backward_hand_computed():
    """Word 'ab' with vocab {a, b, ab}: two segmentations, [ab] and
    [a,b]. With logprobs la, lb, lab: P([ab]) = e^lab, P([a][b]) =
    e^(la+lb); expected counts follow the posterior exactly."""
    from exon_spark.operators.unigram import _forward_backward

    vocab = {"a": math.log(0.4), "b": math.log(0.4), "ab": math.log(0.2)}
    exp, Z = _forward_backward("ab", vocab, max_piece_len=8)
    p_joint = 0.2
    p_split = 0.4 * 0.4
    tot = p_joint + p_split
    assert Z == pytest.approx(math.log(tot))
    assert exp["ab"] == pytest.approx(p_joint / tot)
    assert exp["a"] == pytest.approx(p_split / tot)
    assert exp["b"] == pytest.approx(p_split / tot)


def test_viterbi_prefers_likelier_segmentation():
    from exon_spark.operators.unigram import _viterbi

    # 'ab' as one piece beats two pieces when lab > la + lb
    vocab = {"a": math.log(0.1), "b": math.log(0.1), "ab": math.log(0.5)}
    assert _viterbi("ab", vocab, 8) == ["ab"]
    vocab2 = {"a": math.log(0.5), "b": math.log(0.5), "ab": math.log(0.01)}
    assert _viterbi("ab", vocab2, 8) == ["a", "b"]


def test_viterbi_unknown_chars_fall_back_to_unk():
    from exon_spark.operators.unigram import _viterbi

    vocab = {"a": math.log(0.9)}
    assert _viterbi("axa", vocab, 8) == ["a", "x", "a"]


def test_unigram_train_learns_frequent_pieces(spark):
    from exon_spark.operators import unigram_train

    df = _docs(spark, [(1, "lowlow lowlow lower newer " * 20)])
    vocab = unigram_train(df, vocab_size=12, em_iters=2)
    assert "low" in vocab or "lowlow" in vocab
    # normalized: all logprobs negative, chars retained
    assert all(lp < 0 for lp in vocab.values())
    assert {"l", "o", "w"} <= {p for p in vocab if len(p) == 1}


def test_unigram_train_deterministic_across_partitionings(spark):
    from exon_spark.operators import unigram_train

    rows = [(i, f"the quick brown fox jumps over lazy dog {i % 7}") for i in range(200)]
    a = unigram_train(_docs(spark, rows), vocab_size=50)
    b = unigram_train(_docs(spark, rows).repartition(17), vocab_size=50)
    assert a == b


def test_unigram_segment_reconstruction_and_parity(spark):
    from exon_spark.operators import unigram_segment, unigram_train
    from exon_spark.operators.unigram import _viterbi

    rows = [(i, f"resegmentation of training corpora item{i % 13}") for i in range(100)]
    df = _docs(spark, rows)
    vocab = unigram_train(df, vocab_size=60)
    out = unigram_segment(df, vocab).collect()
    assert len(out) == 100
    texts = {r[0]: r[1] for r in rows}
    for r in out:
        words = texts[r["doc_id"]].lower().split()
        # concatenating pieces reconstructs the word stream exactly
        assert "".join(r["pieces"]) == "".join(words)
        assert r["n_pieces"] == len(r["pieces"])
        # UDF viterbi == module-level viterbi, word by word
        drv = []
        for w in words:
            drv.extend(_viterbi(w, vocab, 8))
        assert r["pieces"] == drv


def test_unigram_segment_null_and_empty(spark):
    from exon_spark.operators import unigram_segment, unigram_train

    df = _docs(spark, [(1, "aa bb aa"), (2, None), (3, "   ")])
    vocab = unigram_train(df, vocab_size=10)
    rows = {r["doc_id"]: r for r in unigram_segment(df, vocab).collect()}
    assert rows[2]["pieces"] == [] and rows[2]["n_pieces"] == 0
    assert rows[3]["pieces"] == []


def test_unigram_vocab_export_order(spark):
    from exon_spark.operators import unigram_segment, unigram_train, unigram_vocab

    df = _docs(spark, [(1, "lowlow lowlow lower newer " * 10)])
    v = unigram_train(df, vocab_size=20)
    out = unigram_vocab(v)
    assert len(out) == len(v) and set(out) == set(v)
    n_chars = sum(1 for p in v if len(p) == 1)
    assert all(len(p) == 1 for p in out[:n_chars])  # base alphabet first
    assert out[:n_chars] == sorted(out[:n_chars])
    # multi-char section ordered by descending probability
    probs = [v[p] for p in out[n_chars:]]
    assert probs == sorted(probs, reverse=True)
    # every segmentation piece has an id (or is a base char / UNK char)
    seg = unigram_segment(df, v).collect()[0]["pieces"]
    ids = {p: i for i, p in enumerate(out)}
    assert all(p in ids or len(p) == 1 for p in seg)


def test_unigram_train_vocab_size_bound(spark):
    from exon_spark.operators import unigram_train

    df = _docs(
        spark,
        [(i, "abcdefgh ijklmnop qrstuvwx " * 3) for i in range(10)],
    )
    vocab = unigram_train(df, vocab_size=30, seed_size=500)
    n_chars = sum(1 for p in vocab if len(p) == 1)
    assert len(vocab) <= max(30, n_chars) + 8  # prune_frac granularity
    with pytest.raises(ValueError, match="empty corpus"):
        unigram_train(_docs(spark, [(1, None), (2, " ")]))
