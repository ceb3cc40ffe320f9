"""Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization";
the SentencePiece `--model_type=unigram` algorithm) — the other
real-world tokenizer-training path next to BPE.

Beyond-reference layer (no exon counterpart).

Same two-level scale shape as ``bpe_train`` (the corpus never feeds the
inner algorithm directly):
  * corpus-side cost is ONE lowercase-tokenize + word-frequency groupBy
    (map-side combined); unigram statistics are a pure function of the
    word-count table.
  * seeding, EM, and pruning run driver-side on the bounded
    ``max_words`` table: seed vocab = the ``seed_size`` most frequent
    substrings (len <= ``max_piece_len``) plus every single character;
    each EM round computes expected piece counts with per-word
    forward-backward over the segmentation lattice (frequency-weighted),
    then re-estimates piece log-probs; pruning drops the lowest-
    expected-count multi-char pieces ``prune_frac`` at a time until
    ``vocab_size`` remains (single chars are never pruned, so every
    word stays segmentable).
  * ``unigram_segment`` ships the final (piece -> logprob) dict in one
    Arrow-batched pandas UDF closure — map-only, zero shuffle — and
    runs Viterbi (max-logprob segmentation) per word with the same
    per-worker word cache as ``bpe_segment`` (cost per TYPE, not per
    token; characters outside the vocab segment as single-char UNK
    pieces at ``unk_logprob``).

Determinism: seeding/EM/pruning iterate over count-desc,
lexicographic-asc sorted tables, so the model is a pure function of
the word-frequency table — reproducible across partitionings and runs
(pinned by test).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from exon_spark.operators.dedup import tokens

UNK_LOGPROB = -20.0


def _word_counts(
    df: DataFrame, text_col: str, max_words: int, min_word_count: int
) -> list[tuple[str, int]]:
    wc = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= min_word_count)
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_words)
    )
    return [(r["w"], int(r["c"])) for r in wc.collect()]


def _seed_vocab(
    words: list[tuple[str, int]], seed_size: int, max_piece_len: int
) -> dict[str, float]:
    """Frequency-weighted substring counts -> initial log-probs."""
    counts: dict[str, int] = {}
    for w, c in words:
        L = len(w)
        for i in range(L):
            for j in range(i + 1, min(i + max_piece_len, L) + 1):
                p = w[i:j]
                counts[p] = counts.get(p, 0) + c
    chars = {p for p in counts if len(p) == 1}
    multi = sorted(
        ((p, n) for p, n in counts.items() if len(p) > 1),
        key=lambda x: (-x[1], x[0]),
    )[: max(0, seed_size - len(chars))]
    seed = {p: float(counts[p]) for p in chars}
    seed.update({p: float(n) for p, n in multi})
    total = sum(seed.values())
    return {p: math.log(n / total) for p, n in seed.items()}


def _lattice_edges(
    word: str, vocab: dict[str, float], max_piece_len: int
) -> list[list[tuple[int, str, float]]]:
    """edges[end] = [(start, piece, logprob)] over positions 0..len."""
    L = len(word)
    edges: list[list[tuple[int, str, float]]] = [[] for _ in range(L + 1)]
    for i in range(L):
        for j in range(i + 1, min(i + max_piece_len, L) + 1):
            p = word[i:j]
            lp = vocab.get(p)
            if lp is not None:
                edges[j].append((i, p, lp))
        if not any(e[0] == i for e in edges[i + 1]):
            # guarantee connectivity: unknown single char
            edges[i + 1].append((i, word[i : i + 1], UNK_LOGPROB))
    return edges


def _forward_backward(
    word: str, vocab: dict[str, float], max_piece_len: int
) -> tuple[dict[str, float], float]:
    """Expected piece counts for one word + its total log-likelihood."""
    L = len(word)
    edges = _lattice_edges(word, vocab, max_piece_len)
    alpha = [-math.inf] * (L + 1)
    alpha[0] = 0.0
    for j in range(1, L + 1):
        s = [alpha[i] + lp for i, _, lp in edges[j] if alpha[i] > -math.inf]
        if s:
            m = max(s)
            alpha[j] = m + math.log(sum(math.exp(x - m) for x in s))
    def _logadd(a: float, b: float) -> float:
        if a == -math.inf:
            return b
        if b == -math.inf:
            return a
        m = max(a, b)
        return m + math.log(math.exp(a - m) + math.exp(b - m))

    beta = [-math.inf] * (L + 1)
    beta[L] = 0.0
    for j in range(L, 0, -1):
        if beta[j] == -math.inf:
            continue
        for i, _, lp in edges[j]:
            beta[i] = _logadd(beta[i], beta[j] + lp)
    Z = alpha[L]
    exp: dict[str, float] = {}
    if Z == -math.inf:
        return exp, 0.0
    for j in range(1, L + 1):
        for i, p, lp in edges[j]:
            if alpha[i] > -math.inf and beta[j] > -math.inf:
                exp[p] = exp.get(p, 0.0) + math.exp(alpha[i] + lp + beta[j] - Z)
    return exp, Z


def _viterbi(
    word: str, vocab: dict[str, float], max_piece_len: int
) -> list[str]:
    """Max-logprob segmentation; score ties break deterministically on
    (later split position, lexicographically larger last piece) — the
    same key in the module-level and UDF spellings (pinned by test)."""
    L = len(word)
    edges = _lattice_edges(word, vocab, max_piece_len)
    best = [(-math.inf, -1, "")] * (L + 1)
    best[0] = (0.0, 0, "")
    for j in range(1, L + 1):
        cand = []
        for i, p, lp in edges[j]:
            if best[i][0] > -math.inf:
                cand.append((best[i][0] + lp, i, p))
        if cand:
            best[j] = max(cand, key=lambda t: (t[0], t[1], t[2]))
    out: list[str] = []
    j = L
    while j > 0:
        _, i, p = best[j]
        out.append(p)
        j = i
    out.reverse()
    return out


def unigram_train(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 8000,
    max_words: int = 100_000,
    min_word_count: int = 1,
    seed_size: int = 0,
    max_piece_len: int = 8,
    em_iters: int = 2,
    prune_frac: float = 0.25,
) -> dict[str, float]:
    """Learn a unigram-LM piece vocabulary: {piece: logprob}, feed to
    ``unigram_segment``. ``seed_size`` defaults to 4x ``vocab_size``.
    ``min_word_count`` is the same hapax floor as ``bpe_train`` (drop
    singleton noise types before the bounded cut)."""
    words = _word_counts(df, text_col, max_words, min_word_count)
    if not words:
        raise ValueError("unigram_train: empty corpus after tokenization")
    seed_size = seed_size or 4 * vocab_size
    vocab = _seed_vocab(words, seed_size, max_piece_len)
    n_chars = sum(1 for p in vocab if len(p) == 1)
    target = max(vocab_size, n_chars)
    while True:
        for _ in range(em_iters):
            tot: dict[str, float] = {}
            for w, c in words:
                exp, _ = _forward_backward(w, vocab, max_piece_len)
                for p, e in exp.items():
                    tot[p] = tot.get(p, 0.0) + c * e
            Zt = sum(tot.values()) or 1.0
            vocab = {
                p: math.log(max(tot.get(p, 0.0), 1e-12) / Zt) for p in vocab
            }
        if len(vocab) <= target:
            break
        multi = sorted(
            ((p, lp) for p, lp in vocab.items() if len(p) > 1),
            key=lambda x: (x[1], x[0]),
        )
        n_drop = min(
            len(multi),
            max(1, int(len(vocab) * prune_frac)),
            len(vocab) - target,
        )
        for p, _ in multi[:n_drop]:
            del vocab[p]
    return vocab


def unigram_segment(
    df: DataFrame,
    vocab: dict[str, float],
    id_col: str = "doc_id",
    text_col: str = "text",
    max_piece_len: int = 8,
) -> DataFrame:
    """Viterbi-segment every document with a trained unigram vocab.
    Output: (doc_id, pieces array<string>, n_pieces) — lowercase
    ASCII-whitespace words (the JVM ``tokens()`` mirror, same as
    ``bpe_segment``), each split to max-likelihood pieces. Map-only;
    per-worker word cache. The piece dict rides an ``sc.broadcast``
    (once per executor), not the UDF closure (re-pickled per task) —
    same rationale as ``bpe_segment``."""
    from exon_spark.operators.state import track_broadcast

    _bc = track_broadcast(df.sparkSession.sparkContext.broadcast(dict(vocab)))
    _mpl = max_piece_len
    _unk = UNK_LOGPROB

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def seg(texts):
        import math as _m
        import re

        import pandas as pd

        _vocab = _bc.value

        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        cache: dict[str, list[str]] = {}
        NEG = -_m.inf

        def viterbi(word):
            L = len(word)
            best = [(NEG, -1, "")] * (L + 1)
            best[0] = (0.0, 0, "")
            for j in range(1, L + 1):
                cand = []
                lo = max(0, j - _mpl)
                for i in range(lo, j):
                    if best[i][0] == NEG:
                        continue
                    p = word[i:j]
                    lp = _vocab.get(p)
                    if lp is None and j - i == 1:
                        lp = _unk
                    if lp is not None:
                        cand.append((best[i][0] + lp, i, p))
                if cand:
                    best[j] = max(cand, key=lambda t: (t[0], t[1], t[2]))
            out = []
            j = L
            while j > 0:
                _, i, p = best[j]
                out.append(p)
                j = i
            out.reverse()
            return out

        def one(t):
            if t is None:
                return []
            out = []
            for w in ws.split(t.lower().strip(" ")):
                if not w:
                    continue
                hit = cache.get(w)
                if hit is None:
                    hit = viterbi(w)
                    if len(cache) < 500_000:
                        cache[w] = hit
                out.extend(hit)
            return out

        return pd.Series([one(t) for t in texts])

    return df.select(
        F.col(id_col).alias("doc_id"), seg(F.col(text_col)).alias("pieces")
    ).withColumn("n_pieces", F.size("pieces"))


def unigram_vocab(vocab: dict[str, float]) -> list[str]:
    """The id-ordered piece list a trained unigram vocab induces —
    single characters first (sorted), then multi-char pieces by
    descending probability with lexicographic ties (the SentencePiece
    export convention: stable ids for the base alphabet, frequent
    pieces get small ids). Deterministic function of the vocab dict."""
    chars = sorted(p for p in vocab if len(p) == 1)
    multi = sorted(
        (p for p in vocab if len(p) > 1), key=lambda p: (-vocab[p], p)
    )
    return chars + multi
