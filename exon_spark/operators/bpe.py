"""Byte-pair-encoding subword induction and segmentation at corpus scale
(Sennrich et al. 2016) — the tokenizer-training step of an LLM data
pipeline, plus the segmenter that applies the learned merges.

Beyond-reference layer (no exon counterpart).

100 TB design (the classic two-level trick the original paper exploits):
  * The CORPUS-side work is one tokenize + ``groupBy(word).count()``
    shuffle — BPE statistics only depend on the word-frequency table,
    never on raw text again.
  * Merge induction then runs on the ``max_words`` most frequent types
    (a bounded driver collect, default 100k — the same bounded-sample
    contract as ivf_fit_centroids' centroid collect; tail types are
    frequency-weighted noise for pair statistics). The merge loop is
    O(num_merges · Σ|word|) over that bounded table.
  * Segmentation ships the merge ranks in a pandas-UDF closure
    (broadcast, zero shuffle) and applies the standard greedy
    lowest-rank merge per token — Arrow-batched, corpus stays map-only.

Determinism: pair ties break on (count desc, pair lexicographic), so
the learned merge list is a pure function of the word-frequency table —
reproducible across partitionings and engines (pinned by test).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from exon_spark.operators.dedup import tokens

EOW = "</w>"  # end-of-word sentinel, GPT-2/Sennrich convention


def _merge_loop(
    word_counts: list[tuple[str, int]], num_merges: int, min_pair_count: int
) -> list[tuple[str, str]]:
    """Classic BPE induction over a word->count table (driver-side,
    bounded input). Returns merges in learned order."""
    words = [
        (tuple(w) + (EOW,), int(c)) for w, c in word_counts if w
    ]
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pair_counts: dict[tuple[str, str], int] = {}
        for syms, c in words:
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pair_counts[p] = pair_counts.get(p, 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < min_pair_count:
            break
        (a, b), _n = best
        merged = a + b
        nxt = []
        for syms, c in words:
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt.append((tuple(out), c))
        words = nxt
        merges.append((a, b))
    return merges


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    num_merges: int = 200,
    max_words: int = 100_000,
    min_pair_count: int = 2,
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus.

    Distributed stage: lowercase whitespace tokenize + word-frequency
    groupBy (map-side combined, 8-byte-ish keys). Bounded stage: the top
    ``max_words`` (by count, then word — deterministic) collect to the
    driver for the merge loop. Merges stop early when no pair reaches
    ``min_pair_count``.

    Returns the merge list in learned order (feed to ``bpe_segment``).
    """
    wc = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("w"))
        .limit(max_words)
    )
    rows = [(r["w"], r["c"]) for r in wc.collect()]
    if not rows:
        raise ValueError("bpe_train: empty corpus after tokenization")
    return _merge_loop(rows, num_merges, min_pair_count)


def _segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank merging of one word (standard BPE apply)."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Segment every document with a learned merge list.

    Output: ``(doc_id, bpe_tokens array<string>, n_bpe_tokens)`` —
    lowercase whitespace words, each split to subwords ending in
    ``</w>``. Null/empty text yields an empty array.

    Plan: one Arrow-batched pandas UDF with the merge-rank dict in its
    closure (broadcast to workers; zero shuffle) and a per-token LRU —
    web corpora repeat words heavily, so most lookups skip the merge
    loop entirely.
    """
    # plain locals so cloudpickle ships the dict/str by value in the UDF
    # closure (executor workers do not share the driver's sys.path; the
    # segment loop is re-stated inside the UDF for the same reason —
    # pinned equal to the module-level _segment_word by test)
    _ranks = {pair: i for i, pair in enumerate(merges)}
    _eow = EOW

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def seg(texts):
        import pandas as pd

        cache: dict[str, list[str]] = {}

        def segment_word(word):
            syms = list(word) + [_eow]
            while len(syms) > 1:
                best_i, best_r = -1, None
                for i in range(len(syms) - 1):
                    r = _ranks.get((syms[i], syms[i + 1]))
                    if r is not None and (best_r is None or r < best_r):
                        best_i, best_r = i, r
                if best_r is None:
                    break
                syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
            return syms

        def one(t):
            if t is None:
                return []
            out = []
            for w in t.strip().lower().split():
                hit = cache.get(w)
                if hit is None:
                    hit = segment_word(w)
                    if len(cache) < 500_000:
                        cache[w] = hit
                out.extend(hit)
            return out

        return pd.Series([one(t) for t in texts])

    return df.select(
        F.col(id_col).alias("doc_id"),
        seg(F.col(text_col)).alias("bpe_tokens"),
    ).withColumn("n_bpe_tokens", F.size("bpe_tokens"))
