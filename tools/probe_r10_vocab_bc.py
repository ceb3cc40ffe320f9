"""r10 probe: segmenter vocab shipping — sc.broadcast (shipped,
bpe.py/unigram.py) vs the r9 closure-capture spelling (reconstructed
inline as the "before" regime).

A closure-captured dict is re-pickled into EVERY task's serialized UDF
command; a broadcast ships once per executor (torrent) and tasks carry
only the broadcast id. The gap scales with vocab bytes x task count —
this probe uses a 100k-piece vocab (~2.6 MB pickled) over 256 tiny
tasks, the shape of a production segmenter pass (256k-piece vocab,
thousands of tasks).

Usage: python tools/probe_r10_vocab_bc.py
"""

from __future__ import annotations

import pickle
import sys
import time

import pyspark.sql.functions as F

sys.path.insert(0, "/root/repo")

from exon_spark.operators.unigram import UNK_LOGPROB, unigram_segment  # noqa: E402
from exon_spark.session import get_spark  # noqa: E402


def closure_segment(df, vocab, max_piece_len=8):
    """The r9 spelling: vocab captured directly in the UDF closure."""
    _vocab = dict(vocab)
    _mpl = max_piece_len
    _unk = UNK_LOGPROB
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def seg(texts):
        import math as _m
        import re

        import pandas as pd

        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        NEG = -_m.inf

        def viterbi(word):
            L = len(word)
            best = [(NEG, -1, "")] * (L + 1)
            best[0] = (0.0, 0, "")
            for j in range(1, L + 1):
                cand = []
                for i in range(max(0, j - _mpl), j):
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
            out, j = [], L
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
                if w:
                    out.extend(viterbi(w))
            return out

        return pd.Series([one(t) for t in texts])

    return df.select(
        F.col("doc_id"), seg(F.col("text")).alias("pieces")
    ).withColumn("n_pieces", F.size("pieces"))


def main() -> None:
    spark = get_spark()
    # 100k-piece synthetic vocab: all printable pairs + numbered pieces
    import itertools
    import string

    chars = string.ascii_lowercase + string.digits
    vocab = {c: -4.0 for c in chars}
    for i, (a, b) in enumerate(itertools.product(chars, chars)):
        vocab[a + b] = -8.0 - (i % 7) * 0.25
    i = 0
    while len(vocab) < 100_000:
        vocab[f"w{i:06d}"] = -12.0
        i += 1
    print(f"vocab pieces={len(vocab):,} pickled={len(pickle.dumps(vocab))/1e6:.1f} MB")

    # 256 tiny tasks: per-task fixed costs dominate, which is exactly
    # the overhead under test
    df = (
        spark.range(2048)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("alpha beta0 gamma12 delta"), (F.col("id") % 97).cast("string")).alias("text"),
        )
        .repartition(256)
        .cache()
    )
    df.count()

    def run(fn, label):
        # warm once (codegen/UDF worker spin-up), then 3 timed reps
        fn(df, vocab).agg(F.sum("n_pieces")).collect()
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(df, vocab).agg(F.sum("n_pieces")).collect()
            ts.append(time.perf_counter() - t0)
        print(f"{label}: min {min(ts):.2f}s reps {[f'{t:.2f}' for t in ts]}")
        return min(ts)

    b = run(unigram_segment, "broadcast (shipped)")
    c = run(closure_segment, "closure (r9)      ")
    print(f"per-pass saving at 256 tasks: {c - b:.2f}s ({c / b:.2f}x)")


if __name__ == "__main__":
    main()
