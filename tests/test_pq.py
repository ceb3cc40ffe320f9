"""Product quantization: fit determinism, encode/decode reconstruction
quality, ADC top-k recall against exact cosine_topk, serialization, and
the map-only encode plan pin."""

import numpy as np
import pyspark.sql.functions as F
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_pq_fit_deterministic_across_partitionings(spark, emb):
    from exon_spark.operators import pq_fit

    a = pq_fit(emb, n_sub=8, k=16, iters=4)
    b = pq_fit(emb.repartition(13), n_sub=8, k=16, iters=4)
    assert a.n_sub == b.n_sub == 8 and a.k == b.k == 16
    assert np.array_equal(a.centroids, b.centroids)


def test_pq_codebook_round_trip(spark, emb):
    from exon_spark.operators import PQCodebook, pq_fit

    cb = pq_fit(emb, n_sub=4, k=8, iters=3)
    cb2 = PQCodebook.from_bytes(cb.to_bytes())
    assert (cb2.n_sub, cb2.k, cb2.dim) == (cb.n_sub, cb.k, cb.dim)
    assert np.array_equal(cb2.centroids, cb.centroids)
    with pytest.raises(ValueError, match="magic"):
        PQCodebook.from_bytes(b"nope" * 8)


def test_pq_codebook_save_load(spark, emb, tmp_path, monkeypatch):
    """Persist-state convention (r9-verdict order): save/load round-trip
    through the Hadoop FS route (session up) and the local-IO fallback
    (no session)."""
    from pyspark.sql import SparkSession

    from exon_spark.operators import PQCodebook, pq_fit

    cb = pq_fit(emb, n_sub=4, k=8, iters=3)
    p = str(tmp_path / "codebook.pqc")
    cb.save(p)  # active session -> Hadoop FileSystem (default fs = file:)
    cb2 = PQCodebook.load(p)
    assert np.array_equal(cb2.centroids, cb.centroids)
    assert (cb2.n_sub, cb2.k, cb2.dim) == (cb.n_sub, cb.k, cb.dim)

    monkeypatch.setattr(SparkSession, "getActiveSession", classmethod(lambda c: None))
    p2 = str(tmp_path / "codebook_local.pqc")
    cb.save(p2)  # no session -> plain local IO
    cb3 = PQCodebook.load(p2)
    assert np.array_equal(cb3.centroids, cb.centroids)
    # the two routes write identical bytes
    assert open(p, "rb").read() == open(p2, "rb").read()


def test_pq_fit_validations(spark, emb):
    from exon_spark.operators import pq_fit

    with pytest.raises(ValueError, match="divisible"):
        pq_fit(emb, n_sub=7)
    with pytest.raises(ValueError, match="one-byte"):
        pq_fit(emb, n_sub=8, k=512)


def test_pq_encode_decode_reconstruction(spark, emb):
    from exon_spark.operators import cosine, pq_decode, pq_encode, pq_fit

    cb = pq_fit(emb, n_sub=16, k=64, iters=8)
    codes = pq_encode(emb, cb)
    row = codes.limit(1).collect()[0]
    assert len(row["pq_code"]) == 16
    assert all(0 <= c < 64 for c in row["pq_code"])
    # reconstruction ~ original: mean cosine across the corpus is high
    # on clustered synthetic data
    rec = pq_decode(codes, cb).withColumnRenamed("embedding", "rec")
    joined = emb.select("vec_id", "embedding").join(rec, "vec_id")
    mean_cos = joined.select(
        F.avg(cosine(F.col("embedding"), F.col("rec"))).alias("m")
    ).collect()[0]["m"]
    assert mean_cos > 0.9


def test_pq_encode_rejects_bad_vectors(spark):
    from exon_spark.operators import pq_encode, pq_fit

    ok = spark.createDataFrame(
        [(i, [float(i), 1.0, 0.0, 2.0]) for i in range(20)],
        "vec_id bigint, embedding array<double>",
    )
    cb = pq_fit(ok, n_sub=2, k=4, iters=2)
    bad = spark.createDataFrame(
        [(1, [1.0, 2.0])], "vec_id bigint, embedding array<double>"
    )
    with pytest.raises(Exception, match="pq_encode"):
        pq_encode(bad, cb).collect()


def test_pq_topk_recall_vs_exact(spark, emb):
    from exon_spark.operators import cosine_topk, pq_encode, pq_fit, pq_topk

    queries = emb.orderBy("vec_id").limit(8)
    cb = pq_fit(emb, n_sub=32, k=64, iters=8)
    codes = pq_encode(emb, cb)
    approx = pq_topk(codes, cb, queries, k=10)
    exact = cosine_topk(emb, queries, k=10)
    a = {(r["q_id"], r["vec_id"]) for r in approx.collect()}
    e = {(r["q_id"], r["vec_id"]) for r in exact.collect()}
    recall = len(a & e) / len(e)
    # everything is deterministic (fit init, encode, ADC, tie-breaks),
    # so this is a fixed number on this data — measured 0.80
    assert recall >= 0.75, f"ADC-only recall@10 {recall}"
    # output shape matches the cosine_topk contract
    assert approx.columns == ["q_id", "vec_id", "score", "rnk"]
    assert approx.where("rnk > 10 OR rnk < 1").count() == 0
    assert approx.where("q_id = vec_id").count() == 0


def test_pq_topk_rerank_recovers_exactness(spark, emb):
    from exon_spark.operators import cosine_topk, pq_encode, pq_fit, pq_topk

    queries = emb.orderBy("vec_id").limit(8)
    cb = pq_fit(emb, n_sub=16, k=64, iters=8)
    codes = pq_encode(emb, cb)
    rr = pq_topk(codes, cb, queries, k=10, rerank_corpus=emb, rerank_mult=6)
    exact = cosine_topk(emb, queries, k=10)
    a = {(r["q_id"], r["vec_id"]) for r in rr.collect()}
    e = {(r["q_id"], r["vec_id"]) for r in exact.collect()}
    recall = len(a & e) / len(e)
    assert recall >= 0.9, f"reranked recall@10 {recall}"
    # reranked scores are exact cosines: spot-check one pair
    pair = rr.orderBy("q_id", "rnk").limit(1).collect()[0]
    truth = {
        (r["q_id"], r["vec_id"]): r["score"] for r in exact.collect()
    }
    if (pair["q_id"], pair["vec_id"]) in truth:
        assert abs(pair["score"] - truth[(pair["q_id"], pair["vec_id"])]) < 1e-9


def test_bounded_hash_sample_matches_direct_spelling(spark, emb):
    from exon_spark.operators.similarity import bounded_hash_sample

    # force the threshold-prefilter branch (4 * sample_n < 500 rows)
    got = bounded_hash_sample(emb, "vec_id", "embedding", 100)
    direct = (
        emb.select(F.col("vec_id").alias("i"), F.col("embedding").alias("v"))
        .orderBy(F.xxhash64(F.col("i")), F.col("i"))
        .limit(100)
        .collect()
    )
    assert [r.i for r in got] == [r.i for r in direct]
    # and the pass-through branch (sample covers the corpus)
    allr = bounded_hash_sample(emb, "vec_id", "embedding", 10_000)
    assert len(allr) == emb.count()


def test_pq_encode_plan_is_map_only(spark, emb):
    from exon_spark.operators import pq_encode, pq_fit

    cb = pq_fit(emb, n_sub=4, k=8, iters=2)
    plan = (
        pq_encode(emb, cb)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan


def test_ivfpq_fit_shapes_and_determinism(spark, emb):
    from exon_spark.operators import ivfpq_fit

    cents, cb = ivfpq_fit(emb, n_cells=8, n_sub=16, k=32, cell_iters=5, pq_iters=5)
    cents2, cb2 = ivfpq_fit(
        emb.repartition(11), n_cells=8, n_sub=16, k=32, cell_iters=5, pq_iters=5
    )
    assert [c for c, _ in cents] == list(range(8))
    assert cents == cents2
    assert np.array_equal(cb.centroids, cb2.centroids)


def test_ivfpq_encode_shape_and_plan(spark, emb):
    from exon_spark.operators import ivfpq_encode, ivfpq_fit

    cents, cb = ivfpq_fit(emb, n_cells=8, n_sub=16, k=32)
    enc = ivfpq_encode(emb, cents, cb)
    assert enc.columns == ["vec_id", "cell", "pq_code"]
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    rows = enc.collect()
    assert len(rows) == emb.count()
    assert all(0 <= r["cell"] < 8 and len(r["pq_code"]) == 16 for r in rows)


def test_ivfpq_topk_recall_and_probe_tradeoff(spark, emb):
    from exon_spark.operators import (
        cosine_topk,
        ivfpq_encode,
        ivfpq_fit,
        ivfpq_topk,
    )

    queries = emb.orderBy("vec_id").limit(8)
    cents, cb = ivfpq_fit(emb, n_cells=8, n_sub=32, k=64, pq_iters=8)
    enc = ivfpq_encode(emb, cents, cb)
    exact = {(r["q_id"], r["vec_id"]) for r in cosine_topk(emb, queries, k=10).collect()}

    def recall(nprobe):
        got = ivfpq_topk(enc, cents, cb, queries, k=10, nprobe=nprobe)
        a = {(r["q_id"], r["vec_id"]) for r in got.collect()}
        return len(a & exact) / len(exact)

    r_all = recall(8)  # all cells probed: pure residual-PQ quality
    r_few = recall(2)
    # deterministic on this data: measured r_all=0.80 (matching
    # pq_topk at identical n_sub/k), r_few=0.4625
    assert r_all >= 0.8, f"all-cells recall {r_all}"
    assert r_few <= r_all + 1e-9  # pruning can only lose neighbors
    assert r_few >= 0.4, f"nprobe=2 recall {r_few}"


def test_ivfpq_topk_rerank_and_shape(spark, emb):
    from exon_spark.operators import (
        cosine_topk,
        ivfpq_encode,
        ivfpq_fit,
        ivfpq_topk,
    )

    queries = emb.orderBy("vec_id").limit(8)
    cents, cb = ivfpq_fit(emb, n_cells=8, n_sub=16, k=64, pq_iters=8)
    enc = ivfpq_encode(emb, cents, cb)
    rr = ivfpq_topk(
        enc, cents, cb, queries, k=10, nprobe=8,
        rerank_corpus=emb, rerank_mult=6,
    )
    assert rr.columns == ["q_id", "vec_id", "score", "rnk"]
    assert rr.where("q_id = vec_id").count() == 0
    exact = {(r["q_id"], r["vec_id"]) for r in cosine_topk(emb, queries, k=10).collect()}
    a = {(r["q_id"], r["vec_id"]) for r in rr.collect()}
    assert len(a & exact) / len(exact) >= 0.9
