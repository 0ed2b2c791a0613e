"""Semantic tests for similarity search: brute-force exactness properties
and LSH recall against the brute-force baseline."""

from __future__ import annotations

from pyspark.sql import functions as F

from featurestore_for_joycastle_java_spark.operators.similarity import (
    brute_force_topk,
    ivf_topk,
    lsh_topk,
)


def _corpus(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _queries(e, n=10):
    return e.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def test_self_is_top1(spark, sf_dir):
    e = _corpus(spark, sf_dir)
    top = brute_force_topk(e, _queries(e), k=1).collect()
    for r in top:
        assert r.vec_id == r.query_id, "a vector's nearest neighbor is itself"
        assert r.cos_sim == 1.0


def test_topk_sorted_and_complete(spark, sf_dir):
    e = _corpus(spark, sf_dir)
    rows = brute_force_topk(e, _queries(e), k=5).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(10))
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rnk)
        sims = [r.cos_sim for r in rs]
        assert sims == sorted(sims, reverse=True)
        assert len(rs) == 5


def test_lsh_recall_at_5(spark, sf_dir):
    """LSH top-5 (euclidean) must recover most of the brute-force top-5
    (cosine ≡ euclidean ranking on unit-norm embeddings)."""
    e = _corpus(spark, sf_dir)
    q = _queries(e)
    exact = brute_force_topk(e, q, k=5).collect()
    approx = lsh_topk(e, q, k=5).collect()
    truth = {}
    for r in exact:
        truth.setdefault(r.query_id, set()).add(r.vec_id)
    got = {}
    for r in approx:
        got.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [
        len(truth[qid] & got.get(qid, set())) / len(truth[qid]) for qid in truth
    ]
    avg_recall = sum(recalls) / len(recalls)
    assert avg_recall >= 0.6, f"avg recall@5 {avg_recall}"


def test_ivf_recall_at_5(spark, sf_dir):
    """IVF (probe 4 of 16 cells) must recover most of the brute-force
    top-5, and be deterministic across runs."""
    e = _corpus(spark, sf_dir)
    q = _queries(e)
    exact = brute_force_topk(e, q, k=5).collect()
    approx = ivf_topk(e, q, k=5, n_centroids=16, n_probe=4).collect()
    truth = {}
    for r in exact:
        truth.setdefault(r.query_id, set()).add(r.vec_id)
    got = {}
    for r in approx:
        got.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [
        len(truth[qid] & got.get(qid, set())) / len(truth[qid]) for qid in truth
    ]
    avg_recall = sum(recalls) / len(recalls)
    assert avg_recall >= 0.6, f"avg recall@5 {avg_recall}"
    again = sorted(map(tuple, ivf_topk(e, q, k=5).collect()))
    assert again == sorted(map(tuple, approx))


def test_ivf_kmeans_recall_and_determinism(spark, sf_dir):
    """IVF with real (seeded spherical k-means||) centroids: bounded
    recall vs brute force and bit-stable across reruns. On the fixture
    embeddings (weak cluster structure — top-5 neighbors mostly cross
    label boundaries) k-means cells measure BELOW the lowid anchors
    (0.62 vs 0.98 at sf0.001), so the bound here is the contract, not a
    claim of superiority; corpora with real cluster structure are where
    k-means cells win."""
    e = _corpus(spark, sf_dir)
    q = _queries(e)
    exact = brute_force_topk(e, q, k=5).collect()
    approx = ivf_topk(
        e, q, k=5, n_centroids=16, n_probe=4, centroids="kmeans"
    ).collect()
    truth = {}
    for r in exact:
        truth.setdefault(r.query_id, set()).add(r.vec_id)
    got = {}
    for r in approx:
        got.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [
        len(truth[qid] & got.get(qid, set())) / len(truth[qid]) for qid in truth
    ]
    avg_recall = sum(recalls) / len(recalls)
    assert avg_recall >= 0.5, f"avg kmeans recall@5 {avg_recall}"
    again = sorted(
        map(tuple, ivf_topk(e, q, k=5, centroids="kmeans").collect())
    )
    assert again == sorted(map(tuple, approx))


def test_srp_topk_recall_vs_brute_force(spark, sf_dir):
    # deterministic (seedless) SRP buckets: recall against brute force on
    # the fixture batch; exact values are driver-checked by the
    # sim_srp_topk DuckDB full-index-replay oracle
    from featurestore_for_joycastle_java_spark.operators.similarity import (
        brute_force_topk,
        srp_topk,
    )
    from pyspark.sql import functions as F

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    srp = srp_topk(e, q, k=5, n_tables=16, n_bits=6).select("query_id", "vec_id")
    brute = brute_force_topk(e, q, k=5).select("query_id", "vec_id")
    hits = srp.join(brute, ["query_id", "vec_id"]).count()
    assert hits / brute.count() >= 0.6


def test_srp_codes_rejects_dim_mismatch(spark):
    # zip_with pads mismatched arrays with nulls -> every code would be 0
    # and the candidate join quadratic; the operator must fail fast instead
    import pytest
    from py4j.protocol import Py4JJavaError

    from featurestore_for_joycastle_java_spark.operators.similarity import (
        srp_codes,
    )

    df = spark.createDataFrame(
        [(1, [0.1, 0.2, 0.3])], "vec_id int, embedding array<double>"
    )
    with pytest.raises(Exception) as exc_info:
        srp_codes(df, "vec_id", "embedding", n_tables=2, n_bits=4, dim=8).collect()
    assert "expected 8-dim vectors" in str(exc_info.value)


def test_pq_encode_compresses_and_is_deterministic(spark, sf_dir):
    """PQ codes: m ints per vector, every code < n_codes, and two
    independent builds produce identical codes (seeded fits)."""
    from featurestore_for_joycastle_java_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    books = pq_codebooks(e, m=8, k=16)
    codes = pq_encode(e, books, m=8).collect()
    assert all(len(r["codes"]) == 8 for r in codes)
    assert all(0 <= c < 16 for r in codes for c in r["codes"])
    books2 = pq_codebooks(e, m=8, k=16)
    codes2 = pq_encode(e, books2, m=8).collect()
    assert sorted((r["vec_id"], tuple(r["codes"])) for r in codes) == sorted(
        (r["vec_id"], tuple(r["codes"])) for r in codes2
    )


def test_pq_topk_recall_with_rerank(spark, sf_dir):
    """ADC shortlist + exact re-rank must recover >=60% of the true
    top-5 (measured 0.92-0.98; the floor is far below the band)."""
    from pyspark.sql import functions as F

    from featurestore_for_joycastle_java_spark.operators.similarity import (
        brute_force_topk,
        pq_topk,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    pq = pq_topk(e, q, k=5, m=16, shortlist=100).select("query_id", "vec_id")
    brute = brute_force_topk(e, q, k=5).select("query_id", "vec_id")
    hits = pq.join(brute, ["query_id", "vec_id"]).count()
    assert hits / 50 >= 0.6


def test_kmeans_fit_sample_bounded_training(spark, sf_dir):
    """fit_sample trains on a bounded sample (O(sample*k) Lloyd passes —
    the 100 TB knob): still returns exactly k centroids of the right
    dim, and semdedup over sampled-fit cells keeps one row per vector
    with cell-local survivor semantics intact."""
    from pyspark.sql import functions as F

    from featurestore_for_joycastle_java_spark.operators.similarity import (
        kmeans_centroids,
        semdedup_survivors,
    )

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = kmeans_centroids(e, n_centroids=8, fit_sample=200).collect()
    assert len(cents) == 8
    assert all(len(r["__mv"]) == len(cents[0]["__mv"]) for r in cents)

    out = semdedup_survivors(
        e, n_centroids=8, centroids="kmeans", fit_sample=200
    )
    rows = out.collect()
    assert len(rows) == e.count()  # one verdict per vector
    assert {r["cent_id"] for r in rows} <= set(range(8))
    # the lowest id within any cell can never be dropped (no smaller id)
    low = min(rows, key=lambda r: r["vec_id"])
    assert low["survivor"]
