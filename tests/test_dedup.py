"""Semantic tests for dedup operators: determinism, duplicate detection,
LSH recall vs exact Jaccard (the correctness anchor for the scale path)."""

from __future__ import annotations

from pyspark.sql import Row, functions as F

from featurestore_for_joycastle_java_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    simhash,
    simhash_near_pairs,
    token_jaccard_pairs,
)
from featurestore_for_joycastle_java_spark.operators.text import shingles, tokens


def _docs(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    )


def test_exact_dedup_keeps_min_id(spark):
    df = _docs(spark, ["a b c", "x y", "a  b   c", "A B C"])  # 0,2,3 identical after norm
    out = exact_dedup(df, "doc_id", "text").collect()
    ids = sorted(r.doc_id for r in out)
    assert ids == [0, 1]


def test_simhash_identical_texts_equal(spark):
    df = _docs(spark, ["spark makes plans", "spark makes plans", "other words here"])
    sh = {r.id: r.simhash for r in simhash(df, "doc_id", "text").collect()}
    assert sh[0] == sh[1]
    assert sh[0] != sh[2]


def test_simhash_pairs_find_duplicates(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    df = _docs(spark, [base, base, "completely different content tokens entirely unrelated"])
    pairs = simhash_near_pairs(df, "doc_id", "text", max_hamming=3).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(0, 1)}
    assert pairs[0].hamming == 0


def test_token_jaccard_exact_values(spark):
    df = _docs(spark, ["a b c d", "a b c e", "x y z w"])
    pairs = token_jaccard_pairs(df, "doc_id", "text", threshold=0.0).collect()
    vals = {(p.id_a, p.id_b): p.jaccard for p in pairs}
    # |{a,b,c}| / |{a,b,c,d,e}| = 3/5
    assert vals == {(0, 1): 0.6}


def test_minhash_recall_vs_exact_shingle_jaccard(spark, sf_dir):
    """MinHash LSH (jaccard_dist<=0.4) must recover ≥90% of truly-near
    pairs (true shingle-jaccard ≥ 0.8) — the recall contract that makes
    it a valid stand-in for exact dedup at scale."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sh = docs.select("doc_id", shingles(F.col("text")).alias("sh")).filter(
        F.size("sh") > 0
    )
    a, b = sh.alias("a"), sh.alias("b")
    exact = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            (
                F.size(F.array_intersect("a.sh", "b.sh"))
                / F.size(F.array_union("a.sh", "b.sh"))
            ).alias("j"),
        )
        .filter(F.col("j") >= 0.8)
        .collect()
    )
    truth = {(r.id_a, r.id_b) for r in exact}
    assert truth, "fixture should contain near-duplicate documents"
    found = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, "doc_id", "text").collect()
    }
    recall = len(truth & found) / len(truth)
    assert recall >= 0.9, f"recall {recall} over {len(truth)} true pairs"


def test_minhash_deterministic_across_runs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(100)
    p1 = sorted(map(tuple, minhash_lsh_pairs(docs, "doc_id", "text").collect()))
    p2 = sorted(map(tuple, minhash_lsh_pairs(docs, "doc_id", "text").collect()))
    assert p1 == p2


def test_connected_components_isolated_and_chain(spark):
    from featurestore_for_joycastle_java_spark.operators.dedup import (
        connected_components,
    )

    nodes = spark.createDataFrame(
        [(i,) for i in range(6)], ["doc_id"]
    )
    # chain 0-1-2, pair 3-4, isolated 5
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (3, 4)], ["id_a", "id_b"]
    )
    got = {
        (r["doc_id"], r["component"])
        for r in connected_components(nodes, edges).collect()
    }
    assert got == {(0, 0), (1, 0), (2, 0), (3, 3), (4, 3), (5, 5)}


def test_dedup_pipeline_lsh_sane_and_deterministic(spark):
    from featurestore_for_joycastle_java_spark.catalog.dedup import (
        dedup_pipeline_lsh,
    )

    sf = "/root/testdata/sf0.001"
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    a = dedup_pipeline_lsh(spark, sf).collect()
    # every doc appears exactly once
    assert len(a) == n_docs
    # exactly one survivor per cluster
    per_comp: dict = {}
    for r in a:
        per_comp.setdefault(r["component"], []).append(r["is_survivor"])
    assert all(sum(v) == 1 for v in per_comp.values())
    # deterministic across runs (seedless hashing + explicit tie-breaks)
    b = dedup_pipeline_lsh(spark, sf).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_connected_components_raises_when_unconverged(spark):
    # a 5-node path graph needs 4+ min-label rounds; max_iter=1 must
    # raise instead of silently returning split components
    import pytest as _pytest

    from featurestore_for_joycastle_java_spark.operators.dedup import (
        connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(4)], "id_a long, id_b long"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, edges, max_iter=1)
    # and with enough rounds the same graph collapses to one component
    out = connected_components(nodes, edges, max_iter=10).collect()
    assert {r["component"] for r in out} == {0}


def test_connected_components_reliable_checkpoint_dir(spark, tmp_path):
    from featurestore_for_joycastle_java_spark.operators.dedup import (
        connected_components,
    )

    nodes = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    out = connected_components(
        nodes, edges, checkpoint_dir=str(tmp_path / "ckpt")
    ).collect()
    comp = {r["doc_id"]: r["component"] for r in out}
    assert comp[0] == comp[1] == comp[2] == 0
    assert comp[3] == 3  # isolated
    assert comp[4] == comp[5] == 4


def test_simhash_near_pairs_rejects_bad_banding(spark):
    import pytest

    from featurestore_for_joycastle_java_spark.operators.dedup import (
        simhash_near_pairs,
    )

    df = spark.createDataFrame([(1, "a b c")], "doc_id int, text string")
    with pytest.raises(ValueError, match="divisible"):
        simhash_near_pairs(df, "doc_id", "text", n_bands=7, bits=64)
    with pytest.raises(ValueError, match="divisible"):
        simhash_near_pairs(df, "doc_id", "text", n_bands=128, bits=64)


def test_token_jaccard_paths_agree(spark, sf_dir):
    """The adaptive small-vocab bitmask path and the inverted-index path
    are the SAME operator: identical pair sets and 6dp jaccard values on
    the fixture corpus (whose 31-token vocab passes every bitmask gate
    under small_vocab_max=1024 — the catalog callers' setting; the r5
    default is None = lazy inverted index, so the fast path is opt-in)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
        F.col("source").isin("src0", "src1")
    )
    fast = {
        (r.id_a, r.id_b): r.jaccard
        for r in token_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.6, small_vocab_max=1024
        ).collect()
    }
    slow = {
        (r.id_a, r.id_b): r.jaccard
        for r in token_jaccard_pairs(
            docs, "doc_id", "text", threshold=0.6, small_vocab_max=0
        ).collect()
    }
    assert fast == slow
    assert len(fast) > 0


def test_token_jaccard_bitmask_multiword_vocab(spark):
    """Vocab > 64 forces multiple mask words — the cross-word popcount
    sum must still count every shared token (catches a word-index or
    shift bug that single-word vocabs would hide)."""
    shared = " ".join(f"tok{i:03d}" for i in range(100))  # spans 2 words
    df = _docs(
        spark,
        [shared + " extraA", shared + " extraB", "unrelated stuff here"],
    )
    pairs = token_jaccard_pairs(
        df, "doc_id", "text", threshold=0.5, small_vocab_max=1024
    ).collect()
    vals = {(p.id_a, p.id_b): p.jaccard for p in pairs}
    # |∩|=100, |∪|=102
    assert vals == {(0, 1): round(100 / 102, 6)}


def test_token_jaccard_gate_pair_heuristic(spark):
    """r5 gate: the bitmask path engages only when its ~n²/2 nested-loop
    evals are within 2x of the inverted index's Σdf² pair-token shuffle
    rows — a dense tiny-vocab corpus takes the bitmask (plan shows the
    broadcast nested loop), while a small-vocab corpus whose tokens are
    nearly unique (n² >> 2Σdf²) keeps the inverted index even though the
    vocab fits the bound."""
    import contextlib
    import io

    def plan(df):
        q = token_jaccard_pairs(
            df, "doc_id", "text", threshold=0.6, small_vocab_max=1024
        )
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            q.explain("formatted")
        return buf.getvalue()

    # dense: 40 docs over a 10-token vocab -> Σdf² ≈ 40²·tpd²/10 >> n²
    dense = _docs(
        spark,
        [" ".join(f"t{(i + j) % 10}" for j in range(5)) for i in range(40)],
    )
    assert "BroadcastNestedLoopJoin" in plan(dense)

    # sparse: 50 docs, 2 unique tokens each (df=1 -> Σdf²=100 < n²/2)
    sparse = _docs(
        spark, [f"u{2 * i} u{2 * i + 1}" for i in range(50)]
    )
    assert "BroadcastNestedLoopJoin" not in plan(sparse)
