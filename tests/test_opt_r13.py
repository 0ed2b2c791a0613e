"""Round-13 optimization pins: the vectorized PQ-encode and brute-force
ground-truth kernels must replay their HOF-fold predecessors bit-exactly
(codes are ints — exact equality; cosines are the identical IEEE float64
sequence, compared as raw doubles)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from featurestore_for_joycastle_java_spark.operators import similarity as S


def _pq_encode_hof(corpus, codebooks, id_col="vec_id", vec_col="embedding",
                   m=8, dim=64):
    """The pre-r13 HOF-fold pq_encode, kept verbatim as the reference."""
    sub_d = dim // m
    v = corpus.select(F.col(id_col), S.unit_vec(F.col(vec_col)).alias("__v"))
    init = F.struct(
        F.lit(float("inf")).alias("d"), F.lit(-1).cast("int").alias("code")
    )

    def best_code(sub):
        subvec = F.slice(F.col("__v"), sub["sub_id"] * sub_d + 1, sub_d)

        def step(acc, e):
            cand = F.struct(
                S._sq_dist(subvec, e["__cb"]).alias("d"),
                e["code"].alias("code"),
            )
            return F.element_at(
                F.transform(
                    F.array(cand),
                    lambda c: F.when(c["d"] < acc["d"], c).otherwise(acc),
                ),
                1,
            )

        return F.aggregate(sub["entries"], init, step)["code"]

    codes = F.transform(F.col("__books"), best_code)
    return (
        v.join(F.broadcast(S._pq_books_row(codebooks)))
        .select(id_col, codes.alias("codes"))
    )


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    from featurestore_for_joycastle_java_spark.sources import load_table

    return load_table(spark, sf_dir, "embeddings")


def test_pq_encode_kernel_matches_hof_fold(spark, emb):
    books = S.pq_codebooks(emb, m=8, k=16)
    old = {r["vec_id"]: list(r["codes"]) for r in
           _pq_encode_hof(emb, books, m=8).collect()}
    new = {r["vec_id"]: list(r["codes"]) for r in
           S.pq_encode(emb, books, m=8).collect()}
    assert old == new


def test_pq_encode_kernel_null_row_codes_minus_one(spark, emb):
    # the HOF fold leaves a NULL vector at the init code (-1) in every
    # subspace; the kernel must reproduce that, not drop or null the row
    books = S.pq_codebooks(emb, m=8, k=16)
    with_null = emb.select(
        "vec_id",
        F.when(F.col("vec_id") % 7 == 3, F.lit(None)).otherwise(
            F.col("embedding")
        ).alias("embedding"),
    )
    old = {r["vec_id"]: list(r["codes"]) for r in
           _pq_encode_hof(with_null, books, m=8).collect()}
    new = {r["vec_id"]: list(r["codes"]) for r in
           S.pq_encode(with_null, books, m=8).collect()}
    assert old == new
    nulled = [i for i in old if i % 7 == 3]
    assert nulled and all(old[i] == [-1] * 8 for i in nulled)


def test_pq_encode_kernel_refuses_ragged(spark, emb):
    books = S.pq_codebooks(emb, m=8, k=16)
    ragged = emb.select(
        "vec_id",
        F.when(F.col("vec_id") % 11 == 1, F.slice("embedding", 1, 8))
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    with pytest.raises(Exception, match="uniform"):
        S.pq_encode(ragged, books, m=8).collect()


def test_brute_topk_arrow_matches_hof(spark, emb):
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = sorted(map(tuple, S.brute_force_topk(emb, q, k=5).collect()))
    b = sorted(map(tuple, S.brute_force_topk_arrow(emb, q, k=5).collect()))
    assert a == b


def test_brute_topk_arrow_null_rows_score_null(spark, emb):
    # NULL corpus vectors must rank exactly as in the HOF form (cos NULL,
    # sorted last by the desc window) — both paths compared end to end
    with_null = emb.select(
        "vec_id",
        F.when(F.col("vec_id") % 13 == 5, F.lit(None)).otherwise(
            F.col("embedding")
        ).alias("embedding"),
    )
    q = with_null.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = sorted(map(tuple, S.brute_force_topk(with_null, q, k=5).collect()))
    b = sorted(
        map(tuple, S.brute_force_topk_arrow(with_null, q, k=5).collect())
    )
    assert a == b


def _srp_codes_hof(df, id_col, vec_col, n_tables=8, n_bits=8, dim=64):
    """The pre-r13 HOF-fold srp_codes, kept verbatim as the reference."""
    planes = S.srp_hyperplanes(n_tables, n_bits, dim)
    pdf = df.sparkSession.createDataFrame(
        [
            (t, [(1 << b, planes[(t, b)]) for b in range(n_bits)])
            for t in range(n_tables)
        ],
        "tbl int, planes array<struct<bv: bigint, pv: array<double>>>",
    )
    planes_row = pdf.select(F.struct("tbl", "planes").alias("p")).agg(
        F.sort_array(F.collect_list("p")).alias("__tables")
    )
    vec = F.col(vec_col)
    checked = F.when(F.size(vec) == dim, S.as_double(vec)).otherwise(
        F.raise_error(F.lit("bad dim"))
    )
    src = df.select(F.col(id_col), checked.alias("__v"))
    codes_arr = F.transform(
        F.col("__tables"),
        lambda t: F.struct(
            t["tbl"].alias("tbl"),
            F.aggregate(
                t["planes"],
                F.lit(0).cast("long"),
                lambda acc, p: acc
                + F.when(S.dot(F.col("__v"), p["pv"]) > 0, p["bv"]).otherwise(
                    F.lit(0).cast("long")
                ),
            ).alias("code"),
        ),
    )
    return (
        src.join(F.broadcast(planes_row))
        .select(id_col, F.explode(codes_arr).alias("__tc"))
        .select(id_col, "__tc.tbl", "__tc.code")
    )


def test_srp_codes_kernel_matches_hof_fold(spark, emb):
    old = sorted(map(tuple, _srp_codes_hof(emb, "vec_id", "embedding").collect()))
    new = sorted(
        map(tuple, S.srp_codes(emb, "vec_id", "embedding").collect())
    )
    assert old == new


def test_srp_codes_kernel_multi_partition(spark, emb):
    old = sorted(map(tuple, _srp_codes_hof(emb, "vec_id", "embedding").collect()))
    new = sorted(
        map(
            tuple,
            S.srp_codes(emb.repartition(8), "vec_id", "embedding").collect(),
        )
    )
    assert old == new


def test_srp_codes_kernel_refuses_bad_dim(spark, emb):
    ragged = emb.select(
        "vec_id",
        F.when(F.col("vec_id") % 11 == 1, F.slice("embedding", 1, 8))
        .otherwise(F.col("embedding"))
        .alias("embedding"),
    )
    with pytest.raises(Exception, match="srp_codes"):
        S.srp_codes(ragged, "vec_id", "embedding").collect()


def test_brute_topk_arrow_multi_partition(spark, emb):
    # partial batches across partitions must not change any score
    e8 = emb.repartition(8)
    q = emb.filter(F.col("vec_id") % 50 == 1).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    a = sorted(map(tuple, S.brute_force_topk(emb, q, k=5).collect()))
    b = sorted(map(tuple, S.brute_force_topk_arrow(e8, q, k=5).collect()))
    assert a == b
