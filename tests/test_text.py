

def test_shingles_short_docs_no_crash(spark):
    # regression: docs with < k tokens used to hit sequence(1, 0) ->
    # [1, 0] (descending!) and slice(arr, 0, k) threw at runtime; they
    # must yield EMPTY shingle sets instead
    from featurestore_for_joycastle_java_spark.operators.text import shingles
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("",), ("one",), ("one two",), ("one two three",)], "text string"
    )
    got = [
        r["sh"]
        for r in df.select(shingles(F.col("text"), 3).alias("sh")).collect()
    ]
    assert got == [[], [], [], ["one two three"]]


def test_md5_hash60_cross_engine_parity(spark):
    # the cross-engine claim md5_hash60 is built on: Spark's
    # conv(substring(md5(x),1,15),16,10) == DuckDB's
    # ('0x' || substr(md5(x),1,15))::BIGINT — pinned on real fixture
    # tokens (case handling, unsigned conv, 60-bit range)
    import duckdb

    from featurestore_for_joycastle_java_spark.operators.text import (
        md5_hash60,
        tokens,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    mine = {
        (r["t"], r["h"])
        for r in docs.select(
            F.explode(F.array_distinct(tokens(F.col("text")))).alias("t")
        )
        .distinct()
        .select("t", md5_hash60(F.col("t")).alias("h"))
        .collect()
    }
    con = duckdb.connect()
    theirs = set(
        con.execute(
            """
            SELECT DISTINCT t,
                   CAST(('0x' || substr(md5(t), 1, 15)) AS BIGINT) AS h
            FROM (SELECT unnest(list_distinct(list_filter(
                      string_split(lower(text), ' '), x -> x <> ''))) AS t
                  FROM read_parquet(
                      '/root/testdata/sf0.001/documents.parquet'))
            """
        ).fetchall()
    )
    assert mine == theirs
    assert all(0 <= h < (1 << 60) for _, h in mine)


def test_winnow_shared_run_guarantee(spark):
    # winnowing's defining property: any shared token run of >= k+w-1
    # tokens between two documents yields at least one shared fingerprint
    from featurestore_for_joycastle_java_spark.operators.text import (
        winnow_fingerprints,
    )
    from pyspark.sql import functions as F

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = k+w-1
    df = spark.createDataFrame(
        [
            (1, f"unrelated prefix words here {shared} and a suffix"),
            (2, f"{shared} totally different tail content follows now"),
            (3, "no overlap with anything else at all whatsoever"),
        ],
        "doc_id int, text string",
    )
    rows = df.select(
        "doc_id",
        winnow_fingerprints(F.col("text"), k=3, w=4).alias("fps"),
    ).collect()
    fps = {r["doc_id"]: set(r["fps"]) for r in rows}
    assert fps[1] & fps[2], "shared 6-token run must share a fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])


def test_winnow_short_docs_empty(spark):
    from featurestore_for_joycastle_java_spark.operators.text import (
        winnow_fingerprints,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("",), ("one",), ("one two",), ("one two three",)], "text string"
    )
    got = [
        len(r["f"])
        for r in df.select(
            winnow_fingerprints(F.col("text")).alias("f")
        ).collect()
    ]
    assert got == [0, 0, 0, 1]


def test_char_ngrams_basic_and_short_text(spark):
    """char_ngrams: distinct lowercased trigrams; texts shorter than n
    yield an empty set (not an error — the sequence(1,0)-descends trap)."""
    from featurestore_for_joycastle_java_spark.operators.text import char_ngrams
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "AbAb"), (2, "xy"), (3, ""), (4, "aaa a")],
        "id long, text string",
    )
    got = {
        r["id"]: sorted(r["g"])
        for r in df.select("id", char_ngrams(F.col("text")).alias("g")).collect()
    }
    assert got[1] == ["aba", "bab"]      # lowered, distinct
    assert got[2] == [] and got[3] == []
    assert got[4] == ["a a", "aa ", "aaa"]
