

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
