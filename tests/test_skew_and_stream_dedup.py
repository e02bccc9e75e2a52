"""Skew-join helpers + streaming dedup tests."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

SCHEMA = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("v", T.LongType())]
)
DIM = T.StructType(
    [T.StructField("k", T.LongType()), T.StructField("name", T.StringType())]
)


def _skewed(spark):
    # 90% of rows share k=0
    rows = [(0, i) for i in range(900)] + [(i % 50 + 1, i) for i in range(100)]
    return spark.createDataFrame(rows, SCHEMA)


def test_salted_join_matches_plain_join(spark):
    from datafusion_table_providers_spark.operators.skew import salted_join

    big = _skewed(spark)
    small = spark.createDataFrame([(i, f"n{i}") for i in range(51)], DIM)
    got = salted_join(big, small, "k", n_salts=8)
    want = big.join(small, on="k")
    assert got.count() == want.count() == 1000
    assert (
        got.groupBy("k").count().orderBy("k").collect()
        == want.groupBy("k").count().orderBy("k").collect()
    )


def test_hot_cold_join_matches_plain_join(spark):
    from datafusion_table_providers_spark.operators.skew import (
        find_hot_keys,
        hot_cold_join,
    )

    big = _skewed(spark)
    small = spark.createDataFrame([(i, f"n{i}") for i in range(51)], DIM)
    hot = find_hot_keys(big, "k", threshold_ratio=0.5)
    assert hot == [0]
    got = hot_cold_join(big, small, "k", hot_keys=hot)
    assert got.count() == 1000
    assert got.filter(F.col("k") == 0).count() == 900


def test_stream_dedup_exact(spark, tmp_path):
    from datafusion_table_providers_spark.streaming.dedup import (
        dedup_exact_stream,
    )
    from datafusion_table_providers_spark.streaming.events import (
        run_available_now,
    )

    # docs stream with duplicated text payloads
    src_dir = tmp_path / "docs"
    src_dir.mkdir()
    df = spark.createDataFrame(
        [(i, f"text_{i % 10}", f"2024-01-01 00:{i:02d}:00") for i in range(40)],
        "doc_id long, text string, ts_str string",
    ).withColumn("ts", F.col("ts_str").cast("timestamp"))
    df.write.parquet(str(src_dir / "batch0"))
    stream = (
        spark.readStream.schema(df.schema)
        .parquet(str(src_dir / "*"))
    )
    deduped = dedup_exact_stream(stream, watermark="10 minutes")
    out = run_available_now(deduped, "stream_dedup", output_mode="append")
    texts = [r["text"] for r in out.collect()]
    assert sorted(texts) == sorted(f"text_{i}" for i in range(10))


def test_dedup_against_history(spark):
    from datafusion_table_providers_spark.streaming.dedup import (
        dedup_against_history,
    )

    batch = spark.createDataFrame(
        [(i, f"text_{i}") for i in range(20)], "doc_id long, text string"
    )
    history = batch.filter(F.col("doc_id") < 10).select(
        F.xxhash64(F.length("text"), F.col("text")).alias("text_hash")
    )
    # static-on-static exercises the same plan as stream-static
    out = dedup_against_history(batch, history)
    assert sorted(r["doc_id"] for r in out.collect()) == list(range(10, 20))


def test_decontaminate_stream_foreach_batch(spark, tmp_path):
    """Drive decontamination through a REAL file stream via foreachBatch and
    check the union of cleaned microbatches equals the batch operator's
    output on the same data."""
    from datafusion_table_providers_spark.streaming.dedup import (
        decontaminate_batch,
        decontaminate_foreach_batch,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "zeta eta theta iota kappa"),
            (3, "alpha beta gamma delta other"),  # shares 4-gram with eval
            (4, "totally different words here now"),
        ],
        "doc_id long, text string",
    )
    eval_grams = spark.createDataFrame(
        [("alpha beta gamma delta",)], "gram string"
    )

    src_dir = tmp_path / "docs_in"
    src_dir.mkdir()
    docs.repartition(2).write.parquet(str(src_dir / "b0"))
    stream = spark.readStream.schema(docs.schema).parquet(str(src_dir / "*"))

    got = []
    sink = decontaminate_foreach_batch(
        eval_grams, lambda df: got.extend(r.doc_id for r in df.collect())
    )
    q = (
        stream.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    want = sorted(
        r.doc_id for r in decontaminate_batch(docs, eval_grams).collect()
    )
    assert sorted(got) == want == [2, 4]
