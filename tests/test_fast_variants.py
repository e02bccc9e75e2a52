"""Production-scale (xxhash) dedup variants: same pipeline shapes as the
oracle-checked md5 operators, JVM-native hashing."""

from pyspark.sql import functions as F


def test_minhash_fast_matches_slow_pipeline_shape(spark):
    from datafusion_table_providers_spark.llm.dedup import (
        N_HASHES,
        minhash_signatures_fast,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    sig = minhash_signatures_fast(d)
    assert sig.columns == ["doc_id"] + [f"mh{j}" for j in range(N_HASHES)]
    rows = sig.limit(5).collect()
    assert all(isinstance(r["mh0"], int) for r in rows)
    assert sig.count() == d.count()


def test_exact_dedup_fast(spark):
    from datafusion_table_providers_spark.llm.dedup import exact_dedup_fast

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dup = d.union(d.limit(10))  # force 10 duplicates
    out = exact_dedup_fast(dup)
    assert out.filter(F.col("n_copies") == 2).count() == 10
    assert out.count() == d.count()


def test_pandas_knn_matches_sql_knn(spark):
    """The vectorized numpy KNN must agree with the SQL-expression KNN on
    neighbor sets (cosine ties aside)."""
    from datafusion_table_providers_spark.llm.similarity import (
        d05_knn_bruteforce,
        pandas_knn_topk,
    )

    sf = "/root/testdata/sf0.001"
    sql_top = {
        (r["qid"], r["cid"])
        for r in d05_knn_bruteforce(spark, sf).collect()
    }
    np_top = {
        (r["qid"], r["cid"])
        for r in pandas_knn_topk(spark, sf, n_queries=5, k=5).collect()
    }
    overlap = len(sql_top & np_top) / len(sql_top)
    assert overlap >= 0.9  # allow boundary ties to differ
