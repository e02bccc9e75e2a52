"""Concurrency tests (reference §5.5: concurrent read/write with pushdown —
crates/sqlite/src/write.rs:792, multi-batch append duckdb/mod.rs:126)."""

import threading

from pyspark.sql import functions as F
from pyspark.sql import types as T

from datafusion_table_providers_spark.write import writer

SCHEMA = T.StructType(
    [T.StructField("id", T.LongType(), False), T.StructField("v", T.DoubleType())]
)


def test_multi_batch_append_then_filtered_read(spark, tmp_duckdb):
    for wave in range(5):
        df = spark.createDataFrame(
            [(wave * 100 + i, float(i)) for i in range(100)], SCHEMA
        )
        writer.insert_into(tmp_duckdb, "t", df, create=(wave == 0))
    tmp_duckdb.close()
    from datafusion_table_providers_spark.sources.duckdb_source import (
        duckdb_reader_df,
    )

    df = duckdb_reader_df(spark, tmp_duckdb, "t")
    assert df.count() == 500
    assert df.filter(F.col("id") >= 400).count() == 100


def test_concurrent_readonly_scans(spark, tmp_duckdb):
    writer.insert_into(
        tmp_duckdb,
        "t",
        spark.createDataFrame([(i, float(i)) for i in range(1000)], SCHEMA),
    )
    tmp_duckdb.close()
    from datafusion_table_providers_spark.sources.duckdb_source import (
        duckdb_reader_df,
    )

    results, errors = [], []

    def scan(lo):
        try:
            df = duckdb_reader_df(spark, tmp_duckdb, "t").filter(F.col("id") >= lo)
            results.append(df.count())
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=scan, args=(lo,)) for lo in (0, 500, 900)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert sorted(results) == [100, 500, 1000]


def test_sqlite_interleaved_write_read(spark, tmp_sqlite):
    writer.insert_into(
        tmp_sqlite, "t", spark.createDataFrame([(1, 1.0)], SCHEMA)
    )
    from datafusion_table_providers_spark.sources.sqlite_source import (
        sqlite_reader_df,
    )

    assert sqlite_reader_df(spark, tmp_sqlite, "t").count() == 1
    writer.insert_into(
        tmp_sqlite, "t", spark.createDataFrame([(2, 2.0)], SCHEMA), create=False
    )
    assert sqlite_reader_df(spark, tmp_sqlite, "t").count() == 2


def test_engine_level_dml(spark, tmp_path):
    from datafusion_table_providers_spark.engine import Engine
    from datafusion_table_providers_spark.sources.backends import DuckDBBackend

    b = DuckDBBackend(str(tmp_path / "e.duckdb"))
    eng = Engine(spark)
    df = spark.createDataFrame([(i, float(i)) for i in range(20)], SCHEMA)
    writer.insert_into(b, "t", df)
    b.close()
    eng.register_backend_table("t", b, "t")
    assert eng.delete_from("t", '"id" >= 10') == 10
    assert eng.update("t", {"v": "v + 1"}, '"id" < 5') == 5
    out = eng.sql("SELECT COUNT(*) AS n, SUM(v) AS s FROM t").collect()[0]
    assert out["n"] == 10 and out["s"] == 50.0


def test_duckdb_nested_locked_call_during_iteration(tmp_path):
    """The DuckDB backend lock is reentrant: the stream deliberately holds
    it across yields (interleaved execute() would invalidate the open
    streaming result), but the SAME thread may still call other locked
    methods mid-iteration without deadlocking itself."""
    from datafusion_table_providers_spark.sources.backends import DuckDBBackend

    b = DuckDBBackend(str(tmp_path / "r.duckdb"))
    b.execute("CREATE TABLE t AS SELECT range AS id FROM range(1000)")
    seen = 0
    names = None
    for batch in b.query_arrow_batches("SELECT id FROM t", batch_size=200):
        seen += batch.num_rows
        if names is None:
            names = b.table_names()  # nested locked call, same thread
            break  # one nested call is the regression surface
    assert names == ["t"]
    assert seen > 0
