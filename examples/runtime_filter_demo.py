"""Runtime semi-join reduction demo (sources/dynamic_filter.py).

A connector-backed fact table joined against a filtered dimension: the
dim's surviving join keys are rendered into the fact scan's remote WHERE
at runtime, so the remote engine ships only potentially-matching rows —
the dynamic-filter pushdown Spark's own runtime filters cannot deliver
across the Python DataSource boundary.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import tempfile

import duckdb

from pyspark.sql import functions as F

from datafusion_table_providers_spark.engine import Engine
from datafusion_table_providers_spark.session import get_spark
from datafusion_table_providers_spark.sources.backends import DuckDBBackend


def main():
    path = os.path.join(tempfile.mkdtemp(), "facts.duckdb")
    con = duckdb.connect(path)
    con.execute(
        "CREATE TABLE sales AS SELECT range AS sale_id, "
        "range % 5000 AS customer_id, (range * 7) % 1000 AS amount "
        "FROM range(200000)"
    )
    con.close()

    spark = get_spark("runtime-filter-demo")
    eng = Engine(spark)
    eng.register_backend_table("sales", DuckDBBackend(path))

    # the "filtered dim" — in a real pipeline this is a Spark-side table
    # the remote engine knows nothing about
    vip = spark.range(0, 5000).filter(F.col("id") % 400 == 0).select(
        F.col("id").alias("customer_id")
    )

    reduced = eng.reduced_view("sales", "customer_id", vip)
    total = (
        reduced.join(F.broadcast(vip), "customer_id")
        .agg(F.sum("amount").alias("vip_amount"))
        .collect()[0]["vip_amount"]
    )
    fetched = reduced.count()
    print(f"rows fetched from the remote engine: {fetched} (of 200000)")
    print(f"vip_amount = {total}")
    assert fetched < 200000


if __name__ == "__main__":
    main()
