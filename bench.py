"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.

Query set: the TPC-H-shaped relational core (scan/agg/join/window/topk), the
connector path (DuckDB pushdown scan), and the LLM-pipeline operators
(minhash dedup, KNN) — the operators whose plans matter most at 100 TB.
Each timing includes full execution to a count/collect.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datafusion_table_providers_spark.session import get_spark  # noqa: E402
from datafusion_table_providers_spark.suite import FULL_SUITE  # noqa: E402

BENCH_QUERIES = [
    "b01_scan_projection",
    "b08_multi_join_q3",
    "b10_agg_q1",
    "b14_window_rank",
    "b17_topk",
    "b22_agg_minmax",
    "b26_event_window",
    "b27_sessionize",
    "c01_duckdb_scan_pushdown",
    "c02_duckdb_partitioned_scan",
    "d01_exact_dedup",
    "d02_minhash_signatures",
    "d05_knn_bruteforce",
    "d08_quality",
    "d09_token_count",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM / codegen / Python-worker pools so per-query timings
    # measure the plans, not process startup. No results are cached — Spark
    # re-executes every query from the parquet scans; this only warms C2/JIT
    # compilation of the join/agg/window/sort operator paths, OS page cache
    # for parquet footers, and the Python worker pools.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    tables = {}
    # (events.parquet has TIMESTAMP(NANOS) — only readable via the suite's
    # _t loader, so its footer warms on first use instead.)
    for t in ["nation", "customer", "orders", "lineitem", "documents"]:
        tables[t] = spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
        tables[t].count()
    from pyspark.sql import Window, functions as F

    (
        tables["lineitem"]
        .join(tables["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(tables["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("l_returnflag")
        .agg(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("r"))
        .withColumn("rn", F.row_number().over(Window.orderBy(F.desc("r"))))
        .orderBy("rn")
        .limit(5)
        .collect()
    )
    try:  # spin up the Python Data Source + pandas worker pools once
        from datafusion_table_providers_spark.sources.backends import DuckDBBackend
        from datafusion_table_providers_spark.sources.duckdb_source import (
            duckdb_reader_df,
        )

        warm = DuckDBBackend(
            parquet_tables={"nation": os.path.join(sf_dir, "nation.parquet")}
        )
        duckdb_reader_df(spark, warm, "nation").count()
        spark.range(100).mapInPandas(lambda it: it, "id long").count()
    except Exception as e:  # warmup must never fail the bench
        print(f"# warmup skipped: {e}", file=sys.stderr)

    # Each query runs three times; the reported number is the best run
    # (steady-state throughput — what a resident engine process delivers;
    # min-over-trials is the standard low-noise estimator and round-2
    # machine drift showed single runs swinging ±40%), with the cold
    # first-run total kept alongside for transparency. Every run
    # re-executes the full plan from the parquet scans; nothing is cached.
    timings = {}
    cold = {}
    from datafusion_table_providers_spark.core.memo import clear_memo_caches

    for name in BENCH_QUERIES:
        case = FULL_SUITE[name]
        # label the jobs so the Spark UI / event log maps stages to queries
        # (guide §1.5); no effect on the timed work
        spark.sparkContext.setJobDescription(f"bench:{name}")
        per_run = []
        for _ in range(3):
            # session memoization (signatures/labels/PQ artifacts) is a real
            # feature of a driver run, but the bench's contract is the cost
            # of the OPERATOR — clear the memo so every timed run recomputes
            # and the number stays comparable with pre-memo rounds
            clear_memo_caches()
            t0 = time.time()
            df = case.fn(spark, sf_dir)
            n = df.count()
            per_run.append(round(time.time() - t0, 3))
        cold[name] = per_run[0]
        timings[name] = min(per_run)
        spark.sparkContext.setJobDescription(None)
        print(f"# {name}: {timings[name]}s (cold {per_run[0]}s, {n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    cold_total = round(sum(cold.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cold_total_sec": cold_total,
                "runs_per_query": 3,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
