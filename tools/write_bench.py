"""Write-path micro-benchmark mirroring the reference's insert harness.

Reference: benches/sqlite_insert_benchmark.rs — batch-size sweep
(batches × rows-per-batch), prepared-statement vs inline-SQL methods, metrics
as rows/sec and µs/row (lines 90-100). Fixture: the bench_table schema from
FIXTURES.md (id BIGINT, name STRING, value DOUBLE, category STRING nullable,
count BIGINT nullable; category='category_{i%10}', count NULL unless i%3==0).

Usage: python tools/write_bench.py [--json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_table_providers_spark.sources.backends import (  # noqa: E402
    DuckDBBackend,
    SQLiteBackend,
)

#: (batches, rows_per_batch) — the reference's sweep, truncated to the sizes
#: that finish in seconds (benchmark.rs line 58).
CONFIGS = [(10, 10), (10, 100), (1, 1000), (10, 1000), (10, 10000), (5, 50000)]

DDL = (
    'CREATE TABLE IF NOT EXISTS "bench_table" ('
    '"id" BIGINT NOT NULL, "name" TEXT NOT NULL, "value" DOUBLE NOT NULL, '
    '"category" TEXT, "count" BIGINT)'
)


def _rows(n, offset=0):
    return [
        (
            offset + i,
            f"name_{i}",
            i * 1.5,
            f"category_{i % 10}",
            i if i % 3 == 0 else None,
        )
        for i in range(n)
    ]


def bench_sqlite(method: str, batches: int, per_batch: int) -> float:
    path = os.path.join(tempfile.gettempdir(), "wb_sqlite.db")
    if os.path.exists(path):
        os.remove(path)
    b = SQLiteBackend(path)
    b.execute(DDL.replace("DOUBLE", "REAL"))
    t0 = time.time()
    for i in range(batches):
        rows = _rows(per_batch, i * per_batch)
        if method == "prepared":
            b.executemany(
                'INSERT INTO "bench_table" VALUES (?, ?, ?, ?, ?)', rows
            )
        else:  # inline SQL, the reference's slow path
            values = ", ".join(
                f"({r[0]}, '{r[1]}', {r[2]}, '{r[3]}', "
                + ("NULL" if r[4] is None else str(r[4]))
                + ")"
                for r in rows
            )
            b.execute(f'INSERT INTO "bench_table" VALUES {values}')
    return time.time() - t0


def bench_duckdb_arrow(batches: int, per_batch: int) -> float:
    """Our production path: Arrow staging table + INSERT..SELECT."""
    import pyarrow as pa

    path = os.path.join(tempfile.gettempdir(), "wb_duck.duckdb")
    if os.path.exists(path):
        os.remove(path)
    b = DuckDBBackend(path)
    b.execute(DDL.replace("TEXT", "VARCHAR"))
    t0 = time.time()
    for i in range(batches):
        rows = _rows(per_batch, i * per_batch)
        tbl = pa.table(
            {
                "id": [r[0] for r in rows],
                "name": [r[1] for r in rows],
                "value": [r[2] for r in rows],
                "category": [r[3] for r in rows],
                "count": [r[4] for r in rows],
            }
        )
        b.register_arrow("staging_wb", tbl)
        b.execute('INSERT INTO "bench_table" SELECT * FROM staging_wb')
        b.unregister("staging_wb")
    return time.time() - t0


def bench_spark_transport(via: str, rows: int, partitions: int) -> float:
    """End-to-end DataFrame→DuckDB ingest through writer.insert_into:
    via='arrow' (driver toArrow) vs via='spool' (executor-parallel parquet).
    """
    from datafusion_table_providers_spark.session import get_spark
    from datafusion_table_providers_spark.write import writer

    spark = get_spark("write-bench")
    spark.sparkContext.setLogLevel("ERROR")
    df = (
        spark.range(rows)
        .selectExpr(
            "id",
            "concat('name_', id) AS name",
            "id * 1.5 AS value",
            "concat('category_', id % 10) AS category",
            "CASE WHEN id % 3 = 0 THEN id END AS count",
        )
        .repartition(partitions)
    )
    df.count()  # materialize input cost outside the timed window
    path = os.path.join(tempfile.gettempdir(), f"wb_spark_{via}.duckdb")
    if os.path.exists(path):
        os.remove(path)
    b = DuckDBBackend(path)
    t0 = time.time()
    writer.insert_into(b, "bench_table", df, via=via)
    return time.time() - t0


def main_spark():
    results = []
    for rows, partitions in [(100_000, 8), (1_000_000, 32)]:
        for via in ("arrow", "spool"):
            sec = bench_spark_transport(via, rows, partitions)
            results.append(
                {
                    "method": f"spark_{via}",
                    "rows": rows,
                    "partitions": partitions,
                    "rows_per_sec": round(rows / sec, 1),
                    "us_per_row": round(sec / rows * 1e6, 3),
                }
            )
            print(
                f"spark_{via:6s} {rows:>9,d} rows x{partitions:<3d} "
                f"{results[-1]['rows_per_sec']:>12,.0f} rows/s",
                file=sys.stderr,
            )
    print(json.dumps({"metric": "write_bench_spark", "results": results}))


def main():
    if "--spark" in sys.argv:
        main_spark()
        return
    results = []
    for batches, per_batch in CONFIGS:
        total = batches * per_batch
        for method, fn in [
            ("sqlite_prepared", lambda: bench_sqlite("prepared", batches, per_batch)),
            ("sqlite_inline", lambda: bench_sqlite("inline", batches, per_batch)),
            ("duckdb_arrow", lambda: bench_duckdb_arrow(batches, per_batch)),
        ]:
            if method == "sqlite_inline" and total > 100000:
                continue  # the reference skips huge inline runs too
            sec = fn()
            results.append(
                {
                    "method": method,
                    "batches": batches,
                    "rows_per_batch": per_batch,
                    "rows_per_sec": round(total / sec, 1),
                    "us_per_row": round(sec / total * 1e6, 3),
                }
            )
            print(
                f"{method:16s} {batches:>4d}x{per_batch:<7d} "
                f"{results[-1]['rows_per_sec']:>12,.0f} rows/s "
                f"{results[-1]['us_per_row']:>8.2f} us/row",
                file=sys.stderr,
            )
    prepared = [r for r in results if r["method"] == "sqlite_prepared"]
    inline = [r for r in results if r["method"] == "sqlite_inline"]
    speedups = [
        p["rows_per_sec"] / i["rows_per_sec"]
        for p in prepared
        for i in inline
        if (p["batches"], p["rows_per_batch"]) == (i["batches"], i["rows_per_batch"])
    ]
    summary = {
        "metric": "write_bench",
        "prepared_vs_inline_speedup": round(
            sum(speedups) / len(speedups), 2
        ) if speedups else None,
        "results": results,
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
