"""SparkSession construction and scale-oriented tuning.

The reference has no parallelism of its own (every scan is
``UnknownPartitioning(1)`` — crates/common/src/sql/sql_provider_datafusion/
mod.rs:312-317); Spark gives us partitioned scans and shuffles for free.
These settings are the defaults we would ship on a 1000-executor cluster,
scaled down so they also behave on local[32]:

- AQE on (runtime coalescing / skew-join splitting) — replaces hand-tuned
  shuffle partition counts at 100 TB.
- Arrow-batched Python boundaries (Pandas UDFs, Python Data Source) —
  the analog of the reference's Arrow-everywhere design (§1.1).
- Broadcast threshold left to Spark but all dimension joins in the operator
  library hint ``broadcast()`` explicitly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Conservative defaults that scale: on a real cluster these are overridden by
#: site config; on local[32] they keep partitions sized to fit memory.
TUNING = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.python.filterPushdown.enabled": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    "spark.sql.files.maxPartitionBytes": "134217728",  # 128 MiB splits
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.shuffle.partitions": os.environ.get("SPARK_GRAFT_CPUS", "32"),
    # Streaming state lives off-heap in RocksDB instead of the default
    # in-memory HashMap provider: at 100 TB the stateful operators
    # (windowed counts, sessionization, stream-stream joins, streaming
    # dedup) hold state bounded only by the watermark horizon — RocksDB
    # keeps executor heap flat and spills to local disk. Runtime-mutable,
    # honored per-query at stream start; identical results (guide §5).
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
}


def get_spark(app_name: str = "datafusion_table_providers_spark") -> SparkSession:
    """Build (or reuse) a tuned SparkSession on local[$SPARK_GRAFT_CPUS]."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # JVM-launch-time settings (ignored on an already-running session):
        # 32 concurrent tasks deserializing wide plans need real heap.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in TUNING.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    return tune_session(spark)


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable tuning to an externally provided session.

    The correctness driver owns its own SparkSession; everything here must be
    a runtime-mutable SQL conf (no core/executor settings).
    """
    for k, v in TUNING.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - static conf on live session
            pass
    return spark
