"""Curated-corpus output: partitioned, shard-size-controlled parquet.

The end of every training-data pipeline is a write nobody grades until it
falls over at scale: output shards must be (a) bounded in size so a
downstream loader can stream them, (b) partitioned by the columns the
loader filters on (source, language, shard), and (c) produced without
funnelling data through the driver. Spark gives all three declaratively —
this module pins the right incantation so callers don't rediscover it:

- ``spark.sql.files.maxRecordsPerFile`` bounds rows per shard WITHOUT a
  repartition shuffle (the writer splits oversized task outputs itself);
- ``partitionBy`` produces the hive layout loaders prune on;
- an optional ``target_shards`` repartition spreads the write across the
  cluster when the upstream stage ended skewed or single-partitioned.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame


def write_training_shards(
    df: DataFrame,
    path: str,
    shard_rows: int = 100_000,
    partition_by: Sequence[str] = (),
    target_shards: Optional[int] = None,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet shards of at most ``shard_rows`` rows.

    ``target_shards`` repartitions first (by the partition columns when
    given, else round-robin) — use it when the upstream stage collapsed to
    few/skewed partitions; leave None to keep the upstream partitioning and
    let ``maxRecordsPerFile`` do the size bounding alone.
    """
    out = df
    if target_shards:
        if partition_by:
            out = out.repartition(target_shards, *partition_by)
        else:
            out = out.repartition(target_shards)
    writer = out.write.mode(mode).option("maxRecordsPerFile", shard_rows)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
