"""Bucketed (co-located) joins: the shuffle-elimination discipline at 100 TB.

A fact-fact join (lineitem ⋈ orders at TB scale) shuffles BOTH sides on the
key every time it runs. Writing the tables bucketed by that key moves the
partitioning to write time: Spark records the bucket spec in the catalog and
a later equi-join on the bucket key reads co-located buckets directly — no
Exchange on either side, every run. This is the storage-level counterpart to
`broadcast()` (small dims) and salting (skew): the three shuffle levers the
rest of the suite demonstrates.

The reference has no analog (its scans are single-partition passthroughs);
this is Spark-first scale discipline, kept as a library helper + plan-quality
test rather than an oracle query because bucketing is a storage layout, not
a query semantics, concern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 32,
    sort_by_key: bool = True,
) -> None:
    """Persist ``df`` as a managed table bucketed (and optionally sorted)
    by ``key``. Matching bucket counts on both join sides is what lets the
    join skip the shuffle; sorting within buckets additionally lets
    SortMergeJoin skip its per-task sort."""
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_by_key:
        w = w.sortBy(key)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str
) -> DataFrame:
    """Equi-join two same-bucket-count tables on their bucket key — reads
    co-located buckets, no Exchange on either side."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, on=key)
