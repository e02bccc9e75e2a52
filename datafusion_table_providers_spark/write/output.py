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
from pyspark.sql import functions as F


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


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: Sequence[str],
    num_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet CLUSTERED on ``cluster_by``: range-repartition so each
    output file owns a disjoint key range, then sort within partitions so
    row-group min/max stats are tight.

    This is the layout move that makes a 100 TB corpus cheap to query: a
    reader filtering on the cluster key prunes whole files from the parquet
    footers alone (file skipping), and row-group stats prune within the
    files that remain. Without it, every file spans the full key range and
    a selective filter still scans everything. Same idea as Delta/Iceberg
    OPTIMIZE ZORDER for the single-key case, in plain Spark + parquet."""
    cols = [df[c] for c in cluster_by]
    (
        df.repartitionByRange(num_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode(mode)
        .parquet(path)
    )


def zorder_key(cols: Sequence[str], bits: int = 16):
    """Z-order (Morton) key over 2+ numeric columns as a pure Column
    expression: each column is rank-normalized to ``bits`` bits by the
    caller (or passed raw when already small ints), then bits interleave.

    Interleaving keeps locality in EVERY dimension, so range-partitioning
    on the key gives each output file a bounded range in each column —
    footer min/max stats prune on any filtered dimension, not just the
    first sort key. This is the multi-column layout move (Delta/Iceberg
    OPTIMIZE ZORDER) in plain Spark expressions."""
    n = len(cols)
    if n * bits > 63:
        # bit n*bits-1 must stay below the sign bit of the 64-bit key;
        # beyond 63 Spark's shiftleft also wraps the shift amount mod 64,
        # silently colliding bits — refuse instead of degrading layout
        raise ValueError(
            f"zorder_key: {n} cols x {bits} bits = {n * bits} key bits > 63; "
            "lower bits= so n*bits <= 63"
        )
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(F.col(c).cast("long"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit.cast("long"), b * n + i)
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    cluster_by: Sequence[str],
    num_files: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Write parquet z-ordered on 2+ numeric columns: range-partition +
    sort on the Morton key so every file is a compact hyper-rectangle and
    selective filters on ANY of the cluster columns skip files."""
    tmp = "__zkey"
    out = df.withColumn(tmp, zorder_key(cluster_by, bits))
    (
        out.repartitionByRange(num_files, F.col(tmp))
        .sortWithinPartitions(tmp)
        .drop(tmp)
        .write.mode(mode)
        .parquet(path)
    )



def compact_dataset(
    spark,
    path: str,
    target_file_bytes: int = 128 << 20,
    cluster_by: Sequence[str] = (),
) -> tuple:
    """Rewrite a parquet dataset into size-targeted files (small-file
    compaction — the Delta/Iceberg OPTIMIZE analog in plain Spark).

    Streaming sinks and fine-grained incremental appends accumulate
    thousands of KB-sized files; at 100 TB the resulting footer/open
    overhead dominates scan time long before the data does. This rewrites
    the dataset into ``ceil(total_bytes / target_file_bytes)`` files —
    via a shuffle-free ``coalesce`` when only merging, or a
    range-repartition + sort when ``cluster_by`` is given (compaction and
    clustering in one pass, so the rewrite also buys footer pruning).

    The swap is staged: new files land in a sibling directory while the
    dataset stays readable, then two directory renames publish them.
    Local-FS renames are atomic; on an object store, point readers at a
    catalog/manifest instead of relying on directory rename.

    Returns ``(files_before, files_after)``.
    """
    import glob
    import math
    import os
    import shutil

    base = path.rstrip("/")
    staging, trash = base + "__compacting", base + "__compacted_old"
    # Crashed-run recovery — ORDER MATTERS. A crash between the two publish
    # renames below leaves the dataset only in `trash`; restore it before
    # any cleanup, and never delete a sibling dir unless `base` exists
    # (deleting trash while base is missing would destroy the only copy).
    if not os.path.exists(base) and os.path.exists(trash):
        os.rename(trash, base)
    if not os.path.exists(base):
        raise FileNotFoundError(f"compact_dataset: no dataset at {base}")
    for leftover in (staging, trash):
        if os.path.exists(leftover):
            shutil.rmtree(leftover)

    # Hive-partitioned layouts (key=value dirs) would be silently FLATTENED
    # by this rewrite — Spark infers the partition columns on read, and the
    # plain write below folds them back into the files, changing the layout
    # downstream readers prune on. Refuse rather than degrade; compact each
    # partition directory individually instead.
    for entry in os.listdir(base):
        if "=" in entry and os.path.isdir(os.path.join(base, entry)):
            raise ValueError(
                f"compact_dataset: {base} is hive-partitioned ({entry}/); "
                "compact each partition directory separately"
            )
    before = glob.glob(os.path.join(base, "**", "*.parquet"), recursive=True)
    total = sum(os.path.getsize(f) for f in before)
    n_out = max(1, math.ceil(total / target_file_bytes))

    df = spark.read.parquet(base)
    if cluster_by:
        out = df.repartitionByRange(
            n_out, *[df[c] for c in cluster_by]
        ).sortWithinPartitions(*cluster_by)
    elif n_out < len(before):
        # One input file ≈ one scan partition for the small files this
        # rewrites; the file count (already in hand) decides coalesce vs
        # repartition without touching df.rdd, which forces a legacy-plan
        # conversion and breaks under Spark Connect.
        out = df.coalesce(n_out)  # narrow merge, no shuffle
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(staging)

    os.rename(base, trash)
    os.rename(staging, base)
    shutil.rmtree(trash)
    after = glob.glob(os.path.join(base, "**", "*.parquet"), recursive=True)
    return len(before), len(after)
