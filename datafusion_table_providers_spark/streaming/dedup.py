"""Streaming deduplication for continuous ingestion pipelines.

The batch dedup operators (llm/dedup.py) assume a bounded corpus; an
ingestion stream needs bounded state. Two Spark-native shapes:

- ``dedup_exact_stream``: ``dropDuplicates`` on a content hash inside an
  event-time watermark — state is bounded by the watermark horizon; docs
  re-appearing later than the horizon are accepted again (the standard
  at-scale tradeoff, tune the watermark to the dedup window you can afford).
- ``dedup_against_history``: stream-static join against a persisted
  fingerprint table (e.g. the batch pipeline's minhash signatures), dropping
  matches — bounded state (none — the static side is storage), exact against
  everything already ingested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_exact_stream(
    stream: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    hashed = stream.withColumn(
        "__text_hash", F.xxhash64(F.length(text_col), F.col(text_col))
    )
    return (
        hashed.withWatermark(ts_col, watermark)
        .dropDuplicates(["__text_hash"])
        .drop("__text_hash")
    )


def dedup_against_history(
    stream: DataFrame, history_hashes: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Drop stream rows whose content hash exists in a static history table
    (column ``text_hash``). Stream-static left_anti join — no streaming
    state; the history side is re-read per microbatch (broadcast when
    small, storage-partitioned when not)."""
    hashed = stream.withColumn(
        "text_hash", F.xxhash64(F.length(text_col), F.col(text_col))
    )
    return hashed.join(history_hashes, on="text_hash", how="left_anti").drop(
        "text_hash"
    )
