"""Structured Streaming tests: stream results must match the batch oracle
(windowed counts), and the custom stateful sessionizer must produce sane
sessions. Uses availableNow triggers so tests are bounded."""

import pytest
from pyspark.sql import functions as F

from datafusion_table_providers_spark.streaming.events import (
    event_stream,
    run_available_now,
    sessionize_stateful,
    windowed_counts,
)

SF = "/root/testdata/sf0.001"


def test_windowed_counts_match_batch(spark):
    stream = event_stream(spark, SF)
    assert stream.isStreaming
    result = run_available_now(
        windowed_counts(stream), "win_counts", output_mode="complete"
    )
    got = {
        (r["win_start"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in result.collect()
    }
    # batch oracle over the same file
    from datafusion_table_providers_spark.operators.relational import _t

    batch = (
        _t(spark, SF, "events")
        .groupBy(F.window("ts", "6 hours").start.alias("win_start"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
    )
    want = {
        (r["win_start"], r["event_type"]): (r["n"], round(r["sum_value"], 6))
        for r in batch.collect()
    }
    # memory-sink timestamps come back tz-naive in session UTC — compare sets
    assert len(got) == len(want)
    assert sorted(v for v in got.values()) == sorted(v for v in want.values())


def test_stateful_sessionizer_runs(spark):
    stream = event_stream(spark, SF)
    sessions = run_available_now(
        sessionize_stateful(stream), "sessions_out", output_mode="append"
    )
    rows = sessions.collect()
    # closed sessions only (open ones stay in state) — all must be valid
    for r in rows:
        assert r["session_end"] >= r["session_start"]
        assert r["n_events"] >= 1


def test_stream_to_backend_sink_idempotent(spark, tmp_path):
    """Stream → DuckDB connector sink: row parity with batch, and a restart
    from the same checkpoint must not duplicate rows (commit-log dedup)."""
    from datafusion_table_providers_spark.sources.backends import DuckDBBackend
    from datafusion_table_providers_spark.streaming.events import (
        event_stream,
        stream_to_backend,
    )

    be = DuckDBBackend(str(tmp_path / "sink.duckdb"))
    ckpt = str(tmp_path / "ckpt")

    q = stream_to_backend(event_stream(spark, SF), be, "events_sink", ckpt)
    q.awaitTermination(120)

    from datafusion_table_providers_spark.operators.relational import _t

    want = _t(spark, SF, "events").count()
    got = be.query_arrow('SELECT COUNT(*) AS n FROM "events_sink"')[0][0].as_py()
    assert got == want and want > 0

    # restart with the same checkpoint: no new data → no growth, no dup
    q2 = stream_to_backend(event_stream(spark, SF), be, "events_sink", ckpt)
    q2.awaitTermination(120)
    got2 = be.query_arrow('SELECT COUNT(*) AS n FROM "events_sink"')[0][0].as_py()
    assert got2 == want
