"""Plan-shape and invariant tests for e08 (sketch bounds) and d16
(int8 embedding quantization)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_table_providers_spark.llm.similarity import (
    d16_embedding_quantize,
)
from datafusion_table_providers_spark.operators.extensions import (
    e08_sketch_bounds,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_quantize_no_shuffle(spark):
    plan = _plan(d16_embedding_quantize(spark, SF))
    assert "Exchange" not in plan, (
        "quantization is a narrow per-row projection; a shuffle means the "
        "plan broke"
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, (
        "array lambdas must stay JVM-side"
    )


def test_quantize_codes_in_range_and_reversible(spark):
    rows = d16_embedding_quantize(spark, SF).collect()
    assert rows
    for r in rows[:50]:
        assert all(-127 <= c <= 127 for c in r.codes)
        assert r.n_sat >= 1, "the max-abs element must quantize to ±127"
        assert r.code_l1 >= abs(r.code_sum)
        assert r.maxabs > 0


def test_sketch_bounds_hold(spark):
    rows = e08_sketch_bounds(spark, SF).collect()
    assert rows
    for r in rows:
        assert r.hll_ok, f"HLL error above 10% for {r.event_type}"
        assert r.p50_ok, f"p50 rank error above 2% for {r.event_type}"


def test_sketch_broadcast_scalars(spark):
    plan = _plan(e08_sketch_bounds(spark, SF))
    assert "BroadcastHashJoin" in plan, (
        "per-group sketch scalars must broadcast back, never shuffle-join"
    )


def test_kmeans_partitions_all_vectors(spark):
    from datafusion_table_providers_spark.llm.similarity import (
        KM_K,
        d17_kmeans_clusters,
    )
    from datafusion_table_providers_spark.operators.relational import _t

    rows = d17_kmeans_clusters(spark, SF).collect()
    n_vecs = _t(spark, SF, "embeddings").count()
    assert len(rows) <= KM_K
    assert sum(r.n_members for r in rows) == n_vecs, (
        "every vector must land in exactly one cluster"
    )
    again = d17_kmeans_clusters(spark, SF).collect()
    assert sorted((r.cid, r.n_members, r.min_vec) for r in rows) == sorted(
        (r.cid, r.n_members, r.min_vec) for r in again
    ), "clustering must be run-to-run deterministic"
