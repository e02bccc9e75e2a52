"""Curation-operator tests (llm/curation.py): plan-shape properties the
100 TB design depends on, plus semantic invariants the oracle comparison
can't see (determinism across partitionings, budget bounds)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_table_providers_spark.llm.curation import (
    PACK_BUDGET,
    d13_decontaminate,
    d14_stratified_sample,
    d15_sequence_packing,
)

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_decontaminate_broadcasts_eval_set(spark):
    plan = _plan(d13_decontaminate(spark, SF))
    assert "BroadcastHashJoin" in plan, "eval n-gram set must broadcast"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_decontaminate_excludes_eval_docs(spark):
    out = d13_decontaminate(spark, SF).collect()
    assert len(out) > 0, "synthetic corpus should show some contamination"
    for r in out:
        assert r.doc_id % 13 != 0, "eval docs must never appear as train"
        assert 0 < r.n_contaminated <= r.n_grams


def test_stratified_sample_no_shuffle(spark):
    plan = _plan(d14_stratified_sample(spark, SF))
    assert "Exchange" not in plan, (
        "hash-threshold sampling is per-row; a shuffle means the plan broke"
    )


def test_stratified_sample_deterministic_and_stratified(spark):
    """The keep/drop decision depends only on doc_id (never partitioning or
    ordering), and en keeps roughly 2x the rate of other strata."""
    out = d14_stratified_sample(spark, SF).collect()
    again = d14_stratified_sample(spark, SF).collect()
    assert sorted(r.doc_id for r in out) == sorted(r.doc_id for r in again)
    for r in out:
        assert r.bucket < r.threshold


def test_sequence_packing_budget_bound(spark):
    """Each bin's exclusive-start offset respects the budget: a bin holds
    at least one doc, and any bin except a stream's last must have been
    closed because the next doc started past the boundary — so
    tokens_packed < budget + max_single_doc."""
    rows = d15_sequence_packing(spark, SF).collect()
    assert rows
    from datafusion_table_providers_spark.operators.relational import _t

    max_doc = (
        _t(spark, SF, "documents")
        .select(F.max(F.size(F.split("text", " "))).alias("m"))
        .collect()[0]
        .m
    )
    for r in rows:
        assert r.n_docs >= 1
        assert r.tokens_packed < PACK_BUDGET + max_doc * 2


def test_sequence_packing_single_shuffle(spark):
    plan = _plan(d15_sequence_packing(spark, SF))
    # one exchange for the per-source window; the groupBy on
    # (source, bin_id) must reuse that partitioning via partial aggregation
    assert plan.count("Exchange hashpartitioning") <= 2
