"""Round-22 rewrite pins: the d22 distinct-prefix group DP must reproduce
the naive per-doc-pair blocked join exactly, and the d02b adaptive
semi-join's new absolute broadcast cap must leave results identical on
every branch."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from datafusion_table_providers_spark.llm import dedup
from datafusion_table_providers_spark.llm.dedup import (
    D22_BLOCK_CAP,
    D22_TAU,
    d22_editdist_neardup,
)

SF = "/root/testdata/sf0.001"


def _naive_d22(spark, sf_dir):
    """The pre-r22 formulation: blocked self-join, one DP per doc pair."""
    p = dedup._d22_prefixed(spark, sf_dir)
    bad = (
        p.groupBy("bk")
        .agg(F.count("*").alias("bn"))
        .filter(F.col("bn") > D22_BLOCK_CAP)
        .select("bk")
    )
    p = p.join(F.broadcast(bad), "bk", "left_anti")
    a = p.select("bk", F.col("doc_id").alias("da"), F.col("pfx").alias("pa"))
    b = p.select("bk", F.col("doc_id").alias("db"), F.col("pfx").alias("pb"))
    return (
        a.join(b, "bk")
        .filter(F.col("da") < F.col("db"))
        .select("da", "db", F.levenshtein("pa", "pb", D22_TAU).alias("dist"))
        .filter(F.col("dist") >= 0)
    )


def _pairs(df):
    return sorted((r.da, r.db, r.dist) for r in df.collect())


def test_d22_group_dp_matches_naive(spark):
    got = _pairs(d22_editdist_neardup(spark, SF))
    want = _pairs(_naive_d22(spark, SF))
    assert got == want and len(got) > 0


def test_d22_group_dp_matches_naive_on_replicated_corpus(spark, tmp_path):
    """10x-replicated corpus (the sf1 synth construction): every prefix
    group has >= 10 members, exercising intra-group pairs (dist 0, ordered
    once) and the cross-group fan-out in the same blocks."""
    src = spark.read.parquet(f"{SF}/documents.parquet")
    out = str(tmp_path / "documents.parquet")
    reps = src.crossJoin(spark.range(3).withColumnRenamed("id", "k"))
    reps.select(
        (F.col("doc_id") + F.col("k") * 10_000_000).alias("doc_id"),
        *[c for c in src.columns if c != "doc_id"],
    ).write.parquet(out)
    sf_dir = str(tmp_path)
    got = _pairs(d22_editdist_neardup(spark, sf_dir))
    want = _pairs(_naive_d22(spark, sf_dir))
    assert got == want
    # replication makes every original pair a group-pair fan-out and adds
    # the intra-group zero-distance pairs — both shapes must be present
    assert any(d == 0 for (_, _, d) in got)
    assert any(d > 0 for (_, _, d) in got)


def _legacy_d03b(spark, sf_dir):
    """Pre-r22 d03b: per-doc band self-join + distinct (reference
    semantics for the group/expand rewrite)."""
    sig = dedup.d03_simhash(spark, sf_dir).localCheckpoint(eager=True)
    banded = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        (F.shiftright(F.col("simhash"), 8 * i) % 256).alias(
                            "byte"
                        ),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select(
        "doc_id",
        "simhash",
        F.col("bb.band").alias("band"),
        F.col("bb.byte").alias("byte"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    pairs = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.byte") == F.col("b.byte"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("da"),
        F.col("b.doc_id").alias("db"),
        F.col("a.simhash").alias("ha"),
        F.col("b.simhash").alias("hb"),
    )
    return (
        pairs.distinct()
        .select(
            "da",
            "db",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= dedup.HAMMING_MAX)
    )


def test_d03b_group_expand_matches_naive(spark):
    got = sorted(
        (r.da, r.db, r.hamming)
        for r in dedup.d03b_simhash_pairs(spark, SF).collect()
    )
    want = sorted(
        (r.da, r.db, r.hamming) for r in _legacy_d03b(spark, SF).collect()
    )
    assert got == want and len(got) > 0
    # intra-group (identical simhash) pairs must be present at hamming 0
    assert any(h == 0 for (_, _, h) in got)


def test_d35_mask_agg_matches_countdistinct(spark):
    """The bit-mask ensemble aggregate must reproduce the old
    countDistinct/collect_set aggregate row-for-row."""
    mh = dedup.d02b_minhash_lsh_pairs(spark, SF).select(
        "da", "db", F.lit("minhash").alias("method")
    )
    sh = dedup.d03b_simhash_pairs(spark, SF).select(
        "da", "db", F.lit("simhash").alias("method")
    )
    ng = dedup.d04_ngram_jaccard(spark, SF).select(
        "da", "db", F.lit("ngram").alias("method")
    )
    u = mh.unionByName(sh).unionByName(ng)
    legacy = (
        u.groupBy("da", "db")
        .agg(
            F.countDistinct("method").alias("n_methods"),
            F.array_join(F.array_sort(F.collect_set("method")), ",").alias(
                "methods"
            ),
        )
        .filter(F.col("n_methods") >= 2)
    )
    want = sorted(map(tuple, legacy.collect()))
    got = sorted(map(tuple, dedup.d35_ensemble_neardup(spark, SF).collect()))
    assert got == want and len(got) > 0


def test_d35_members_emit_unique_pairs(spark):
    """sum(tag) is only a faithful method set if every member emits a pair
    at most once — pin that invariant directly."""
    for fn in (
        dedup.d02b_minhash_lsh_pairs,
        dedup.d03b_simhash_pairs,
        dedup.d04_ngram_jaccard,
    ):
        df = fn(spark, SF)
        n = df.count()
        assert df.select("da", "db").distinct().count() == n


@pytest.mark.parametrize("cap", [0, 10**9])
def test_d02b_broadcast_cap_branches_agree(spark, cap, monkeypatch):
    """cap=0 forces the shuffle semi-join branch, cap=1e9 the broadcast
    branch; both must produce identical pair sets (the reduction is
    result-transparent by construction)."""
    monkeypatch.setattr(dedup, "SEMIJOIN_MAX_BROADCAST_ROWS", cap)
    from datafusion_table_providers_spark.core.memo import clear_memo_caches

    clear_memo_caches()
    rows = sorted(
        (r.da, r.db, r.jaccard)
        for r in dedup.d02b_minhash_lsh_pairs(spark, SF).collect()
    )
    clear_memo_caches()
    monkeypatch.setattr(dedup, "SEMIJOIN_MAX_BROADCAST_ROWS", 10**9 - cap)
    rows2 = sorted(
        (r.da, r.db, r.jaccard)
        for r in dedup.d02b_minhash_lsh_pairs(spark, SF).collect()
    )
    assert rows == rows2 and len(rows) > 0
