"""In-session A/B: d35 with vs without the shared shingle checkpoint.

Alternates variants run-by-run in ONE session so machine drift hits both.
Usage: python tools/ab_d35.py <sf_dir> [runs_per_variant]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from datafusion_table_providers_spark.core.memo import clear_memo_caches  # noqa: E402
from datafusion_table_providers_spark.llm import dedup  # noqa: E402
from datafusion_table_providers_spark.session import get_spark  # noqa: E402


def d03b_legacy(spark, sf_dir):
    """Pre-r22 d03b: per-doc band self-join + distinct."""
    sig = dedup.d03_simhash(spark, sf_dir).localCheckpoint(eager=True)
    banded = sig.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        (F.shiftright(F.col("simhash"), 8 * i) % 256).alias("byte"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select(
        "doc_id", "simhash", F.col("bb.band").alias("band"), F.col("bb.byte").alias("byte")
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


def d35_noshare(spark, sf_dir):
    mh = dedup.d02b_minhash_lsh_pairs(spark, sf_dir).select(
        "da", "db", F.lit("minhash").alias("method")
    )
    sh = d03b_legacy(spark, sf_dir).select(
        "da", "db", F.lit("simhash").alias("method")
    )
    ng = dedup.d04_ngram_jaccard(spark, sf_dir).select(
        "da", "db", F.lit("ngram").alias("method")
    )
    u = mh.unionByName(sh).unionByName(ng)
    agg = u.groupBy("da", "db").agg(
        F.countDistinct("method").alias("n_methods"),
        F.array_join(F.array_sort(F.collect_set("method")), ",").alias("methods"),
    )
    return agg.filter(F.col("n_methods") >= 2)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.sf1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark("ab_d35")
    spark.sparkContext.setLogLevel("ERROR")
    variants = [("share", dedup.d35_ensemble_neardup), ("noshare", d35_noshare)]
    times = {name: [] for name, _ in variants}
    for i in range(runs):
        for name, fn in variants:
            clear_memo_caches()
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            el = time.time() - t0
            times[name].append(el)
            print(f"run {i} {name}: {el:.2f}s ({n} rows)", flush=True)
    for name, ts in times.items():
        print(f"{name}: best {min(ts):.2f} all {['%.2f' % t for t in ts]}")


if __name__ == "__main__":
    main()
