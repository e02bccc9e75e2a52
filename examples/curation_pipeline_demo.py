"""Training-corpus curation demo — the LLM-pipeline surface end to end.

A miniature of the 100 TB flow on the bundled sample corpus:

1. quality gate      — Gopher-style rule bundle (d28) + heuristic score (d08)
2. exact dedup       — md5 groupBy, keep min doc_id (d01 discipline)
3. near-dup removal  — MinHash-LSH pairs → connected components → keep the
                       HIGHEST-QUALITY member of each cluster (d34)
4. decontamination   — eval-set 4-gram overlap flags (d13)
5. report            — dataset-card metrics (p03) before/after
6. output            — clustered parquet shards (write_clustered) so readers
                       prune files on the cluster key

Self-provisioning: uses the smallest bundled testdata
(/root/testdata/sf0.001); override with SPARK_GRAFT_SF_DIR.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import tempfile

from pyspark.sql import functions as F


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    from datafusion_table_providers_spark.llm.curation import d13_decontaminate
    from datafusion_table_providers_spark.llm.dedup import d34_dedup_keep_best
    from datafusion_table_providers_spark.llm.pipeline import p03_corpus_report
    from datafusion_table_providers_spark.llm.text import d28_gopher_rules
    from datafusion_table_providers_spark.operators.relational import _t
    from datafusion_table_providers_spark.session import get_spark
    from datafusion_table_providers_spark.write.output import write_clustered

    spark = get_spark("curation_demo")
    spark.sparkContext.setLogLevel("ERROR")

    docs = _t(spark, sf_dir, "documents")
    print(f"== corpus report (before), {sf_dir} ==")
    p03_corpus_report(spark, sf_dir).show(10, truncate=False)

    # 1. quality gate
    passing = (
        d28_gopher_rules(spark, sf_dir)
        .where(F.col("gopher_pass"))
        .select("doc_id")
    )
    gated = docs.join(passing, "doc_id", "left_semi")
    print(f"quality gate: {docs.count()} -> {gated.count()} docs")

    # 2. exact dedup (keep min doc_id per identical text)
    keep = gated.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    exact = gated.join(keep.select("doc_id"), "doc_id", "left_semi")
    print(f"exact dedup:  -> {exact.count()} docs")

    # 3. near-dup clusters: keep the highest-quality member of each —
    # drop every cluster member that is not the kept representative
    from datafusion_table_providers_spark.llm.dedup import (
        d12_dedup_components,
    )

    kept_best = d34_dedup_keep_best(spark, sf_dir)
    comp = d12_dedup_components(spark, sf_dir)
    losers = comp.join(
        kept_best.select(
            "component_id", F.col("kept_doc").alias("doc_id")
        ),
        ["component_id", "doc_id"],
        "left_anti",
    ).select("doc_id")
    deduped = exact.join(losers, "doc_id", "left_anti")
    print(f"near-dup:     -> {deduped.count()} docs (quality-aware keep)")

    # 4. decontamination flags (eval-overlap docs dropped)
    contaminated = d13_decontaminate(spark, sf_dir).select("doc_id")
    clean = deduped.join(contaminated, "doc_id", "left_anti")
    print(f"decontam:     -> {clean.count()} docs")

    # 5/6. write the curated corpus clustered by doc_id
    out = os.path.join(tempfile.mkdtemp(), "curated_corpus")
    write_clustered(clean, out, ["doc_id"], num_files=4)
    n_files = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    print(f"wrote {spark.read.parquet(out).count()} docs in {n_files} "
          f"clustered shards -> {out}")


if __name__ == "__main__":
    main()
