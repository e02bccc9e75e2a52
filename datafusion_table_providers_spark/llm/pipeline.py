"""Composed training-data-prep pipeline — the operators working together.

A realistic corpus-preparation flow chained from the primitives this package
provides, as ONE oracle-checked query:

1. **quality gate** — drop documents under 5 whitespace tokens;
2. **exact dedup** — keep the minimum doc_id per md5(text) (d01 discipline);
3. **near-dup removal** — drop every non-canonical member of a MinHash-LSH
   duplicate component (d02b candidates → d12 connected components; the
   canonical representative is the component's min doc_id);
4. **report** — surviving docs and token mass per language.

Scale shape: each stage is one shuffle (hash-group / semi-join / anti-join);
nothing is quadratic and nothing touches the driver. The DuckDB oracle
replays the identical pipeline with the d12 recursive-CTE closure inlined.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_table_providers_spark.core.case import QueryCase
from datafusion_table_providers_spark.llm.dedup import (
    _d12_sql,
    d12_dedup_components,
)
from datafusion_table_providers_spark.operators.relational import _t

MIN_TOKENS = 5


def p01_training_data_prep(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    base = d.select(
        "doc_id", "lang", "text", F.size(F.split("text", " ")).alias("n_tokens")
    )
    filtered = base.filter(F.col("n_tokens") >= MIN_TOKENS)
    keep_exact = filtered.groupBy(F.md5("text").alias("h")).agg(
        F.min("doc_id").alias("doc_id")
    )
    kept = filtered.join(
        keep_exact.select("doc_id"), "doc_id", "left_semi"
    )
    comp = d12_dedup_components(spark, sf_dir)
    dropme = comp.filter(F.col("component_id") != F.col("doc_id")).select("doc_id")
    final = kept.join(dropme, "doc_id", "left_anti")
    return final.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def _p01_sql() -> str:
    return f"""
WITH base AS (
  SELECT doc_id, lang, text,
         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
  FROM documents
),
filtered AS (SELECT * FROM base WHERE n_tokens >= {MIN_TOKENS}),
keep_exact AS (
  SELECT MIN(doc_id) AS doc_id FROM filtered GROUP BY md5(text)
),
kept AS (
  SELECT f.* FROM filtered f
  WHERE f.doc_id IN (SELECT doc_id FROM keep_exact)
),
comp AS (SELECT * FROM ({_d12_sql()})),
dropme AS (SELECT doc_id FROM comp WHERE component_id <> doc_id),
final AS (
  SELECT * FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM dropme)
)
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM final GROUP BY lang
"""


SUITE = {
    "p01_training_data_prep": QueryCase(
        p01_training_data_prep,
        _p01_sql(),
        "composed corpus-prep pipeline (quality → dedup → near-dedup)",
    ),
}
