"""Corpus-curation operators: decontamination, deterministic sampling,
sequence packing.

Beyond-reference additions (SURVEY §2 'north star'): the three curation
steps every large-scale training-data pipeline runs between dedup and
tokenization:

- d13 decontamination — flag training documents sharing word n-grams with a
  held-out evaluation set (the standard benchmark-overlap check). The eval
  n-gram set is small by construction, so the overlap join is a broadcast
  hash join against the exploded training n-grams: one scan + one narrow
  broadcast join + one groupBy on doc_id. At 100 TB the eval set stays
  driver-size (benchmarks are thousands of docs), so the broadcast shape
  holds at any corpus scale.
- d14 deterministic stratified sampling — per-stratum hash-threshold
  sampling (md5 of the document key against a hex threshold). Pure
  per-row predicate: no shuffle at all, reproducible across engines and
  runs, and re-runnable incrementally (the keep/drop decision depends only
  on the key, never on partitioning or ordering).
- d15 sequence packing — greedy sequential token-budget packing: documents
  are ordered deterministically within each source stream and assigned to
  bins by ``floor(exclusive_cumsum_tokens / budget)``. One window over the
  per-source stream (shuffle on ``source``), then one groupBy on
  (source, bin). A document whose tokens straddle a boundary stays in the
  bin where it started (greedy fill, not optimal bin packing — that is the
  industry-standard streaming compromise; optimal packing is NP-hard and
  order-unstable). At 100 TB, substitute (source, shard) for source to
  bound window-partition width.

All outputs are integers/strings — no float aggregate, so the driver's
bit-strict value hash cannot ULP-split (see e04 history).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_table_providers_spark.core.case import QueryCase
from datafusion_table_providers_spark.operators.relational import _t

# --- d13: decontamination vs a held-out eval split ------------------------
# Synthetic stand-in for a benchmark set: every 13th document is "eval".
DECON_MOD = 13
DECON_N = 4  # tokens per n-gram (4-grams: strict enough to be rare, loose
# enough that the synthetic corpus yields a non-trivial contaminated set)


def d13_decontaminate(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    idx = F.when(
        n >= DECON_N, F.sequence(F.lit(1), n - (DECON_N - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = d.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(DECON_N)]
                ),
            )
        ).alias("gram"),
    )
    is_eval = F.col("doc_id") % DECON_MOD == 0
    eval_grams = (
        grams.where(is_eval).select("gram").distinct()
    )
    train_grams = grams.where(~is_eval).distinct()
    # eval n-gram set is benchmark-sized → broadcast; contaminated grams
    # counted per training doc map-side after the hash join
    hits = train_grams.join(
        F.broadcast(eval_grams.withColumn("hit", F.lit(1))), "gram", "left"
    )
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.count("hit").alias("n_contaminated"),
        )
        .where(F.col("n_contaminated") > 0)
        .select(
            "doc_id",
            "n_grams",
            "n_contaminated",
            (F.col("n_contaminated") * 100 >= F.col("n_grams")).alias(
                "flag_contaminated"
            ),
        )
    )


D13_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
grams AS (
  SELECT doc_id,
         t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3] AS gram
  FROM toks, UNNEST(range(1, len(t) - {DECON_N - 2})) AS r(i)
  WHERE len(t) >= {DECON_N}
),
eval_grams AS (SELECT DISTINCT gram FROM grams WHERE doc_id % {DECON_MOD} = 0),
train_grams AS (SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id % {DECON_MOD} <> 0)
SELECT doc_id,
       COUNT(*) AS n_grams,
       COUNT(e.gram) AS n_contaminated,
       COUNT(e.gram) * 100 >= COUNT(*) AS flag_contaminated
FROM train_grams t LEFT JOIN eval_grams e USING (gram)
GROUP BY doc_id
HAVING COUNT(e.gram) > 0
"""


# --- d14: deterministic stratified sampling -------------------------------
# Per-language hex thresholds on md5(doc_id): en keeps ~50%, others ~25%.
SAMPLE_RATES = {"en": "8000", "de": "4000", "es": "4000", "fr": "4000"}
SAMPLE_DEFAULT = "2000"  # ~12.5% for any other stratum


def d14_stratified_sample(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    thr = None
    for lang, hexthr in sorted(SAMPLE_RATES.items()):
        cond = F.col("lang") == lang
        thr = (
            F.when(cond, hexthr) if thr is None else thr.when(cond, hexthr)
        )
    thr = thr.otherwise(SAMPLE_DEFAULT)
    return (
        d.select(
            "doc_id",
            "lang",
            "source",
            bucket.alias("bucket"),
            thr.alias("threshold"),
        )
        .where(F.col("bucket") < F.col("threshold"))
    )


def _d14_sql() -> str:
    cases = " ".join(
        f"WHEN lang = '{lang}' THEN '{thr}'"
        for lang, thr in sorted(SAMPLE_RATES.items())
    )
    return f"""
SELECT doc_id, lang, source, bucket, threshold FROM (
  SELECT doc_id, lang, source,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS bucket,
         CASE {cases} ELSE '{SAMPLE_DEFAULT}' END AS threshold
  FROM documents
) WHERE bucket < threshold
"""


# --- d15: sequence packing (token-budget bins) ----------------------------
PACK_BUDGET = 256  # tokens per packed sequence


def d15_sequence_packing(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toksz = d.select(
        "doc_id", "source", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = toksz.select(
        "source",
        "doc_id",
        "n_tokens",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) / PACK_BUDGET
        ).alias("bin_id"),
    )
    return binned.groupBy("source", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("tokens_packed"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


D15_SQL = f"""
WITH toksz AS (
  SELECT doc_id, source,
         CAST(LEN(string_split(text, ' ')) AS INTEGER) AS n_tokens
  FROM documents
),
binned AS (
  SELECT source, doc_id, n_tokens,
         CAST(FLOOR(COALESCE(SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) / {PACK_BUDGET}.0) AS BIGINT) AS bin_id
  FROM toksz
)
SELECT source, bin_id, COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS tokens_packed,
       MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
FROM binned GROUP BY source, bin_id
"""


SUITE = {
    "d13_decontaminate": QueryCase(
        d13_decontaminate, D13_SQL, "eval-set n-gram decontamination"
    ),
    "d14_stratified_sample": QueryCase(
        d14_stratified_sample, _d14_sql(), "deterministic stratified sampling"
    ),
    "d15_sequence_packing": QueryCase(
        d15_sequence_packing, D15_SQL, "token-budget sequence packing"
    ),
}
