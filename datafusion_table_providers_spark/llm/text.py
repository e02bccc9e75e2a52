"""Text-analysis operators for LLM training-data pipelines.

Beyond-reference additions (SURVEY §2 'north star'): language ID, quality
scoring, token counting, document fingerprinting. All operators are pure
DataFrame expressions (JVM-side, whole-stage codegen — no Python in the hot
path), so they scale linearly with executors over a 100 TB corpus: every
query below is a single scan + narrow per-row work (+ one shuffle when a
group-by is involved).

Determinism contract: each Spark builder has a DuckDB oracle computing the
same formulas; float outputs use the shared IEEE floor-rounding so both
engines agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from datafusion_table_providers_spark.core.case import QueryCase
from datafusion_table_providers_spark.operators.relational import _r, _rsql, _t

# Per-language stopword profiles for the n-gram/stopword-hit heuristic.
# (Synthetic corpus shares one vocabulary, so predictions skew 'en' — the
# operator contract is determinism + the scoring pattern, not accuracy.)
LANG_PROFILES = {
    "de": ("der", "die", "und", "das"),
    "en": ("the", "a", "of", "and"),
    "es": ("el", "los", "y", "una"),
    "fr": ("le", "la", "et", "les"),
    "zh": ("wo", "ni", "ta", "de"),
}


def _count_occurrences_spark(padded, word: str):
    pat = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(pat), F.lit(""))))
        / len(pat)
    ).cast("int")


def _count_occurrences_sql(padded: str, word: str) -> str:
    pat = f" {word} "
    return (
        f"CAST((LENGTH({padded}) - LENGTH(REPLACE({padded}, '{pat}', ''))) "
        f"/ {len(pat)} AS INTEGER)"
    )


# --- d07: language identification ----------------------------------------
def d07_langid(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    scored = d.select(
        "doc_id",
        "lang",
        *[
            sum(
                _count_occurrences_spark(padded, w) for w in words
            ).alias(f"score_{lang}")
            for lang, words in sorted(LANG_PROFILES.items())
        ],
    )
    # winner = first language (alphabetically) whose score >= all others
    langs = sorted(LANG_PROFILES)
    pred = None
    for lang in langs:
        cond = None
        for other in langs:
            if other == lang:
                continue
            c = F.col(f"score_{lang}") >= F.col(f"score_{other}")
            cond = c if cond is None else (cond & c)
        pred = (
            F.when(cond, lang) if pred is None else pred.when(cond, lang)
        )
    return scored.select(
        "doc_id",
        "lang",
        pred.otherwise("und").alias("pred_lang"),
        F.col("score_en").alias("score_en"),
    )


def _d07_sql() -> str:
    padded = "(' ' || text || ' ')"
    langs = sorted(LANG_PROFILES)
    score_cols = ", ".join(
        "("
        + " + ".join(
            _count_occurrences_sql(padded, w) for w in LANG_PROFILES[lang]
        )
        + f") AS score_{lang}"
        for lang in langs
    )
    cases = []
    for lang in langs:
        conds = " AND ".join(
            f"score_{lang} >= score_{other}" for other in langs if other != lang
        )
        cases.append(f"WHEN {conds} THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + " ELSE 'und' END"
    return f"""
SELECT doc_id, lang, {case_sql} AS pred_lang, score_en
FROM (SELECT doc_id, lang, {score_cols} FROM documents)
"""


# --- d08: quality scoring -------------------------------------------------
def d08_quality(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    padded = F.concat(F.lit(" "), F.col("text"), F.lit(" "))
    stop_hits = sum(
        _count_occurrences_spark(padded, w) for w in LANG_PROFILES["en"]
    )
    base = d.select(
        "doc_id",
        F.length("text").alias("n_chars_calc"),
        F.size(toks).alias("n_tokens"),
        stop_hits.alias("stop_hits"),
        F.length(F.regexp_replace("text", "[a-z ]", "")).alias("n_nonalpha"),
    )
    return base.select(
        "doc_id",
        "n_chars_calc",
        "n_tokens",
        _r(F.col("stop_hits") / F.col("n_tokens"), 6).alias("stop_ratio"),
        _r(
            (F.col("n_chars_calc") - F.col("n_tokens") + 1)
            / F.col("n_tokens"),
            6,
        ).alias("avg_tok_len"),
        _r(
            F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)) * 0.5
            + (1.0 - F.col("stop_hits") / F.col("n_tokens")) * 0.3
            + F.least(
                (F.col("n_chars_calc") - F.col("n_tokens") + 1)
                / F.col("n_tokens")
                / 8.0,
                F.lit(1.0),
            )
            * 0.2,
            6,
        ).alias("quality"),
    )


def _d08_sql() -> str:
    padded = "(' ' || text || ' ')"
    stop = " + ".join(
        _count_occurrences_sql(padded, w) for w in LANG_PROFILES["en"]
    )
    return f"""
WITH base AS (
  SELECT doc_id,
         CAST(LENGTH(text) AS INTEGER) AS n_chars_calc,
         CAST(LEN(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         ({stop}) AS stop_hits,
         CAST(LENGTH(REGEXP_REPLACE(text, '[a-z ]', '', 'g')) AS INTEGER) AS n_nonalpha
  FROM documents
)
SELECT doc_id, n_chars_calc, n_tokens,
       {_rsql('CAST(stop_hits AS DOUBLE) / n_tokens', 6)} AS stop_ratio,
       {_rsql('CAST(n_chars_calc - n_tokens + 1 AS DOUBLE) / n_tokens', 6)} AS avg_tok_len,
       {_rsql('LEAST(n_tokens / 100.0, 1.0) * 0.5'
              ' + (1.0 - CAST(stop_hits AS DOUBLE) / n_tokens) * 0.3'
              ' + LEAST(CAST(n_chars_calc - n_tokens + 1 AS DOUBLE) / n_tokens / 8.0, 1.0) * 0.2',
              6)} AS quality
FROM base
"""


# --- d09: token counting (whitespace + BPE-ish regex) ---------------------
def d09_token_count(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(F.split("text", " ")).alias("ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+"), 0)).alias(
            "word_tokens"
        ),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]{1,4}"), 0)).alias(
            "bpe_ish_tokens"
        ),
        (F.length("text") - F.length(F.replace("text", F.lit(" "), F.lit(""))))
        .cast("int")
        .alias("n_spaces"),
    )


D09_SQL = """
SELECT doc_id,
       CAST(LEN(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
       CAST(LEN(regexp_extract_all(text, '[a-z]+')) AS INTEGER) AS word_tokens,
       CAST(LEN(regexp_extract_all(text, '[a-z]{1,4}')) AS INTEGER) AS bpe_ish_tokens,
       CAST(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) AS INTEGER) AS n_spaces
FROM documents
"""


# --- d10: document fingerprinting (winnowing over k-gram rolling hashes) --
WINNOW_K = 4  # tokens per k-gram
WINNOW_W = 5  # window of consecutive k-gram hashes


def d10_fingerprint(spark, sf_dir):
    # k-grams via posexplode + lead() (same rewrite as dedup._shingles_df:
    # the transform/element_at higher-order form evaluates interpreted and
    # re-derives split(text) per element). Token position IS the k-gram
    # position — the trailing w-1 tokens with no full k-gram are filtered,
    # leaving pos = 0..n-k contiguous, identical to the old explode index —
    # and the winnowing min-window below reuses the same (doc_id, pos) sort.
    d = _t(spark, sf_dir, "documents")
    e = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    lw = Window.partitionBy("doc_id").orderBy("pos")
    succ = [F.lead("w", j).over(lw) for j in range(1, WINNOW_K)]
    kgrams = (
        e.select(
            "doc_id",
            "pos",
            F.concat_ws(" ", F.col("w"), *succ).alias("kgram"),
            succ[-1].alias("_last"),
        )
        .filter(F.col("_last").isNotNull())
        .select("doc_id", "pos", F.substring(F.md5("kgram"), 1, 8).alias("h"))
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(0, WINNOW_W - 1)
    )
    fps = kgrams.select(
        "doc_id", F.min("h").over(w).alias("fp")
    )
    return fps.groupBy("doc_id").agg(
        F.countDistinct("fp").alias("n_fingerprints"),
        F.min("fp").alias("min_fp"),
    )


D10_SQL = f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
kg AS (
  SELECT doc_id, i AS pos,
         substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]), 1, 8) AS h
  FROM toks, UNNEST(range(1, len(t) - {WINNOW_K - 2})) AS r(i)
  WHERE len(t) >= {WINNOW_K}
),
fps AS (
  SELECT doc_id,
         MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING) AS fp
  FROM kg
)
SELECT doc_id, COUNT(DISTINCT fp) AS n_fingerprints, MIN(fp) AS min_fp
FROM fps GROUP BY doc_id
"""


# --- d19: repetition / n-gram-diversity quality signals -------------------
# The Gopher-style "repetitious text" filters: fraction of tokens taken by
# the most frequent token, type-token ratio, and duplicate 2-/3-gram
# fractions. Repetitive machine-generated or boilerplate text scores high
# on dup fractions and low on TTR — these are standard pre-training
# corpus-quality gates alongside d08's surface stats.
#
# Plan shape: ONE explode emits (doc_id, k, gram) for k=1,2,3 together, so
# the whole operator is a single shuffle on (doc_id, k, gram) for the
# count, a window aligned on the same keys for the argmax token, and a
# final per-doc conditional-aggregation pivot (second shuffle, narrow key).
# At 100 TB: linear in corpus token count, no joins, no skew risk beyond
# pathological single-doc size (bounded by upstream length filters).
#
# Determinism: all counts are exact integers; ratios divide two exact
# int64s (< 2^53 → identical doubles on both engines) and round via _r;
# the top token breaks count ties lexicographically.


def d19_repetition(spark, sf_dir):
    # 1/2/3-grams from ONE posexplode + lead() pass (see d10/_shingles_df
    # for why the transform/element_at form is avoided): every token emits
    # its unigram plus — when enough successors exist — its bigram and
    # trigram, reproducing the old sequence(1, n-k+1) bounds exactly.
    d = _t(spark, sf_dir, "documents")
    e = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w")
    )
    lw = Window.partitionBy("doc_id").orderBy("pos")
    # window expressions may not appear under a Generate — project the
    # successors first, then explode the per-token gram candidates
    base = e.select(
        "doc_id",
        "w",
        F.lead("w", 1).over(lw).alias("w1"),
        F.lead("w", 2).over(lw).alias("w2"),
    )
    ex = (
        base.select(
            "doc_id",
            F.explode(
                F.array(
                    F.struct(
                        F.lit(1).alias("k"),
                        F.col("w").alias("g"),
                        F.lit(True).alias("ok"),
                    ),
                    F.struct(
                        F.lit(2).alias("k"),
                        F.concat_ws(" ", F.col("w"), F.col("w1")).alias("g"),
                        F.col("w1").isNotNull().alias("ok"),
                    ),
                    F.struct(
                        F.lit(3).alias("k"),
                        F.concat_ws(
                            " ", F.col("w"), F.col("w1"), F.col("w2")
                        ).alias("g"),
                        F.col("w2").isNotNull().alias("ok"),
                    ),
                )
            ).alias("kg"),
        )
        .filter(F.col("kg.ok"))
        .select("doc_id", F.col("kg.k").alias("k"), F.col("kg.g").alias("g"))
    )
    counts = ex.groupBy("doc_id", "k", "g").agg(F.count("*").alias("c"))
    w = Window.partitionBy("doc_id", "k").orderBy(F.desc("c"), F.asc("g"))
    ranked = counts.withColumn("rn", F.row_number().over(w))
    stats = ranked.groupBy("doc_id", "k").agg(
        F.sum("c").alias("total"),
        F.count("*").alias("nd"),
        F.max("c").alias("maxc"),
        F.min(F.when(F.col("rn") == 1, F.col("g"))).alias("topg"),
    )

    def at(k, col):
        return F.max(F.when(F.col("k") == k, F.col(col)))

    per_doc = stats.groupBy("doc_id").agg(
        at(1, "total").alias("n_tok"),
        at(1, "nd").alias("n_types"),
        at(1, "topg").alias("top_tok"),
        at(1, "maxc").alias("top_c"),
        at(2, "total").alias("t2"),
        at(2, "nd").alias("nd2"),
        at(3, "total").alias("t3"),
        at(3, "nd").alias("nd3"),
    )
    return per_doc.select(
        "doc_id",
        "n_tok",
        "n_types",
        "top_tok",
        _r(F.col("top_c") / F.col("n_tok"), 6).alias("top_tok_frac6"),
        _r(F.col("n_types") / F.col("n_tok"), 6).alias("ttr6"),
        _r((F.col("t2") - F.col("nd2")) / F.col("t2"), 6).alias("dup2_frac6"),
        _r((F.col("t3") - F.col("nd3")) / F.col("t3"), 6).alias("dup3_frac6"),
    )


def _d19_sql() -> str:
    return f"""
WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
g AS (
  SELECT doc_id, 1 AS k, t[i] AS g
  FROM toks, UNNEST(range(1, len(t) + 1)) AS r(i)
  UNION ALL
  SELECT doc_id, 2, t[i] || ' ' || t[i+1]
  FROM toks, UNNEST(range(1, len(t))) AS r(i) WHERE len(t) >= 2
  UNION ALL
  SELECT doc_id, 3, t[i] || ' ' || t[i+1] || ' ' || t[i+2]
  FROM toks, UNNEST(range(1, len(t) - 1)) AS r(i) WHERE len(t) >= 3
),
counts AS (SELECT doc_id, k, g, COUNT(*) AS c FROM g GROUP BY doc_id, k, g),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id, k
                               ORDER BY c DESC, g ASC) AS rn
  FROM counts
),
stats AS (
  SELECT doc_id, k, CAST(SUM(c) AS BIGINT) AS total,
         COUNT(*) AS nd, MAX(c) AS maxc,
         MIN(CASE WHEN rn = 1 THEN g END) AS topg
  FROM ranked GROUP BY doc_id, k
),
per_doc AS (
  SELECT doc_id,
         MAX(CASE WHEN k = 1 THEN total END) AS n_tok,
         MAX(CASE WHEN k = 1 THEN nd END) AS n_types,
         MAX(CASE WHEN k = 1 THEN topg END) AS top_tok,
         MAX(CASE WHEN k = 1 THEN maxc END) AS top_c,
         MAX(CASE WHEN k = 2 THEN total END) AS t2,
         MAX(CASE WHEN k = 2 THEN nd END) AS nd2,
         MAX(CASE WHEN k = 3 THEN total END) AS t3,
         MAX(CASE WHEN k = 3 THEN nd END) AS nd3
  FROM stats GROUP BY doc_id
)
SELECT doc_id, n_tok, n_types, top_tok,
       {_rsql('CAST(top_c AS DOUBLE) / n_tok', 6)} AS top_tok_frac6,
       {_rsql('CAST(n_types AS DOUBLE) / n_tok', 6)} AS ttr6,
       {_rsql('CAST(t2 - nd2 AS DOUBLE) / t2', 6)} AS dup2_frac6,
       {_rsql('CAST(t3 - nd3 AS DOUBLE) / t3', 6)} AS dup3_frac6
FROM per_doc
"""


SUITE = {
    "d07_langid": QueryCase(d07_langid, _d07_sql(), "language-ID heuristic"),
    "d08_quality": QueryCase(d08_quality, _d08_sql(), "doc quality scoring"),
    "d09_token_count": QueryCase(d09_token_count, D09_SQL, "token counting"),
    "d10_fingerprint": QueryCase(
        d10_fingerprint, D10_SQL, "winnowing fingerprints"
    ),
    "d19_repetition": QueryCase(
        d19_repetition, _d19_sql(), "repetition / n-gram diversity signals"
    ),
}

from datafusion_table_providers_spark.operators.relational import _merged

d10b_fingerprint_repetition, D10B_SQL = _merged(
    ("d10", d10_fingerprint, D10_SQL),
    ("d19", d19_repetition, _d19_sql()),
)
SUITE["d10b_fingerprint_repetition"] = QueryCase(
    d10b_fingerprint_repetition,
    D10B_SQL,
    "winnowing fingerprints + repetition signals (merged)",
)


# --- d21: BM25 keyword search (rational-idf variant) ----------------------
# Full-text relevance ranking over the corpus: tokenize, compute document
# frequencies and lengths, score each document against a fixed query-term
# set with the BM25 tf/length saturation, return the global top-K.
#
# Scale shape (100 TB): one scan + explode for the token table, two hash
# aggregations (tf per (doc, term), dl per doc); df and the corpus stats are
# tiny aggregates broadcast to the scorers, so the only wide shuffle keys on
# doc_id. The top-K uses orderBy().limit(), which Spark executes as
# per-partition TakeOrdered + a K-row merge on the driver — never a global
# sort of the full corpus.
#
# Determinism contract: the classic BM25 idf is ln((N-df+0.5)/(df+0.5)+1);
# JVM Math.log and DuckDB/libm ln disagree in the last ULP (measured: 8/172
# probed inputs), which the driver's bit-strict hash would surface. This
# variant uses the RATIONAL idf (N-df+0.5)/(df+0.5) — monotone in df, so
# per-term ranking semantics are preserved — and every remaining operation
# is IEEE +,-,*,/ evaluated with identical textual parenthesization on both
# engines, making the scores bit-identical. Per-doc totals add the per-term
# scores in a FIXED left-fold order (never a float SUM across rows).
BM25_K1 = 1.2
BM25_B = 0.75
BM25_QUERY = ("data", "join", "window", "stream")
BM25_TOPK = 15


def _tokens_df(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias("term"),
    ).filter(F.col("term") != "")


def d21_bm25(spark, sf_dir):
    # NOT checkpointed: the exploded token table is ~10× corpus size, and
    # its two consumers are both cheap derivations — dl aggregates it, tf
    # first filters to the 4 query terms. Recomputing from the scan (two
    # passes over the corpus) beats materializing the explosion to
    # executor-local disk at any scale.
    tok = _tokens_df(spark, sf_dir)
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(F.count("*").alias("nd"), F.sum("dl").alias("tt"))
    tf = (
        tok.filter(F.col("term").isin(*BM25_QUERY))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dft = tf.groupBy("term").agg(F.count("*").alias("df"))
    avgdl = F.col("tt").cast("double") / F.col("nd")
    idf = (F.col("nd") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    score = idf * (
        (F.col("tf") * F.lit(BM25_K1 + 1.0))
        / (
            F.col("tf")
            + F.lit(BM25_K1)
            * (F.lit(1.0 - BM25_B) + F.lit(BM25_B) * (F.col("dl") / avgdl))
        )
    )
    per = (
        tf.join(dl, "doc_id")
        .join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "term", score.alias("s"))
    )
    agg = per.groupBy("doc_id").agg(
        F.count("*").alias("n_terms"),
        *[
            F.coalesce(
                F.sum(F.when(F.col("term") == t, F.col("s"))), F.lit(0.0)
            ).alias(f"s_{i}")
            for i, t in enumerate(BM25_QUERY)
        ],
    )
    total = F.col("s_0")
    for i in range(1, len(BM25_QUERY)):
        total = total + F.col(f"s_{i}")
    tot = agg.select("doc_id", "n_terms", total.alias("score"))
    top = tot.orderBy(F.col("score").desc(), "doc_id").limit(BM25_TOPK)
    from pyspark.sql import Window as _W

    # The unpartitioned window below runs AFTER the TakeOrdered limit, so
    # WindowExec's single partition holds exactly BM25_TOPK (=15) rows —
    # the "No Partition Defined" WARN it triggers is bounded by K, never
    # by corpus size. The corpus-wide ordering work happens in the
    # TakeOrderedAndProject above (per-partition top-K + K-row merge).
    w = _W.orderBy(F.col("score").desc(), "doc_id")
    return top.select(
        F.row_number().over(w).alias("rnk"),
        "doc_id",
        "n_terms",
        _r(F.col("score"), 6).alias("score6"),
    )


def _d21_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_QUERY)
    sums = ",\n    ".join(
        f"COALESCE(SUM(CASE WHEN term = '{t}' THEN s END), 0.0) AS s_{i}"
        for i, t in enumerate(BM25_QUERY)
    )
    total = "s_0"
    for i in range(1, len(BM25_QUERY)):
        total = f"({total} + s_{i})"
    score = (
        f"((nd - df + 0.5) / (df + 0.5)) * "
        f"((tf * {BM25_K1 + 1.0!r}) / "
        f"(tf + {BM25_K1!r} * ({1.0 - BM25_B!r} + {BM25_B!r} * "
        f"(dl / (CAST(tt AS DOUBLE) / nd)))))"
    )
    return f"""
WITH tok AS (
  SELECT doc_id, t AS term FROM (
    SELECT doc_id, unnest(string_split_regex(lower(text), '[^a-z]+')) AS t
    FROM documents) WHERE t <> ''
),
dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
stats AS (SELECT COUNT(*) AS nd, SUM(dl) AS tt FROM dl),
tf AS (
  SELECT doc_id, term, COUNT(*) AS tf FROM tok
  WHERE term IN ({terms}) GROUP BY doc_id, term
),
dft AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
per AS (
  SELECT tf.doc_id, tf.term, {score} AS s
  FROM tf JOIN dl USING (doc_id) JOIN dft USING (term) CROSS JOIN stats
),
agg AS (
  SELECT doc_id, COUNT(*) AS n_terms,
    {sums}
  FROM per GROUP BY doc_id
),
tot AS (SELECT doc_id, n_terms, {total} AS score FROM agg)
SELECT ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk,
       doc_id, n_terms, {_rsql('score', 6)} AS score6
FROM tot ORDER BY score DESC, doc_id LIMIT {BM25_TOPK}
"""


SUITE["d21_bm25"] = QueryCase(
    d21_bm25, _d21_sql(), "BM25 keyword search (rational idf, top-K)"
)

d09b_tokens_bm25, D09B_SQL = _merged(
    ("d09", d09_token_count, D09_SQL),
    ("d21", d21_bm25, _d21_sql()),
)
SUITE["d09b_tokens_bm25"] = QueryCase(
    d09b_tokens_bm25,
    D09B_SQL,
    "token counting + BM25 search (merged)",
)


# --- d23: positional phrase search (inverted-index adjacency) -------------
# The retrieval primitive BM25 can't express: exact phrase matching via a
# POSITIONAL inverted index — token positions survive indexing, and a
# phrase query intersects the posting lists of its words on
# (doc_id, pos_next == pos + 1). Integer-only outputs, so bit-strict safe.
#
# Scale shape (100 TB): the per-term posting fetch is a filter on the token
# table (pushes to the scan), so the adjacency join touches only the query
# terms' postings, keyed (doc_id, pos) — a hash equi-join whose size is the
# posting-list product per doc, not the corpus. Stop-word-heavy phrases are
# the skew case; production caps df per term (as d04's FREQ_CAP) or routes
# them to the BM25 scorer instead.
#
# Position semantics: split('[^a-z]+') consumes delimiter runs, so empty
# tokens appear only at the string edges; filtering them keeps interior
# adjacency intact. Spark posexplode and the oracle's zipped
# unnest(range(0, len(l))) are both 0-based over the same split output.
D23_PHRASE = ("table", "hash")


def d23_phrase_search(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.posexplode(F.split(F.lower(F.col("text")), "[^a-z]+")).alias(
            "pos", "term"
        ),
    ).filter(F.col("term") != "")
    w1, w2 = D23_PHRASE
    a = tok.filter(F.col("term") == w1).select(
        "doc_id", F.col("pos").alias("pa")
    )
    b = tok.filter(F.col("term") == w2).select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb")
    )
    return (
        a.join(
            b,
            (F.col("doc_id") == F.col("doc_b"))
            & (F.col("pb") == F.col("pa") + 1),
        )
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )


def _d23_sql() -> str:
    w1, w2 = D23_PHRASE
    return f"""
WITH tok AS (
  SELECT doc_id, term, pos FROM (
    SELECT doc_id, unnest(l) AS term, unnest(range(0, len(l))) AS pos
    FROM (SELECT doc_id,
                 string_split_regex(lower(text), '[^a-z]+') AS l
          FROM documents)
  ) WHERE term <> ''
)
SELECT a.doc_id, COUNT(*) AS n_hits
FROM (SELECT doc_id, pos AS pa FROM tok WHERE term = '{w1}') a
JOIN (SELECT doc_id AS doc_b, pos AS pb FROM tok WHERE term = '{w2}') b
  ON a.doc_id = b.doc_b AND b.pb = a.pa + 1
GROUP BY a.doc_id
"""


SUITE["d23_phrase_search"] = QueryCase(
    d23_phrase_search,
    _d23_sql(),
    "positional phrase search (inverted-index adjacency)",
)

d09c_text_search, D09C_SQL = _merged(
    ("d09", d09_token_count, D09_SQL),
    ("d21", d21_bm25, _d21_sql()),
    ("d23", d23_phrase_search, _d23_sql()),
)
SUITE["d09c_text_search"] = QueryCase(
    d09c_text_search,
    D09C_SQL,
    "token counting + BM25 + phrase search (merged)",
)


# --- d27: vocabulary statistics (tokenizer prep) --------------------------
# Tokenizer training starts from corpus-wide token frequencies and the
# coverage curve (what share of all token occurrences the top-K types
# cover). One groupBy shuffle for counts; the ranking window runs on K
# rows AFTER a TakeOrdered top-K (the d09c BM25 discipline — bounded by
# K, not vocabulary size); corpus total joins in as a broadcast scalar.
VOCAB_K = 50


def d27_vocab_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("tok")).where(
        F.col("tok") != ""
    )
    counts = toks.groupBy("tok").agg(F.count("*").alias("n"))
    topk = counts.orderBy(F.desc("n"), F.asc("tok")).limit(VOCAB_K)
    order = Window.orderBy(F.desc("n"), F.asc("tok"))
    ranked = topk.withColumn(
        "rnk", F.row_number().over(order).cast("int")
    ).withColumn(
        "cum_n",
        F.sum("n").over(
            order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    total_df = toks.agg(F.count("*").alias("total"))
    return ranked.crossJoin(F.broadcast(total_df)).select(
        "tok",
        "n",
        "rnk",
        _r(F.col("cum_n") / F.col("total"), 6).alias("cum_cov"),
    )


_D27_SQL = f"""
WITH t AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
),
tt AS (SELECT tok FROM t WHERE tok <> ''),
c AS (SELECT tok, COUNT(*) AS n FROM tt GROUP BY tok),
k AS (SELECT tok, n FROM c ORDER BY n DESC, tok ASC LIMIT {VOCAB_K}),
r AS (
  SELECT tok, n,
         CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok ASC) AS INT) AS rnk,
         SUM(n) OVER (ORDER BY n DESC, tok ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n
  FROM k
)
SELECT tok, n, rnk,
       {_rsql('CAST(cum_n AS DOUBLE) / total', 6)} AS cum_cov
FROM r CROSS JOIN (SELECT COUNT(*) AS total FROM tt) tot
"""


SUITE["d27_vocab_stats"] = QueryCase(
    d27_vocab_stats,
    _D27_SQL,
    "vocabulary frequency + coverage curve (tokenizer prep)",
)


# --- d28: Gopher-style quality rule bundle --------------------------------
# The published Gopher/MassiveText filter rules (Rae et al. 2021, §A1.1 —
# public paper), the rule set most curation pipelines start from: word
# count bounds, mean word length bounds, symbol-to-word ratio, alphabetic
# word fraction, and a stopword-presence floor. Every rule is whole-stage
# codegen (split/filter/aggregate/regexp_extract_all) — one scan, zero
# shuffles, zero UDFs; at 100 TB this runs at parquet-scan speed.
_D28_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "that")


def d28_gopher_rules(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda w: w != "")
    n_words = F.size(words)
    sum_len = F.aggregate(
        words, F.lit(0).cast("long"), lambda a, w: a + F.length(w)
    )
    mean_wl = sum_len.cast("double") / n_words
    n_alpha = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]")))
    n_sym = F.size(F.expr(r"regexp_extract_all(text, '#|\\.\\.\\.', 0)"))
    n_stop = sum(
        F.array_contains(words, s).cast("int") for s in _D28_STOPWORDS
    )
    # empty documents (n_words == 0) must yield NULL ratios, not a
    # DIVIDE_BY_ZERO crash (Spark 4 runs ANSI mode by default) — one bad
    # row must never kill a 100 TB job
    def _safe(expr, dec):
        return F.when(n_words > 0, _r(expr, dec))

    out = d.select(
        "doc_id",
        n_words.alias("n_words"),
        _safe(mean_wl, 4).alias("mean_word_len"),
        _safe(n_sym.cast("double") / n_words, 6).alias("symbol_ratio"),
        _safe(n_alpha.cast("double") / n_words, 6).alias("alpha_frac"),
        n_stop.alias("n_stop_hits"),
    )
    return out.withColumn(
        "gopher_pass",
        (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100000)
        & (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0)
        & (F.col("symbol_ratio") < 0.1)
        & (F.col("alpha_frac") > 0.8)
        & (F.col("n_stop_hits") >= 2),
    )


def _d28_sql() -> str:
    stop_terms = " + ".join(
        f"CAST(list_contains(w, '{s}') AS INT)" for s in _D28_STOPWORDS
    )
    return f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS w,
         len(regexp_extract_all(text, '#|\\.\\.\\.')) AS n_sym
  FROM documents
),
m AS (
  SELECT doc_id,
         len(w) AS n_words,
         CASE WHEN len(w) = 0 THEN NULL ELSE
           CAST(list_sum(list_transform(w, x -> len(x))) AS DOUBLE) / len(w)
         END AS mwl,
         CASE WHEN len(w) = 0 THEN NULL ELSE
           CAST(n_sym AS DOUBLE) / len(w) END AS symr,
         CASE WHEN len(w) = 0 THEN NULL ELSE
           CAST(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE)
           / len(w) END AS af,
         CAST({stop_terms} AS INT) AS n_stop_hits
  FROM base
)
SELECT doc_id, n_words,
       CASE WHEN n_words = 0 THEN NULL ELSE {_rsql('mwl', 4)} END AS mean_word_len,
       CASE WHEN n_words = 0 THEN NULL ELSE {_rsql('symr', 6)} END AS symbol_ratio,
       CASE WHEN n_words = 0 THEN NULL ELSE {_rsql('af', 6)} END AS alpha_frac,
       n_stop_hits,
       (n_words >= 50 AND n_words <= 100000
        AND {_rsql('mwl', 4)} >= 3.0 AND {_rsql('mwl', 4)} <= 10.0
        AND {_rsql('symr', 6)} < 0.1
        AND {_rsql('af', 6)} > 0.8
        AND n_stop_hits >= 2) AS gopher_pass
FROM m
"""


SUITE["d28_gopher_rules"] = QueryCase(
    d28_gopher_rules,
    _d28_sql(),
    "Gopher/MassiveText quality rule bundle (single scan, no shuffle)",
)


# --- d29: BPE merge-step pair statistics ----------------------------------
# The inner loop of BPE tokenizer training (Sennrich et al. 2016, public):
# count adjacent symbol-pair frequencies weighted by word frequency and pick
# the top merges. The scale trick is that pair counting runs over the
# DISTINCT word table (vocabulary-sized — millions of rows at 100 TB), not
# the corpus: one corpus-wide groupBy collapses the token stream to
# (word, count), and the character-bigram explode touches only that small
# table. Corpus size affects exactly one shuffle; everything after is
# vocabulary-bounded.
BPE_K = 30


def d29_bpe_pair_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = d.select(F.explode(F.split("text", " ")).alias("w")).where(
        F.col("w") != ""
    )
    wc = toks.groupBy("w").agg(F.count("*").alias("cnt"))
    # sequence(1, n) DESCENDS when n < 1 (BUILD_NOTES #9) — guard len>=2
    pairs_arr = F.when(
        F.length("w") >= 2,
        F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"),
    ).otherwise(F.array().cast("array<string>"))
    pairs = wc.select(F.explode(pairs_arr).alias("pair"), "cnt")
    agg = pairs.groupBy("pair").agg(F.sum("cnt").alias("pair_count"))
    topk = agg.orderBy(F.desc("pair_count"), F.asc("pair")).limit(BPE_K)
    # ranking window runs on BPE_K rows post-limit — bounded by K, not vocab
    order = Window.orderBy(F.desc("pair_count"), F.asc("pair"))
    return topk.withColumn("rnk", F.row_number().over(order).cast("int"))


_D29_SQL = f"""
WITH t AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
wc AS (SELECT w, COUNT(*) AS cnt FROM t WHERE w <> '' GROUP BY w),
p AS (
  SELECT unnest([substring(w, i, 2) for i in range(1, length(w))]) AS pair, cnt
  FROM wc WHERE length(w) >= 2
),
agg AS (SELECT pair, CAST(SUM(cnt) AS BIGINT) AS pair_count FROM p GROUP BY pair),
k AS (SELECT pair, pair_count FROM agg ORDER BY pair_count DESC, pair ASC LIMIT {BPE_K})
SELECT pair, pair_count,
       CAST(ROW_NUMBER() OVER (ORDER BY pair_count DESC, pair ASC) AS INT) AS rnk
FROM k
"""


SUITE["d29_bpe_pair_stats"] = QueryCase(
    d29_bpe_pair_stats,
    _D29_SQL,
    "BPE merge-step pair frequencies (vocabulary-bounded explode)",
)


# --- d30: unigram-LM document scoring (perplexity proxy) ------------------
# The cheap quality signal most curation stacks compute before a real LM
# perplexity pass: mean token SURPRISAL under the corpus's own unigram
# distribution (CCNet-style, Wenzek et al. 2020 — public). Two shuffles at
# any scale: token counts (vocabulary-sized result) and the token→frequency
# equi-join (AQE broadcasts the frequency table when the vocabulary is
# small).
#
# Determinism: the textbook score uses ln(p), but JVM Math.log and
# DuckDB/libm ln disagree in the last ULP (measured in the d21 BM25 work:
# 8/172 probed inputs), so a floor(ln·scale) fixed-point value can flip
# cross-engine on unlucky data. Per-token surprisal is therefore computed
# as INTEGER bits: bits = floor(log2(total/n)) via LENGTH(bin(q))-1 on the
# integer quotient — a string-length operation both engines evaluate
# exactly, no transcendental anywhere. Per-doc aggregates are integer sums
# (order-independent, the e04 lesson); the single trailing division is the
# only float op. Monotone in token rarity, so ranking semantics match the
# ln variant at 1-bit granularity.


def d30_unigram_logprob(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).where(F.col("tok") != "")
    freq = toks.groupBy("tok").agg(F.count("*").alias("n"))
    total = toks.agg(F.count("*").alias("total"))
    # q = floor(total/n) >= 1; bits = floor(log2(q)) = LENGTH(bin(q)) - 1.
    # The double division is exact enough that floor agrees with true
    # integer division here (operands << 2^53), and both engines run the
    # identical IEEE expression either way.
    q = F.floor(F.col("total").cast("double") / F.col("n")).cast("long")
    bits = (F.length(F.bin(q)) - F.lit(1)).cast("long")
    freq_bits = freq.crossJoin(F.broadcast(total)).select(
        "tok", bits.alias("bits")
    )
    per_doc = toks.join(freq_bits, "tok").groupBy("doc_id").agg(
        F.count("*").alias("n_toks"), F.sum("bits").alias("sum_bits")
    )
    return per_doc.select(
        "doc_id",
        "n_toks",
        _r(
            F.col("sum_bits").cast("double") / F.col("n_toks"),
            6,
        ).alias("mean_surprisal_bits"),
    )


_D30_SQL = """
WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
tt AS (SELECT doc_id, tok FROM t WHERE tok <> ''),
f AS (SELECT tok, COUNT(*) AS n FROM tt GROUP BY tok),
tot AS (SELECT COUNT(*) AS total FROM tt),
b AS (
  SELECT tok,
         CAST(LENGTH(bin(CAST(FLOOR(CAST(total AS DOUBLE) / n) AS BIGINT))) - 1
              AS BIGINT) AS bits
  FROM f CROSS JOIN tot
),
pd AS (
  SELECT doc_id, COUNT(*) AS n_toks, CAST(SUM(bits) AS BIGINT) AS sum_bits
  FROM tt JOIN b USING (tok) GROUP BY doc_id
)
SELECT doc_id, n_toks,
       {r} AS mean_surprisal_bits
FROM pd
""".format(r=_rsql('CAST(sum_bits AS DOUBLE) / n_toks', 6))


SUITE["d30_unigram_logprob"] = QueryCase(
    d30_unigram_logprob,
    _D30_SQL,
    "unigram-LM mean surprisal bits (fully integer determinism)",
)
