"""Deduplication operators for LLM training-data pipelines.

Beyond-reference additions. Scale-first shapes (the 100 TB designs):

- exact dedup groups on md5(text) — never on the raw text — so the shuffle
  key is 32 bytes regardless of document size;
- MinHash-LSH is the classic shingle→minhash→band→bucket-join pipeline: one
  explode + one groupBy for signatures (16 `min` aggregates computed in a
  single map-side-combining pass), then a self-join on (band, key) buckets so
  candidate generation never goes quadratic; exact Jaccard is verified only
  on the candidate pairs;
- SimHash packs a 32-bit signature via bit-count sums and blocks on 8-bit
  bands (pigeonhole: hamming ≤ 3 pairs must agree on ≥1 of 4 bands);
- n-gram Jaccard joins on shingles directly and is bounded by dropping
  ultra-common shingles (frequency cap) — the standard rare-feature trick
  that keeps the candidate join linear on skewed corpora.

Everything is md5-based so Spark and the DuckDB oracle compute identical
hashes; min() over fixed-width lowercase-hex strings == numeric min.

Cross-cutting discipline (r22): wherever a verdict is a pure function of
the underlying VALUES — document text (d02b/d04/d26), normalized prefix
(d22), simhash value (d03b) — the pipeline runs once per distinct value
and fans verdicts back out to doc pairs at the end; see _text_groups.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from datafusion_table_providers_spark.core.case import QueryCase
from datafusion_table_providers_spark.operators.relational import _r, _rsql, _t

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS
SHINGLE_W = 3  # word 3-grams


# --- d01: exact dedup -----------------------------------------------------
def d01_exact_dedup(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(F.md5("text").alias("text_hash"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").alias("n_copies"),
        )
    )


D01_SQL = """
SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


# --- shared shingle builders ---------------------------------------------
def _shingles_df(spark, sf_dir, distinct: bool = True, width: int = SHINGLE_W):
    """Word ``width``-gram shingles per doc of the corpus (default: the
    3-gram dedup shingles; d13/p02 reuse the same builder for their 4-gram
    decontamination pass). See :func:`_shingles_of` for the shape."""
    return _shingles_of(_t(spark, sf_dir, "documents"), distinct, width)


def _shingles_of(docs, distinct: bool = True, width: int = SHINGLE_W):
    """Word ``width``-gram shingles per doc of an arbitrary (doc_id, text)
    table — the corpus itself, or the text-group representatives
    (:func:`_rep_docs`) when the consumer's result is a pure text function.

    ``distinct=False`` skips the dedup shuffle — correct wherever the
    consumer is duplicate-insensitive (MinHash ``min`` aggregates), which at
    100 TB removes a full shuffle of every shingle string. Jaccard
    set-arithmetic consumers must keep ``distinct=True``.

    Shape: posexplode the token array once, then stitch each token to its
    successors with ``lead()`` over (doc_id, pos). The obvious
    ``explode(transform(sequence(...), i -> concat_ws(element_at(toks ...))))``
    form re-evaluates ``split(text)`` inside an *interpreted* higher-order
    lambda per element — measured 1.6-2.5× slower per stage with 4× tail
    variance at sf0.1. The window adds no exchange: it reuses the doc_id
    hash partitioning established below, so both forms are one-shuffle."""
    from pyspark.sql import Window

    spark = docs.sparkSession
    # Small corpora arrive as one file split; the shingle explode + hashing
    # is the expensive part, so spread the docs across the cluster first
    # (at real scale the scan already has many splits and this coalesces
    # into AQE's hands).
    d = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    e = d.select("doc_id", F.posexplode(F.split("text", " ")).alias("pos", "w"))
    win = Window.partitionBy("doc_id").orderBy("pos")
    succ = [F.lead("w", j).over(win) for j in range(1, width)]
    out = (
        e.select(
            "doc_id",
            F.concat_ws(" ", F.col("w"), *succ).alias("s"),
            succ[-1].alias("_last"),
        )
        # a null last successor marks the trailing (width-1) positions that
        # have no full shingle — exactly the rows sequence(1, n-width+1)
        # never emitted
        .filter(F.col("_last").isNotNull())
        .select("doc_id", "s")
    )
    return out.distinct() if distinct else out


_SHINGLES_SQL = f"""
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
       UNNEST(range(1, len(t) - {SHINGLE_W - 2})) AS r(i)
  WHERE len(t) >= {SHINGLE_W}
"""


# --- d02: MinHash signatures + LSH band keys ------------------------------
# Kirsch-Mitzenmacher double hashing: ONE md5 per shingle yields two 32-bit
# halves (h1, h2); the j-th MinHash function is (h1 + j*h2) mod P. Cuts the
# per-shingle hashing cost N_HASHES-fold versus hashing "j:"+s per function
# — at 100 TB the hash stage dominates signature building. Both engines
# derive h1/h2 from the same md5 hex, so signatures stay oracle-identical.
MH_PRIME = 4294967311  # smallest prime > 2^32

#: (applicationId, sf_dir) → checkpointed signature table (1 row/doc).
#: Recomputed identically by d02, d02b (hence d12/d34/p01/p02 via pairs)
#: and c14 — memoized like the d12 labels; the heavy shingle explode runs
#: once per session per sf_dir. See core/memo.py for the operational
#: contract (non-recoverable checkpoints, clear_memo_caches()).
from datafusion_table_providers_spark.core.memo import memo_key, register_cache

_SIG_CACHE: dict = register_cache({})


def _signature_df(spark, sf_dir):
    """Per-doc signature table for doc-keyed consumers (c14, d26),
    memoized + checkpointed. Built GROUP-LEVEL since r22: signatures are a
    pure text function, so they are computed once per distinct text
    (:func:`_rep_signature_df`) and expanded back through the group map —
    identical rows, and on a duplicate-heavy corpus the shingle/hash work
    drops by the duplication factor."""
    key = memo_key(spark, sf_dir)
    cached = _SIG_CACHE.get(key)
    if cached is not None:
        return cached
    m = _text_groups(spark, sf_dir)
    rep = _rep_signature_df(spark, sf_dir).withColumnRenamed("doc_id", "gid")
    if _doc_count(spark, sf_dir) <= SEMIJOIN_MAX_BROADCAST_ROWS:
        rep = F.broadcast(rep)
    out = (
        m.join(rep, "gid")
        .select("doc_id", *[f"band{b}" for b in range(N_BANDS)])
        .localCheckpoint(eager=True)
    )
    _SIG_CACHE[key] = out
    return out


def _signature_plan_df(spark, sf_dir):
    """Raw per-doc signature pipeline (no memo/checkpoint/grouping) — the
    plan-bearing object for d02 itself and for tests."""
    return _signatures_of(_t(spark, sf_dir, "documents"))


def _signatures_of(docs):
    """MinHash signature + LSH band pipeline over an arbitrary
    (doc_id, text) table (corpus or text-group representatives)."""
    # duplicate shingles cannot change a min() — skip the distinct shuffle
    sh = _shingles_of(docs, distinct=False)
    m = F.md5(F.col("s"))
    hh = sh.select(
        "doc_id",
        F.conv(F.substring(m, 1, 8), 16, 10).cast("long").alias("h1"),
        F.conv(F.substring(m, 9, 8), 16, 10).cast("long").alias("h2"),
    )
    aggs = [
        F.min((F.col("h1") + j * F.col("h2")) % MH_PRIME).alias(f"mh{j}")
        for j in range(N_HASHES)
    ]
    sig = hh.groupBy("doc_id").agg(*aggs)
    bands = [
        F.concat_ws(
            "|", *[F.col(f"mh{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
        ).alias(f"band{b}")
        for b in range(N_BANDS)
    ]
    # (materialization happens in _signature_df: the table is small —
    # 1 row/doc — and every consumer would otherwise embed the full hash
    # plan in its join fan-out)
    return sig.select("doc_id", *bands)


def d02_minhash_signatures(spark, sf_dir):
    # the RAW plan, not the memoized localCheckpoint (_signature_df): a solo
    # signature build has no downstream fan-out to amortize a checkpoint, so
    # eagerly materializing blocks here is ~0.3s/run of pure overhead at
    # sf0.1 (and a full extra write of the table at scale). Consumers that
    # embed the signatures several times (d02b's 4-band self-join, d12, c14)
    # keep going through _signature_df for the lineage cut.
    return _signature_plan_df(spark, sf_dir)


def _hex8_sql(mcol: str, start: int) -> str:
    """BIGINT value of 8 hex chars of `mcol` starting at 1-based `start` —
    portable nibble-CASE parse (no from_hex/conv dependency)."""
    terms = []
    for k in range(8):
        case = _HEXVAL_CASE.format(c=f"substr({mcol}, {start + k}, 1)")
        terms.append(f"CAST({case} AS BIGINT) * {16 ** (7 - k)}")
    return "(" + " + ".join(terms) + ")"


def _mh_exprs() -> str:
    return ", ".join(
        f"MIN((h1 + {j} * h2) % {MH_PRIME}) AS mh{j}" for j in range(N_HASHES)
    )


def _band_expr(b: int) -> str:
    return " || '|' || ".join(
        f"CAST(mh{b * ROWS_PER_BAND + r} AS VARCHAR)"
        for r in range(ROWS_PER_BAND)
    )


def _sig_cte() -> str:
    """Shared CTE prefix: shingles → (h1, h2) halves → MinHash signatures."""
    return f"""sh AS ({_SHINGLES_SQL}),
hh AS (
  SELECT doc_id, {_hex8_sql('m', 1)} AS h1, {_hex8_sql('m', 9)} AS h2
  FROM (SELECT doc_id, md5(s) AS m FROM sh)
),
sig AS (SELECT doc_id, {_mh_exprs()} FROM hh GROUP BY doc_id)"""


def _sig_sql() -> str:
    bands = ", ".join(
        f"({_band_expr(b)}) AS band{b}" for b in range(N_BANDS)
    )
    return f"""
WITH {_sig_cte()}
SELECT doc_id, {bands} FROM sig
"""


# --- d02b: LSH candidate pairs + exact-Jaccard verification ---------------
#: skip the candidate semi-join reduction when candidate docs exceed this
#: fraction of the corpus — filtering that drops almost nothing only adds
#: a broadcast + probe to the big exchange (see the adaptive branch below)
SEMIJOIN_MAX_FRACTION = 0.5
#: absolute cap on the BROADCAST form of the reduction: F.broadcast()
#: bypasses autoBroadcastJoinThreshold, and a candidate set just under
#: half of a 100 TB corpus would be billions of doc_ids — far past the
#: 8 GB / 512M-row broadcast limit. Above this row count (but still under
#: the fraction gate) the reduction runs as a SHUFFLE semi-join instead:
#: same surviving rows, no driver/executor-resident hash relation.
SEMIJOIN_MAX_BROADCAST_ROWS = int(
    os.environ.get("SPARK_GRAFT_SEMIJOIN_MAX_BROADCAST_ROWS", "20000000")
)

#: (applicationId, sf_dir) → document row count. The adaptive gate below
#: needs |corpus| on every d02b build, and d02b is rebuilt by d12/d34/d35/
#: d37/p01/p02 within one driver run — memoize the parquet-statistics job
#: per session per corpus (cleared by clear_memo_caches like every memo,
#: so the bench still pays it once per timed run).
_DOCN_CACHE: dict = register_cache({})


def _doc_count(spark, sf_dir) -> int:
    key = memo_key(spark, sf_dir)
    n = _DOCN_CACHE.get(key)
    if n is None:
        n = _t(spark, sf_dir, "documents").count()
        _DOCN_CACHE[key] = n
    return n


# --- text groups: compute once per DISTINCT text, expand at the end -------
# Signatures, band keys, shingle sets — hence LSH candidacy and exact
# Jaccard — are pure functions of the TEXT. A dedup-heavy corpus (the
# regime these operators exist for; the sf1 synth replicates every text
# 10×) therefore repeats the entire shingle→hash→join pipeline per copy.
# Group docs by md5(text) (the d01 primitive — a 32-byte shuffle key per
# doc), run the pipeline once per group REPRESENTATIVE, and fan verdicts
# back out to doc pairs with gid-equi-joins at the very end: the same
# group/expand discipline d22 applies to prefixes and d03b to simhash
# values (guide §1.2 step 1: fix the algorithm; §8.4: decide with small
# rows, attach cheaply). Intra-group pairs are jaccard-1.0 by identity and
# emitted only when the rep actually has shingles (docs under SHINGLE_W
# words produce no signature, so the per-doc pipeline never pairs them).

#: (applicationId, sf_dir) → checkpointed (doc_id, gid) text-group map
_GRP_CACHE: dict = register_cache({})
#: (applicationId, sf_dir) → checkpointed rep signature table
_REPSIG_CACHE: dict = register_cache({})
#: (applicationId, sf_dir) → number of text groups (distinct texts)
_REPN_CACHE: dict = register_cache({})


def _text_groups(spark, sf_dir):
    """(doc_id, gid) with gid = min doc_id among docs sharing this exact
    text — memoized + checkpointed per (session, sf_dir)."""
    key = memo_key(spark, sf_dir)
    m = _GRP_CACHE.get(key)
    if m is None:
        th = _t(spark, sf_dir, "documents").select(
            "doc_id", F.md5("text").alias("th")
        )
        gids = th.groupBy("th").agg(F.min("doc_id").alias("gid"))
        m = (
            th.join(gids, "th")
            .select("doc_id", "gid")
            .localCheckpoint(eager=True)
        )
        _GRP_CACHE[key] = m
    return m


def _rep_count(spark, sf_dir) -> int:
    key = memo_key(spark, sf_dir)
    n = _REPN_CACHE.get(key)
    if n is None:
        m = _text_groups(spark, sf_dir)
        n = m.where(F.col("doc_id") == F.col("gid")).count()
        _REPN_CACHE[key] = n
    return n


def _rep_docs(spark, sf_dir):
    """The documents table restricted to text-group representatives."""
    m = _text_groups(spark, sf_dir)
    rep_ids = m.where(F.col("doc_id") == F.col("gid")).select("doc_id")
    if _rep_count(spark, sf_dir) <= SEMIJOIN_MAX_BROADCAST_ROWS:
        rep_ids = F.broadcast(rep_ids)
    return _t(spark, sf_dir, "documents").join(rep_ids, "doc_id", "left_semi")


def _rep_signature_df(spark, sf_dir):
    """Signature table over the group representatives (1 row per distinct
    text that has >= 1 shingle), memoized + checkpointed."""
    key = memo_key(spark, sf_dir)
    cached = _REPSIG_CACHE.get(key)
    if cached is not None:
        return cached
    out = _signatures_of(_rep_docs(spark, sf_dir)).localCheckpoint(eager=True)
    _REPSIG_CACHE[key] = out
    return out


def _expand_group_pairs(spark, sf_dir, gpairs, payload_cols):
    """Fan group-pair verdicts (ga, gb, *payload) back out to doc pairs
    (da < db, *payload). ``gpairs`` must hold ga < gb over distinct group
    pairs; every unordered cross-group doc pair appears exactly once and
    least/greatest restores the da < db order (groups partition docs)."""
    m = _text_groups(spark, sf_dir)
    ma = m.select(F.col("gid").alias("ga"), F.col("doc_id").alias("xa"))
    mb = m.select(F.col("gid").alias("gb"), F.col("doc_id").alias("xb"))
    # the doc→group map is 2 longs/doc: broadcast it into the expansion
    # joins when it fits (see d03b/d22) so the fanned-out pair stream is
    # produced map-side; past the cap the joins shuffle (AQE skew-split
    # applies there)
    if _doc_count(spark, sf_dir) <= SEMIJOIN_MAX_BROADCAST_ROWS:
        ma, mb = F.broadcast(ma), F.broadcast(mb)
    return (
        gpairs.join(ma, "ga")
        .join(mb, "gb")
        .select(
            F.least("xa", "xb").alias("da"),
            F.greatest("xa", "xb").alias("db"),
            *payload_cols,
        )
    )


def _intra_group_pairs(spark, sf_dir, groups, payload_cols):
    """All (da < db) doc pairs inside each group of ``groups`` (gid,
    *payload) — the identical-text pairs, which carry a constant payload
    (jaccard 1.0 / shared = the group's own shingle stats)."""
    m = _text_groups(spark, sf_dir)
    ma = m.select(F.col("gid"), F.col("doc_id").alias("xa"))
    mb = m.select(F.col("gid"), F.col("doc_id").alias("xb"))
    if _doc_count(spark, sf_dir) <= SEMIJOIN_MAX_BROADCAST_ROWS:
        ma, mb = F.broadcast(ma), F.broadcast(mb)
    return (
        groups.join(ma, "gid")
        .join(mb, "gid")
        .filter(F.col("xa") < F.col("xb"))
        .select(
            F.col("xa").alias("da"), F.col("xb").alias("db"), *payload_cols
        )
    )


def d02b_minhash_lsh_pairs(spark, sf_dir, shingles=None):
    # GROUP LEVEL (r22): candidacy and exact Jaccard are pure functions of
    # the two TEXTS, so the whole band-join + shingle-verification pipeline
    # runs once per distinct text (group representative) and the verdicts
    # fan back out to doc pairs at the end (see _text_groups). The rep
    # signature table arrives checkpointed + memoized — the lineage cut
    # that keeps the 4-band union self-join from embedding the hash plan 8x.
    sig = _rep_signature_df(spark, sf_dir)
    # bucket join per band: reps sharing any full band key are candidates
    buckets = None
    for b in range(N_BANDS):
        one = sig.select(
            "doc_id", F.col(f"band{b}").alias("key"), F.lit(b).alias("band")
        )
        buckets = one if buckets is None else buckets.union(one)
    a = buckets.alias("a")
    bb = buckets.alias("b")
    cand = (
        a.join(
            bb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("da"), F.col("b.doc_id").alias("db")
        )
        .distinct()
        # output-bounded (LSH bucket collisions only) and referenced three
        # times below (cand_docs twice via the union, the final join once) —
        # cut the band-join lineage once instead of re-executing it per
        # reference
        .localCheckpoint(eager=True)
    )
    # exact verification on candidate reps only. When built standalone the
    # rep shingle table is NOT checkpointed (it is ~10× rep-corpus size;
    # re-deriving it per reference beats writing it to executor-local
    # disk); an ensemble caller (d35) that feeds SEVERAL shingle consumers
    # passes one shared checkpointed REP table via ``shingles`` instead —
    # same rows either way.
    sh = (
        shingles
        if shingles is not None
        else _shingles_of(_rep_docs(spark, sf_dir))
    )
    # Semi-join reduction (guide §3.2): the shingle self-join only has to
    # cover reps that appear in some candidate pair — broadcast the (output-
    # bounded, ≤2×|cand|) candidate rep set and drop every other rep's
    # shingles BEFORE the s=s exchange. Pair counts between surviving reps
    # are untouched, so the cand-join result is identical; what changes is
    # that the big exchange no longer carries shingles of never-candidate
    # texts (at 100 TB: almost all of them).
    cand_docs = (
        cand.select(F.col("da").alias("doc_id"))
        .union(cand.select(F.col("db").alias("doc_id")))
        .distinct()
    )
    # ADAPTIVE: the reduction wins when duplicate-suspect texts are sparse
    # (the realistic regime) but costs ~20% when nearly every rep is a
    # candidate. Both counts are cheap (cand is checkpointed; the rep
    # count is memoized), and all branches are result-identical, so this
    # is the guide-§3.2 "pre-filters are not always on" decision made from
    # the actual candidate fraction. NOTE the counts make DataFrame
    # CONSTRUCTION eager: building this plan executes the candidate
    # pipeline even if the result is never collected — inherent to a
    # data-dependent plan choice; plan-only tooling should target the
    # branches directly.
    n_cand = cand_docs.count()
    if n_cand < SEMIJOIN_MAX_FRACTION * _rep_count(spark, sf_dir):
        if n_cand <= SEMIJOIN_MAX_BROADCAST_ROWS:
            sh_c = sh.join(F.broadcast(cand_docs), "doc_id")
        else:
            # too many candidate ids to hold as a broadcast hash relation —
            # keep the reduction but let it shuffle (plain semi-join)
            sh_c = sh.join(cand_docs, "doc_id", "left_semi")
    else:
        sh_c = sh
    # per-rep shingle counts from the (possibly) restricted table: the
    # da/db joins below only ever look up candidate reps, and sh_c keeps
    # ALL shingles of each surviving rep, so the counts are identical
    sizes = sh_c.groupBy("doc_id").agg(F.count("*").alias("n"))
    pair_stream = (
        sh_c.alias("x")
        .join(sh_c.alias("y"), F.col("x.s") == F.col("y.s"))
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .select(
            F.col("x.doc_id").alias("da"), F.col("y.doc_id").alias("db")
        )
    )
    # PAIR-level reduction before the groupBy exchange: only pairs present
    # in `cand` survive the final inner join, so drop the rest of the
    # shared-shingle pair stream map-side with a broadcast LEFT SEMI
    # against the (checkpointed, output-bounded) candidate table — the
    # rep-level reduction above cannot catch candidate reps that pair with
    # the WRONG partner (two candidate reps sharing shingles but no band).
    # (guide §3.2, §2.3: aggregate/filter before the shuffle.) Counts for
    # surviving pairs are untouched. Past the broadcast cap the semi-join
    # shuffles by the same (da, db) key the aggregate needs — one exchange
    # of the stream either way.
    cand_probe = (
        F.broadcast(cand) if n_cand <= SEMIJOIN_MAX_BROADCAST_ROWS else cand
    )
    inter = (
        pair_stream.join(cand_probe, ["da", "db"], "left_semi")
        .groupBy("da", "db")
        .agg(F.count("*").alias("inter"))
    )
    gpairs = (
        cand.join(inter, ["da", "db"])
        .join(sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("n", "na"), "da")
        .join(sizes.withColumnRenamed("doc_id", "db").withColumnRenamed("n", "nb"), "db")
        .select(
            F.col("da").alias("ga"),
            F.col("db").alias("gb"),
            _r(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 6
            ).alias("jaccard"),
        )
    )
    cross = _expand_group_pairs(spark, sf_dir, gpairs, [F.col("jaccard")])
    # intra-group pairs: identical texts share every band key and every
    # shingle, so the per-doc pipeline always paired them at jaccard
    # exactly 1.0 (inter = na = nb) — PROVIDED the text has >= 1 shingle
    # (docs under SHINGLE_W words produce no signature and never pair).
    # Restrict to groups whose rep carries a signature.
    with_sig = sig.select(F.col("doc_id").alias("gid"))
    intra = _intra_group_pairs(
        spark, sf_dir, with_sig, [F.lit(1.0).alias("jaccard")]
    )
    return cross.unionByName(intra)


def _d02b_sql() -> str:
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {_band_expr(b)} AS key, {b} AS band FROM sig"
        for b in range(N_BANDS)
    )
    return f"""
WITH {_sig_cte()},
buckets AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
  FROM buckets a JOIN buckets b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS da, y.doc_id AS db, COUNT(*) AS inter
  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY 1, 2
)
SELECT cand.da, cand.db,
       {_rsql('CAST(inter AS DOUBLE) / (s1.n + s2.n - inter)', 6)} AS jaccard
FROM cand
JOIN inter ON cand.da = inter.da AND cand.db = inter.db
JOIN sizes s1 ON cand.da = s1.doc_id
JOIN sizes s2 ON cand.db = s2.doc_id
"""


# --- d03: SimHash ---------------------------------------------------------
SIMHASH_BITS = 32

_HEXVAL_CASE = (
    "CASE {c} "
    + " ".join(f"WHEN '{x}' THEN {i}" for i, x in enumerate("0123456789abcdef"))
    + " END"
)


def _nibble_sql(i: int) -> str:
    """Integer value of hex digit i (1-based) of md5(w) — portable SQL."""
    return _HEXVAL_CASE.format(c=f"substr(md5(w), {i}, 1)")


def _bit_contrib_from_nib(bit: int) -> str:
    """±1 contribution of md5-bit `bit`, reading a precomputed nibble column
    (keeps the expression tree ~4× smaller than inlining the hex CASE per
    bit — big plans OOM when self-joined)."""
    shift = 3 - bit % 4
    return f"(((nib{bit // 4} >> {shift}) & 1) * 2 - 1)"


def _simhash_value_sql() -> str:
    terms = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return terms


def d03_simhash(spark, sf_dir):
    return _simhashes_of(_t(spark, sf_dir, "documents"))


def _simhashes_of(docs):
    """SimHash signature pipeline over an arbitrary (doc_id, text) table
    (the corpus, or the text-group representatives when the consumer only
    needs the per-text value — simhash is a pure text function)."""
    spark = docs.sparkSession
    d = docs.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    words = d.select(
        "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("w")
    )
    nibs = words.select(
        "doc_id",
        *[
            F.expr(_nibble_sql(i + 1)).alias(f"nib{i}")
            for i in range(SIMHASH_BITS // 4)
        ],
    )
    contrib = nibs.select(
        "doc_id",
        *[
            F.expr(_bit_contrib_from_nib(b)).alias(f"c{b}")
            for b in range(SIMHASH_BITS)
        ],
    )
    sums = contrib.groupBy("doc_id").agg(
        *[F.sum(f"c{b}").alias(f"s{b}") for b in range(SIMHASH_BITS)]
    )
    return sums.select(
        "doc_id", F.expr(_simhash_value_sql()).alias("simhash")
    )


def _d03_sql() -> str:
    nibs = ", ".join(
        f"{_nibble_sql(i + 1)} AS nib{i}" for i in range(SIMHASH_BITS // 4)
    )
    contribs = ", ".join(
        f"{_bit_contrib_from_nib(b)} AS c{b}" for b in range(SIMHASH_BITS)
    )
    sums = ", ".join(f"SUM(c{b}) AS s{b}" for b in range(SIMHASH_BITS))
    return f"""
WITH words AS (
  SELECT DISTINCT doc_id, UNNEST(string_split(text, ' ')) AS w FROM documents
),
nibs AS (SELECT doc_id, {nibs} FROM words),
contrib AS (SELECT doc_id, {contribs} FROM nibs),
sums AS (SELECT doc_id, {sums} FROM contrib GROUP BY doc_id)
SELECT doc_id, {_simhash_value_sql()} AS simhash FROM sums
"""


# --- d03b: SimHash near-dup pairs via byte-band blocking ------------------
HAMMING_MAX = 3
#: group-pair spread factor (× defaultParallelism) ahead of the expansion
#: joins — see the comment at the repartition site
D03B_EXPAND_PARTS = 4


def d03b_simhash_pairs(spark, sf_dir):
    from pyspark.sql import Window

    # lineage cut before the band self-join (see d02b)
    sig = d03_simhash(spark, sf_dir).localCheckpoint(eager=True)
    # Run the band self-join once per DISTINCT SIMHASH VALUE, not once per
    # doc: hamming (and hence membership) depends only on the two simhash
    # values, and a near-dup-heavy corpus collapses many docs onto one
    # value (exact duplicates always do) — at the 10×-replicated sf1 synth
    # the band join's pair explosion drops ~100× for the same output.
    # Shape (same group/expand discipline as d22): group docs by simhash
    # (window min = group id), band-join the distinct values, hamming-
    # filter BEFORE fanning back out (only surviving group pairs pay the
    # expansion joins), then two gid-equi-joins restore doc pairs.
    # Intra-group pairs are hamming-0 by identity and always survive.
    m = sig.withColumn(
        "gid", F.min("doc_id").over(Window.partitionBy("simhash"))
    )
    reps = m.where(F.col("doc_id") == F.col("gid")).select(
        F.col("gid"), F.col("simhash")
    )
    # ONE self-join on the unpivoted (band, byte) key instead of a 4-way
    # union of per-byte-band joins (r21 rewrite, kept): a pair collides on
    # SOME band either way and the DISTINCT collapses multi-band collisions.
    banded = reps.select(
        "gid",
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
    ).select("gid", "simhash", F.col("bb.band").alias("band"), F.col("bb.byte").alias("byte"))
    a = banded.alias("a")
    b = banded.alias("b")
    gpairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.byte") == F.col("b.byte"))
            & (F.col("a.gid") < F.col("b.gid")),
        )
        .select(
            F.col("a.gid").alias("ga"),
            F.col("b.gid").alias("gb"),
            F.col("a.simhash").alias("ha"),
            F.col("b.simhash").alias("hb"),
        )
        .distinct()
        .select(
            "ga",
            "gb",
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= HAMMING_MAX)
    )
    # the expansion fan-out below is ATOMIC per gpair row (one row emits
    # |group_a|×|group_b| pairs) and AQE coalesces the tiny gpairs exchange
    # into a handful of tasks — a few heavy group pairs then serialize the
    # whole expansion (measured: one 14.5s straggler vs 0.6s median on
    # d35's critical path). Spread the rows round-robin over plenty of
    # tasks first so heavy rows land apart (guide §2.5: skew —
    # split/spread the hot keys); the exchange itself is distinct-value
    # pairs, orders of magnitude smaller than its fan-out.
    if D03B_EXPAND_PARTS:
        gpairs = gpairs.repartition(
            D03B_EXPAND_PARTS * spark.sparkContext.defaultParallelism
        )
    # m leaves the window hash-partitioned by SIMHASH — i.e. every member
    # of a big group sits in ONE partition, so the intra fan-out below
    # (each probe row emits |group| rows) would be produced by a handful
    # of straggler tasks (measured: d35's expansion stage ran at ~3-way
    # effective parallelism). Spread the PROBE rows by doc_id first — the
    # per-row output is then Σ|group| per task, uniform (guide §2.5).
    m_spread = m.repartition(spark.sparkContext.defaultParallelism, "doc_id")
    ma = m_spread.select(F.col("gid").alias("ga"), F.col("doc_id").alias("xa"))
    mb = m_spread.select(F.col("gid").alias("gb"), F.col("doc_id").alias("xb"))
    # The doc→group map is 2 longs/doc; broadcast it into the expansion
    # joins whenever it fits (memoized count, same cap as d02b's reduction)
    # so the EXPANDED pair stream — orders of magnitude bigger than its
    # inputs — is produced map-side and never re-shuffled. Without the
    # explicit hint the map sits behind a checkpoint (unknown stats) and a
    # composed plan (d35) falls back to sort-merge, re-exchanging the full
    # 157M-row intermediate. Past the cap the joins shuffle — correct,
    # just not broadcast-accelerated (AQE skew-split applies there).
    small = _doc_count(spark, sf_dir) <= SEMIJOIN_MAX_BROADCAST_ROWS
    build_a = F.broadcast(ma) if small else ma
    build_b = F.broadcast(mb) if small else mb
    cross = (
        gpairs.join(build_a, "ga")
        .join(build_b, "gb")
        .select(
            F.least("xa", "xb").alias("da"),
            F.greatest("xa", "xb").alias("db"),
            "hamming",
        )
    )
    intra = (
        ma.join(
            build_b.withColumnRenamed("gb", "ga"),
            "ga",
        )
        .filter(F.col("xa") < F.col("xb"))
        .select(
            F.col("xa").alias("da"),
            F.col("xb").alias("db"),
            F.lit(0).cast("int").alias("hamming"),
        )
    )
    return cross.unionByName(intra)


def _d03b_sql() -> str:
    bands = " UNION ALL ".join(
        f"""SELECT a.doc_id da, b.doc_id db, a.simhash ha, b.simhash hb
        FROM sig a JOIN sig b
          ON ((a.simhash >> {8 * i}) % 256) = ((b.simhash >> {8 * i}) % 256)
         AND a.doc_id < b.doc_id"""
        for i in range(4)
    )
    inner = _d03_sql().strip()
    return f"""
WITH sig AS ({inner}),
pairs AS (SELECT DISTINCT da, db, ha, hb FROM ({bands}))
SELECT da, db, CAST(bit_count(xor(ha, hb)) AS INTEGER) AS hamming
FROM pairs WHERE bit_count(xor(ha, hb)) <= {HAMMING_MAX}
"""


# --- d04: n-gram Jaccard with frequency-capped candidate join -------------
FREQ_CAP = 50  # drop shingles present in more docs than this (skew guard)
MIN_SHARED = 2


def d04_ngram_jaccard(spark, sf_dir, shingles=None):
    # GROUP LEVEL (r22, see d02b/_text_groups): the shared-shingle count
    # and Jaccard depend only on the two texts and the GLOBAL document
    # frequency of each shingle, so the self-join runs once per distinct
    # text and fans back out at the end. ``shingles`` (when passed by the
    # d35 ensemble) is the REP-level distinct shingle table.
    sh = (
        shingles
        if shingles is not None
        else _shingles_of(_rep_docs(spark, sf_dir))
    )
    m = _text_groups(spark, sf_dir)
    gsize = m.groupBy("gid").agg(F.count("*").alias("gn"))
    # document frequency of s = Σ group sizes over the groups whose text
    # contains s (each rep row stands for gn identical docs) — identical
    # to the per-doc count. The group-size table is 2 longs/group;
    # broadcast it under the cap.
    gsz = gsize.withColumnRenamed("gid", "doc_id")
    if _rep_count(spark, sf_dir) <= SEMIJOIN_MAX_BROADCAST_ROWS:
        gsz = F.broadcast(gsz)
    # drop ultra-common shingles via ANTI-join against the COMMON set: the
    # common side (df > cap) is tiny and bounded at any corpus size, while
    # a broadcast of the rare vocabulary would grow with the corpus
    # (guide §3.1: broadcast the side that stays small).
    common = (
        sh.join(gsz, "doc_id")
        .groupBy("s")
        .agg(F.sum("gn").alias("df"))
        .filter(F.col("df") > FREQ_CAP)
        .select("s")
    )
    sh_r = sh.join(F.broadcast(common), "s", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    ginter = (
        sh_r.alias("x")
        .join(sh_r.alias("y"), F.col("x.s") == F.col("y.s"))
        .filter(F.col("x.doc_id") < F.col("y.doc_id"))
        .groupBy(F.col("x.doc_id").alias("da"), F.col("y.doc_id").alias("db"))
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= MIN_SHARED)
    )
    gpairs = (
        ginter.join(
            sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("n", "na"),
            "da",
        )
        .join(
            sizes.withColumnRenamed("doc_id", "db").withColumnRenamed("n", "nb"),
            "db",
        )
        .select(
            F.col("da").alias("ga"),
            F.col("db").alias("gb"),
            "shared",
            _r(
                F.col("shared") / (F.col("na") + F.col("nb") - F.col("shared")),
                6,
            ).alias("jaccard"),
        )
    )
    cross = _expand_group_pairs(
        spark, sf_dir, gpairs, [F.col("shared"), F.col("jaccard")]
    )
    # intra-group pairs: identical texts share exactly their own rare
    # shingles, so the per-doc join emitted them with shared = |rare(text)|
    # and jaccard = shared / (2n - shared) — but only when the text has
    # >= MIN_SHARED rare shingles.
    rare_n = (
        sh_r.groupBy(F.col("doc_id").alias("gid"))
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= MIN_SHARED)
    )
    intra_g = rare_n.join(
        sizes.withColumnRenamed("doc_id", "gid"), "gid"
    ).select(
        "gid",
        "shared",
        _r(
            F.col("shared") / (F.col("n") + F.col("n") - F.col("shared")), 6
        ).alias("jaccard"),
    )
    intra = _intra_group_pairs(
        spark, sf_dir, intra_g, [F.col("shared"), F.col("jaccard")]
    )
    return cross.unionByName(intra)


_D04_SQL = f"""
WITH sh AS ({_SHINGLES_SQL}),
rare AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= {FREQ_CAP}),
shr AS (SELECT sh.doc_id, sh.s FROM sh JOIN rare ON sh.s = rare.s),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS da, y.doc_id AS db, COUNT(*) AS shared
  FROM shr x JOIN shr y ON x.s = y.s AND x.doc_id < y.doc_id
  GROUP BY 1, 2 HAVING COUNT(*) >= {MIN_SHARED}
)
SELECT da, db, shared,
       {_rsql('CAST(shared AS DOUBLE) / (s1.n + s2.n - shared)', 6)} AS jaccard
FROM inter JOIN sizes s1 ON da = s1.doc_id JOIN sizes s2 ON db = s2.doc_id
"""


# --- d12: duplicate-cluster assignment (connected components) -------------
# The graph step a production dedup pipeline needs after candidate pairs:
# near-duplicate pairs form a graph; each document must map to ONE canonical
# representative (the component's minimum doc_id). Spark side: iterative
# min-label propagation — each round is one shuffle join (edges ⋈ labels),
# rounds ≈ component diameter (dup clusters are tiny, so 2-4 rounds); at
# 100 TB this is the standard large-scale connected-components discipline
# (no driver-side graph, converges by fixpoint count check). Oracle side:
# DuckDB recursive-CTE transitive closure over the same LSH pairs.
D12_JACCARD_TAU = 0.5


#: (applicationId, normalized sf_dir) → checkpointed labels DF. The
#: component labels are recomputed identically by every caller (d12 row,
#: d34 keep-best, p01/p02 pipelines — up to four times in one driver run);
#: the result is a localCheckpoint'd table of duplicate-cluster members
#: (small), valid for the life of the SparkSession, and the input parquet
#: is immutable per sf_dir — so memoizing is safe and cuts the repeated
#: 20-round label-propagation cost.
_D12_CACHE: dict = register_cache({})


def d12_dedup_components(spark, sf_dir):
    key = memo_key(spark, sf_dir)
    cached = _D12_CACHE.get(key)
    if cached is not None:
        return cached
    pairs = (
        d02b_minhash_lsh_pairs(spark, sf_dir)
        .filter(F.col("jaccard") >= D12_JACCARD_TAU)
        .select("da", "db")
        .localCheckpoint(eager=True)  # cut the heavy minhash lineage once
    )
    edges = pairs.union(
        pairs.select(F.col("db").alias("da"), F.col("da").alias("db"))
    ).select(F.col("da").alias("src"), F.col("db").alias("dst"))
    # round 0 fused into the seed: with initial lbl(x) = x, the first
    # propagation round computes exactly least(node, min(neighbor)) — so
    # seed with that directly and save one full join+checkpoint+count round
    # (edges are bidirectional, so groupBy(src) covers every node)
    labels = edges.groupBy(F.col("src").alias("node")).agg(
        F.least(F.col("node"), F.min("dst")).alias("lbl")
    )
    changed = None
    for _ in range(20):  # min-label propagation needs ≤ diameter rounds
        nbr = (
            edges.join(labels, edges.dst == F.col("node"))
            .groupBy(F.col("src").alias("node2"))
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        new_labels = (
            labels.join(nbr, labels.node == F.col("node2"), "left")
            .select(
                "node",
                F.least(F.col("lbl"), F.coalesce("nbr_lbl", "lbl")).alias("lbl"),
            )
        )
        new_labels = new_labels.localCheckpoint(eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), F.col("n.node") == F.col("o.node"))
            .filter(F.col("n.lbl") != F.col("o.lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    if changed != 0:
        # returning unconverged labels would silently split true components
        # (and diverge from the exact recursive-CTE oracle) — fail loudly;
        # chains deeper than 20 hops need a higher round cap
        raise RuntimeError(
            "connected-components did not converge within 20 rounds "
            f"({changed} labels still changing) — raise the round cap"
        )
    out = labels.select(
        F.col("node").alias("doc_id"), F.col("lbl").alias("component_id")
    )
    _D12_CACHE[key] = out
    return out


def _d12_sql() -> str:
    return f"""
WITH RECURSIVE
jp AS (
  SELECT da, db FROM ({_d02b_sql()}) WHERE jaccard >= {D12_JACCARD_TAU}
),
edges AS (SELECT da AS a, db AS b FROM jp UNION ALL SELECT db, da FROM jp),
nodes AS (SELECT DISTINCT a AS n FROM edges),
reach(n, m) AS (
  SELECT n, n FROM nodes
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m
)
SELECT n AS doc_id, MIN(m) AS component_id FROM reach GROUP BY n
"""


SUITE = {
    "d01_exact_dedup": QueryCase(d01_exact_dedup, D01_SQL, "exact dedup via md5"),
    "d12_dedup_components": QueryCase(
        d12_dedup_components, _d12_sql(), "duplicate clusters (connected components)"
    ),
    "d02_minhash_signatures": QueryCase(
        d02_minhash_signatures, _sig_sql(), "MinHash signatures + LSH bands"
    ),
    "d02b_minhash_lsh_pairs": QueryCase(
        d02b_minhash_lsh_pairs, _d02b_sql(), "LSH candidates + exact Jaccard"
    ),
    "d03_simhash": QueryCase(d03_simhash, _d03_sql(), "SimHash signatures"),
    "d03b_simhash_pairs": QueryCase(
        d03b_simhash_pairs, _d03b_sql(), "SimHash hamming pairs"
    ),
    "d04_ngram_jaccard": QueryCase(
        d04_ngram_jaccard, _D04_SQL, "n-gram Jaccard dedup"
    ),
}


# ---------------------------------------------------------------------------
# Production-scale variants (JVM hashes, not oracle-portable)
#
# The oracle-checked operators above use md5 so DuckDB can replay them
# bit-for-bit. At 100 TB the same pipelines should use Spark's native
# xxhash64 (whole-stage-codegen, ~20× cheaper than md5-as-hex): identical
# shuffle/join shapes, different hash family. These variants are exercised
# by tests and the benchmark, not by the SQL oracle.


def minhash_signatures_fast(df, text_col="text", n_hashes=N_HASHES):
    """MinHash signatures via seeded xxhash64 — one JVM hash per (shingle,
    seed), no hex strings. Returns (doc_id, mh0..mhN-1) with BIGINT minima."""
    toks = F.split(text_col, " ")
    n = F.size(toks)
    idx = F.when(
        n >= SHINGLE_W, F.sequence(F.lit(1), n - (SHINGLE_W - 1))
    ).otherwise(F.array().cast("array<int>"))
    sh = df.select(
        "doc_id",
        F.explode(
            F.transform(
                idx,
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(SHINGLE_W)]
                ),
            )
        ).alias("s"),
    ).distinct()
    return sh.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64(F.col("s"), F.lit(j))).alias(f"mh{j}")
            for j in range(n_hashes)
        ]
    )


def exact_dedup_fast(df, text_col="text"):
    """Exact dedup on xxhash64(length, text) — 8-byte shuffle key."""
    return (
        df.groupBy(
            F.xxhash64(F.length(text_col), F.col(text_col)).alias("text_hash")
        )
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


# --- d22: edit-distance (Levenshtein) near-dup with prefix blocking -------
# Fuzzy dedup for the cases hashing families miss: small character-level
# edits (OCR noise, whitespace/punctuation drift, minor rewrites). Classic
# record-linkage shape: BLOCK first, compare second — candidate pairs come
# only from a cheap equi-join on a blocking key, and the quadratic
# Levenshtein DP runs per-pair on fixed-length normalized prefixes, so
# per-pair cost is a constant (PFX_LEN^2 character ops).
#
# Scale shape (100 TB): one scan computes (prefix, block-key); the
# candidate generator is a self-equi-join on the block key (hash shuffle,
# never an all-pairs product); D22_BLOCK_CAP drops pathological blocks
# (boilerplate-heavy shards) before the join, bounding per-block work the
# same way FREQ_CAP does in d04. Recall tradeoff is explicit: near-dups
# whose first D22_BLOCK chars differ are missed — production would union a
# second blocking pass (e.g. suffix key or length bucket) exactly like
# d11b's multi-probe union.
#
# Determinism: normalization is regexp_replace + lower + substr (identical
# semantics both engines) and the output columns are all integers —
# Levenshtein distance is exact DP, no float anywhere.
#
# Block-key selectivity is the scale lever (probed on the synthetic corpus):
# a 4-char key saturates on a fixed vocabulary — candidates grew 4,037 →
# 405,823 (100×) over a 4× doc step, a quadratic hop the cross-SF probe
# caught. The 8-char key keeps 258/262 true pairs (98.5% recall) at 13.5×
# fewer candidates; block count keeps growing with corpus instead of
# saturating. The Spark side also bounds the DP with the threshold form
# levenshtein(a, b, tau) — O(tau·n) early-exit, -1 above tau — which the
# oracle's plain `levenshtein() <= tau` filter reproduces exactly.
D22_PFX_LEN = 64
D22_BLOCK = 8
D22_TAU = 24
D22_BLOCK_CAP = 1000


def _d22_prefixed(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    pfx = F.substring(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z ]", ""),
        1,
        D22_PFX_LEN,
    )
    return d.select(
        "doc_id", pfx.alias("pfx"), F.substring(pfx, 1, D22_BLOCK).alias("bk")
    )


def d22_editdist_neardup(spark, sf_dir):
    from pyspark.sql import Window

    p = _d22_prefixed(spark, sf_dir)
    # block-cap via ANTI-join against the (tiny, pathological-only) set of
    # over-cap blocks instead of broadcasting every surviving block key —
    # the survivor set grows with the corpus, the dropped set does not
    # (same inversion as d04's frequency cap; identical surviving rows)
    bad = (
        p.groupBy("bk")
        .agg(F.count("*").alias("bn"))
        .filter(F.col("bn") > D22_BLOCK_CAP)
        .select("bk")
    )
    p = p.join(F.broadcast(bad), "bk", "left_anti")
    # Run the quadratic Levenshtein DP once per DISTINCT-PREFIX pair, not
    # once per doc pair: dist(a, b) depends only on (pfx_a, pfx_b), and a
    # near-dup-heavy corpus (the regime this operator exists for) has many
    # docs per identical prefix — at the 10×-replicated sf1 synth that is
    # 100× fewer DP cells for the same output. Shape: group docs by prefix
    # (window min = group id, one (bk, pfx) shuffle), DP over rep pairs
    # (ga <= gb covers intra-group pairs, which are dist 0 by identity),
    # then fan the group-pair verdicts back out to doc pairs with two
    # gid-equi-joins. Doc-pair set and dist values are provably identical:
    # prefixes partition docs, every same-block unordered doc pair appears
    # in exactly one group pair, and least/greatest restores da < db.
    m = p.withColumn(
        "gid", F.min("doc_id").over(Window.partitionBy("bk", "pfx"))
    )
    reps = m.where(F.col("doc_id") == F.col("gid")).select("bk", "gid", "pfx")
    ra = reps.select("bk", F.col("gid").alias("ga"), F.col("pfx").alias("pa"))
    rb = reps.select("bk", F.col("gid").alias("gb"), F.col("pfx").alias("pb"))
    rep_pairs = (
        ra.join(rb, "bk")
        .filter(F.col("ga") <= F.col("gb"))
        .select(
            "ga",
            "gb",
            F.levenshtein(F.col("pa"), F.col("pb"), D22_TAU).alias("dist"),
        )
        .filter(F.col("dist") >= 0)
    )
    ma = m.select(F.col("gid").alias("ga"), F.col("doc_id").alias("xa"))
    mb = m.select(F.col("gid").alias("gb"), F.col("doc_id").alias("xb"))
    # see d03b: broadcast the 2-long-per-doc group map into the expansion
    # joins when it fits, so the fanned-out pair stream is produced
    # map-side instead of being re-exchanged by a sort-merge fallback
    if _doc_count(spark, sf_dir) <= SEMIJOIN_MAX_BROADCAST_ROWS:
        ma, mb = F.broadcast(ma), F.broadcast(mb)
    return (
        rep_pairs.join(ma, "ga")
        .join(mb, "gb")
        # distinct groups: every cross pair is one unordered doc pair;
        # same group (ga == gb): order the pair explicitly to avoid the
        # (x,y)/(y,x) double and the x=x self-pair
        .filter((F.col("ga") < F.col("gb")) | (F.col("xa") < F.col("xb")))
        .select(
            F.least("xa", "xb").alias("da"),
            F.greatest("xa", "xb").alias("db"),
            "dist",
        )
    )


_D22_SQL = f"""
WITH p AS (
  SELECT doc_id,
         substr(regexp_replace(lower(text), '[^a-z ]', '', 'g'), 1,
                {D22_PFX_LEN}) AS pfx
  FROM documents
),
blk AS (SELECT doc_id, pfx, substr(pfx, 1, {D22_BLOCK}) AS bk FROM p),
ok AS (SELECT bk FROM blk GROUP BY bk HAVING COUNT(*) <= {D22_BLOCK_CAP}),
f AS (SELECT blk.* FROM blk JOIN ok USING (bk))
SELECT a.doc_id AS da, b.doc_id AS db,
       levenshtein(a.pfx, b.pfx) AS dist
FROM f a JOIN f b ON a.bk = b.bk AND a.doc_id < b.doc_id
WHERE levenshtein(a.pfx, b.pfx) <= {D22_TAU}
"""


SUITE["d22_editdist_neardup"] = QueryCase(
    d22_editdist_neardup,
    _D22_SQL,
    "edit-distance near-dup (blocked Levenshtein)",
)

from datafusion_table_providers_spark.operators.relational import _merged

d04b_ngram_editdist, _D04B_SQL = _merged(
    ("d04", d04_ngram_jaccard, _D04_SQL),
    ("d22", d22_editdist_neardup, _D22_SQL),
)
SUITE["d04b_ngram_editdist"] = QueryCase(
    d04b_ngram_editdist,
    _D04B_SQL,
    "n-gram Jaccard + edit-distance near-dup (merged)",
)


# --- d26: fuzzy eval-set decontamination (MinHash/LSH, cross-split) -------
# Real curation pipelines pair exact-substring decontamination (d13's
# 8-gram hits) with NEAR-duplicate decontamination: a training doc that is
# a light paraphrase of an eval doc shares no long exact gram but has high
# shingle Jaccard. Same signature/band machinery as d02b, restricted to
# train x eval candidate pairs. Scale shape: a real eval side is
# benchmark-sized (MBs against a corpus of TBs), so its band buckets and
# shingles broadcast — the broadcast bound is |eval|, never |corpus| —
# and the train side never self-joins: one shuffle for signatures,
# map-side joins after. (The synthetic 20% split here is far larger than
# any real benchmark; it exists so the certified output is non-trivial.)
FUZZY_EVAL_MOD = 5
FUZZY_EVAL_REM = 2


def d26_fuzzy_decontaminate(spark, sf_dir):
    # GROUP LEVEL (r22, see _text_groups): candidacy and Jaccard are pure
    # functions of the two TEXTS; only the train/eval SPLIT is doc-level
    # (doc_id % MOD). So: run the band join + shingle verification once per
    # unordered REP pair — INCLUDING the diagonal ga == gb, since a train
    # doc and an eval doc may share one exact text (jaccard 1.0) — then
    # expand each verdict to (train member × eval member) in both
    # directions through the group map. The real-scale shape argument is
    # unchanged (an eval side is benchmark-sized), and on a dup-heavy
    # corpus the shingle join work drops by the duplication factor².
    sig = _rep_signature_df(spark, sf_dir)  # checkpointed + memoized
    buckets = None
    for b in range(N_BANDS):
        one = sig.select(
            "doc_id", F.col(f"band{b}").alias("key"), F.lit(b).alias("band")
        )
        buckets = one if buckets is None else buckets.union(one)
    a = buckets.alias("a")
    bb = buckets.alias("b")
    gcand = (
        a.join(
            F.broadcast(bb),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") <= F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("ga"), F.col("b.doc_id").alias("gb"))
        .distinct()
        # output-bounded band collisions, referenced twice below (semi
        # probe + final join): cut the band-join lineage once
        .localCheckpoint(eager=True)
    )
    sh = _shingles_of(_rep_docs(spark, sf_dir))
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    pair_stream = (
        sh.alias("x")
        .join(sh.alias("y"), F.col("x.s") == F.col("y.s"))
        .filter(F.col("x.doc_id") <= F.col("y.doc_id"))
        .select(F.col("x.doc_id").alias("ga"), F.col("y.doc_id").alias("gb"))
    )
    # pair-level reduction before the aggregate exchange, as in d02b
    gcand_probe = (
        F.broadcast(gcand)
        if _rep_count(spark, sf_dir) <= SEMIJOIN_MAX_BROADCAST_ROWS
        else gcand
    )
    ginter = (
        pair_stream.join(gcand_probe, ["ga", "gb"], "left_semi")
        .groupBy("ga", "gb")
        .agg(F.count("*").alias("inter"))
    )
    gpairs = (
        gcand.join(ginter, ["ga", "gb"])
        .join(sizes.withColumnRenamed("doc_id", "ga").withColumnRenamed("n", "na"), "ga")
        .join(sizes.withColumnRenamed("doc_id", "gb").withColumnRenamed("n", "nb"), "gb")
        .select(
            "ga",
            "gb",
            _r(
                F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")),
                6,
            ).alias("jaccard"),
        )
    )
    # expansion: train members of one group × eval members of the other,
    # both directions for distinct groups, once for the diagonal
    m = _text_groups(spark, sf_dir)
    is_eval = F.col("doc_id") % FUZZY_EVAL_MOD == FUZZY_EVAL_REM
    mt = m.where(~is_eval).select("gid", F.col("doc_id").alias("train_id"))
    me = m.where(is_eval).select("gid", F.col("doc_id").alias("eval_id"))
    fits = _doc_count(spark, sf_dir) <= SEMIJOIN_MAX_BROADCAST_ROWS

    def _bc(df):
        return F.broadcast(df) if fits else df

    fwd = (
        gpairs.join(_bc(mt.withColumnRenamed("gid", "ga")), "ga")
        .join(_bc(me.withColumnRenamed("gid", "gb")), "gb")
        .select("train_id", "eval_id", "jaccard")
    )
    rev = (
        gpairs.filter(F.col("ga") < F.col("gb"))
        .join(_bc(mt.withColumnRenamed("gid", "gb")), "gb")
        .join(_bc(me.withColumnRenamed("gid", "ga")), "ga")
        .select("train_id", "eval_id", "jaccard")
    )
    return fwd.unionByName(rev)


def _d26_sql() -> str:
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {_band_expr(b)} AS key, {b} AS band FROM sig"
        for b in range(N_BANDS)
    )
    m, r = FUZZY_EVAL_MOD, FUZZY_EVAL_REM
    return f"""
WITH {_sig_cte()},
buckets AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.doc_id AS train_id, b.doc_id AS eval_id
  FROM buckets a JOIN buckets b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id % {m} <> {r} AND b.doc_id % {m} = {r}
),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT x.doc_id AS train_id, y.doc_id AS eval_id, COUNT(*) AS inter
  FROM sh x JOIN sh y ON x.s = y.s
  WHERE x.doc_id % {m} <> {r} AND y.doc_id % {m} = {r}
  GROUP BY 1, 2
)
SELECT cand.train_id, cand.eval_id,
       {_rsql('CAST(inter AS DOUBLE) / (st.n + se.n - inter)', 6)} AS jaccard
FROM cand
JOIN inter ON cand.train_id = inter.train_id AND cand.eval_id = inter.eval_id
JOIN sizes st ON cand.train_id = st.doc_id
JOIN sizes se ON cand.eval_id = se.doc_id
"""


SUITE["d26_fuzzy_decontaminate"] = QueryCase(
    d26_fuzzy_decontaminate,
    _d26_sql(),
    "fuzzy eval-set decontamination (LSH train x eval + exact Jaccard)",
)


# --- d34: quality-aware duplicate-representative selection ----------------
# Production dedup never keeps the MIN-doc_id duplicate: it keeps the
# highest-QUALITY member of each near-duplicate cluster (the convention in
# published curation pipelines — e.g. RefinedWeb keeps by heuristic rank).
# Composition of two certified primitives: d12's connected components
# (min-label propagation over the MinHash-LSH pair graph) joined to d08's
# quality score; one window per component picks the argmax. The quality
# column is already floor-rounded to 6 dp, so the (quality DESC, doc_id
# ASC) order is deterministic on both engines. Scale: the join and window
# run on the MEMBERS of duplicate clusters only (a small fraction of the
# corpus), partitioned by component_id.
def d34_dedup_keep_best(spark, sf_dir):
    from pyspark.sql import Window

    from datafusion_table_providers_spark.llm.text import d08_quality

    comp = d12_dedup_components(spark, sf_dir)
    q = d08_quality(spark, sf_dir).select("doc_id", "quality")
    m = comp.join(q, "doc_id")
    wc = Window.partitionBy("component_id")
    wr = Window.partitionBy("component_id").orderBy(
        F.desc("quality"), F.asc("doc_id")
    )
    ranked = m.withColumn("n_members", F.count("*").over(wc)).withColumn(
        "rk", F.row_number().over(wr)
    )
    return ranked.filter(F.col("rk") == 1).select(
        "component_id",
        F.col("doc_id").alias("kept_doc"),
        "n_members",
        (F.col("n_members") - F.lit(1)).alias("n_dropped"),
        F.col("quality").alias("kept_quality"),
    )


def _d34_sql() -> str:
    from datafusion_table_providers_spark.llm.text import _d08_sql

    return f"""
WITH m AS (
  SELECT c.component_id, c.doc_id, q.quality
  FROM ({_d12_sql()}) c JOIN ({_d08_sql()}) q USING (doc_id)
),
r AS (
  SELECT component_id, doc_id, quality,
         CAST(COUNT(*) OVER (PARTITION BY component_id) AS BIGINT) AS n_members,
         ROW_NUMBER() OVER (PARTITION BY component_id
                            ORDER BY quality DESC, doc_id ASC) AS rk
  FROM m
)
SELECT component_id, doc_id AS kept_doc, n_members,
       n_members - 1 AS n_dropped, quality AS kept_quality
FROM r WHERE rk = 1
"""


SUITE["d34_dedup_keep_best"] = QueryCase(
    d34_dedup_keep_best,
    _d34_sql(),
    "duplicate clusters keep the highest-quality representative",
)


# window row: components + quality-aware representative in one slot
d12b_components_keepbest, D12B_SQL = _merged(
    ("d12", d12_dedup_components, _d12_sql()),
    ("d34", d34_dedup_keep_best, _d34_sql()),
)
SUITE["d12b_components_keepbest"] = QueryCase(
    d12b_components_keepbest,
    D12B_SQL,
    "duplicate clusters + keep-best representative (merged)",
)


# --- d35: ensemble near-duplicate verdict ---------------------------------
# Production dedup at scale runs SEVERAL cheap near-dup detectors and
# trusts only their agreement (each method has distinct false-positive
# modes: MinHash misses low-Jaccard paraphrases, SimHash collides on
# short texts, n-gram Jaccard over-fires on boilerplate). The ensemble
# verdict — a pair is a duplicate iff >= 2 of {minhash, simhash, ngram}
# flag it — is a pure composition: union the three certified pair tables
# with method tags, one groupBy on the pair key. No new shuffle shape;
# candidate generation stays bucketed in each underlying method.
#: method → bit tag for the ensemble verdict aggregate. Every member emits
#: a given (da, db) pair AT MOST ONCE (d02b: distinct candidates inner-
#: joined to per-pair-unique tables; d03b: disjoint cross/intra sets of
#: unique pairs; d04: groupBy output), so sum(tag) is a faithful method
#: SET — the bit mask replaces count(DISTINCT)/collect_set, which planned
#: as THREE ObjectHashAggregate passes and TWO full exchanges of the
#: ~158M-row pair union at sf1 (object-mode agg, no codegen). The mask
#: form is one codegen HashAggregate with map-side partials and ONE
#: exchange (guide §2.3 aggregate-before-shuffle, §2.4 remove exchanges).
_D35_TAG = {"minhash": 1, "ngram": 2, "simhash": 4}
#: mask → the exact string collect_set+array_sort+array_join produced
_D35_MASK_STR = [
    ",".join(sorted(m for m, t in _D35_TAG.items() if mask & t))
    for mask in range(8)
]


def d35_ensemble_neardup(spark, sf_dir):
    # ONE distinct-shingle pass over the text-group REPRESENTATIVES feeds
    # both shingle-set members (minhash's exact-Jaccard verifier and the
    # n-gram blocker): each references the shingle lineage 3-5× inside its
    # own plan, so the ensemble would otherwise re-run the
    # scan+explode+distinct subtree ~8× (guide §2.4: share one pass; §5:
    # one lineage cut for the shared table). SimHash blocks on single
    # words, not shingles — it keeps its own pass (and its own
    # distinct-simhash grouping, which subsumes identical texts).
    shingles = _shingles_of(_rep_docs(spark, sf_dir)).localCheckpoint(
        eager=True
    )
    mh = d02b_minhash_lsh_pairs(spark, sf_dir, shingles=shingles).select(
        "da", "db", F.lit(_D35_TAG["minhash"]).alias("tag")
    )
    ng = d04_ngram_jaccard(spark, sf_dir, shingles=shingles).select(
        "da", "db", F.lit(_D35_TAG["ngram"]).alias("tag")
    )
    # A pair can only reach >= 2 methods if minhash or ngram flags it —
    # simhash alone is one method. So aggregate the two SMALL members first
    # (both are output-bounded: LSH-verified / MIN_SHARED-filtered), then
    # mark simhash membership by probing d03b's pair stream against that
    # small pair set. On a near-dup-heavy corpus the simhash member utterly
    # dominates the union (sf1 synth: ~157.3M of 157.7M rows); aggregating
    # the union hash-partitioned it twice and spilled the partial aggregate
    # (32 concurrent tasks × ~157M mostly-unique keys vs a shared-heap
    # execution pool — measured at ~4-way effective parallelism). The probe
    # form never exchanges or aggregates the dominant stream at all: a
    # broadcast LEFT SEMI consumes it map-side (guide §3.2 semi-join
    # reduction; §2.2 shuffle fewer bytes). Past the broadcast cap the semi
    # join shuffles both sides — still |small| + one pass over sh, never an
    # aggregate of sh.
    small = (
        mh.unionByName(ng)
        .groupBy("da", "db")
        .agg(F.sum("tag").alias("mask_s"))
        # referenced twice (semi-join probe + final left join): cut the
        # full minhash+ngram lineage once instead of executing it per
        # reference
        .localCheckpoint(eager=True)
    )
    # Simhash membership WITHOUT materializing d03b's pair stream: with 4
    # byte-bands and HAMMING_MAX = 3, pigeonhole guarantees every
    # hamming-≤-3 pair shares at least one untouched band, so d03b's pair
    # set is EXACTLY {(da < db): hamming(simhash_a, simhash_b) ≤ 3} — the
    # band blocking is pure acceleration, zero recall loss (set equality
    # pinned in tests). Since the output needs ≥ 2 methods and simhash
    # alone is 1, output ⊆ `small`; so attach each side's simhash VALUE to
    # the small pair set (simhash is a pure text function — computed once
    # per text-group rep, looked up through the group map) and filter on
    # hamming directly. O(|small|) probes replace the d03b fan-out, whose
    # expanded pair stream dominated the ensemble even when consumed
    # map-side (guide §1.1 first-principles floor: one signature pass +
    # one probe per candidate pair).
    m = _text_groups(spark, sf_dir)
    rsim = _simhashes_of(_rep_docs(spark, sf_dir)).withColumnRenamed(
        "doc_id", "gid"
    )
    fits = _doc_count(spark, sf_dir) <= SEMIJOIN_MAX_BROADCAST_ROWS
    doc_sim = m.join(F.broadcast(rsim) if fits else rsim, "gid").select(
        "doc_id", "simhash"
    )
    sim_b = F.broadcast(doc_sim) if fits else doc_sim
    hits = (
        small.select("da", "db")
        .join(sim_b.select(F.col("doc_id").alias("da"), F.col("simhash").alias("ha")), "da")
        .join(sim_b.select(F.col("doc_id").alias("db"), F.col("simhash").alias("hb")), "db")
        .filter(
            F.bit_count(F.col("ha").bitwiseXOR(F.col("hb"))) <= HAMMING_MAX
        )
        .select("da", "db", F.lit(_D35_TAG["simhash"]).alias("tag_sh"))
    )
    # `small` is per-pair unique (groupBy output) and the simhash lookup
    # is 1 row/doc, so `hits` is per-pair unique and the left join below
    # adds the simhash bit exactly once.
    agg = small.join(
        F.broadcast(hits) if fits else hits, ["da", "db"], "left"
    ).select(
        "da",
        "db",
        (F.col("mask_s") + F.coalesce("tag_sh", F.lit(0))).alias("mask"),
    )
    return agg.filter(F.bit_count("mask") >= 2).select(
        "da",
        "db",
        F.bit_count("mask").cast("long").alias("n_methods"),
        F.element_at(
            F.array(*[F.lit(s) for s in _D35_MASK_STR]),
            (F.col("mask") + 1).cast("int"),
        ).alias("methods"),
    )


def _d35_sql() -> str:
    return f"""
WITH u AS (
  SELECT da, db, 'minhash' AS method FROM ({_d02b_sql()})
  UNION ALL
  SELECT da, db, 'simhash' AS method FROM ({_d03b_sql()})
  UNION ALL
  SELECT da, db, 'ngram' AS method FROM ({_D04_SQL})
)
SELECT da, db, COUNT(DISTINCT method) AS n_methods,
       string_agg(DISTINCT method, ',' ORDER BY method) AS methods
FROM u GROUP BY da, db HAVING COUNT(DISTINCT method) >= 2
"""


SUITE["d35_ensemble_neardup"] = QueryCase(
    d35_ensemble_neardup,
    _d35_sql(),
    "ensemble near-dup verdict (pair flagged by >=2 of 3 methods)",
)


# --- d37: near-duplicate contamination matrix by source pair --------------
# The dataset-card question behind dedup: WHERE do the duplicates come
# from? Cross-source pair mass (e.g. web_crawl x curated) signals one
# source re-hosting another — a licensing/contamination review trigger —
# while intra-source mass is ordinary crawl redundancy. Pure composition:
# the certified d02b pair table joined twice against the slim
# (doc_id, source) projection (broadcast both ways at any corpus size —
# the pair table is output-bounded, the label table is 2 columns), then
# one tiny groupBy on the unordered source pair. Label the pair
# (least, greatest) so (A,B) and (B,A) accumulate together.
def d37_dup_source_matrix(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "source")
    pairs = d02b_minhash_lsh_pairs(spark, sf_dir).select("da", "db")
    labeled = (
        pairs.join(
            d.select(
                F.col("doc_id").alias("da"), F.col("source").alias("src_a")
            ),
            "da",
        )
        .join(
            d.select(
                F.col("doc_id").alias("db"), F.col("source").alias("src_b")
            ),
            "db",
        )
    )
    return (
        labeled.select(
            F.least("src_a", "src_b").alias("source_lo"),
            F.greatest("src_a", "src_b").alias("source_hi"),
        )
        .groupBy("source_lo", "source_hi")
        .agg(F.count("*").alias("n_pairs"))
    )


def _d37_sql() -> str:
    return f"""
WITH pairs AS (SELECT da, db FROM ({_d02b_sql()})),
labeled AS (
  SELECT LEAST(x.source, y.source) AS source_lo,
         GREATEST(x.source, y.source) AS source_hi
  FROM pairs p
  JOIN documents x ON p.da = x.doc_id
  JOIN documents y ON p.db = y.doc_id
)
SELECT source_lo, source_hi, COUNT(*) AS n_pairs
FROM labeled GROUP BY source_lo, source_hi
"""


SUITE["d37_dup_source_matrix"] = QueryCase(
    d37_dup_source_matrix,
    _d37_sql(),
    "near-dup pair mass by unordered source pair (contamination matrix)",
)
