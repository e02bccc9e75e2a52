"""Runtime semi-join reduction for connector scans (dynamic filter pushdown).

The static pushdown surface (``pushFilters`` — reference
crates/common/src/sql/sql_provider_datafusion/mod.rs:231-247) only carries
predicates that exist in the query TEXT. The predicate that matters most at
100 TB is usually not textual: a fact-table scan joined to a *filtered*
dimension should only fetch rows whose join key survives the dim filter.
DataFusion gained exactly this as dynamic filter pushdown; Spark's own
runtime filters (DPP / runtime bloom) never cross the Python DataSource
boundary, so a connector-backed fact scan otherwise ships EVERY row to
Spark just to discard most of them in the join.

This module closes that gap with a driver-computed reduction ladder:

1. **IN-list** — if the dim has ≤ ``in_list_max`` distinct keys, render
   ``key IN (k1, …, kn)`` into the connector SQL. The remote engine's zone
   maps / indexes then skip everything else; the wire carries only
   potentially-matching rows. The collect is bounded by ``in_list_max + 1``
   rows of a single column — a driver-side cost that does NOT grow with
   fact-table size, which is what makes the pattern safe at scale.
2. **min/max range** — over the cap, fall back to
   ``key >= lo AND key <= hi`` (two-value collect). Weaker, but still
   prunes remote row groups whenever key ranges correlate with storage
   order (the common case for time- or id-ordered fact tables).
3. **FALSE** — an empty dim short-circuits the remote scan entirely.

The clause is a SUPERSET filter by construction (it can only drop rows the
join would drop anyway), so correctness never depends on it: the Spark-side
join above the scan remains the truth — the same Inexact contract as the
limit/sort pushdown (reference mod.rs:505-607 keeps the local operator for
the same reason).

Superset caveat: the clause is frozen from a driver-side collect, while the
join re-evaluates the dim at action time. The contract therefore requires a
DETERMINISTIC dim between the two evaluations — callers with ``sample()`` /
``rand()``-derived or time-varying dims must ``localCheckpoint()`` first
and join against the same frozen reference (see ``Engine.reduced_view``).
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from datafusion_table_providers_spark.core.expr import DIALECTS, Dialect

#: default distinct-key cap for the IN-list strategy. Statement size stays
#: bounded (~8k literals ≈ a few hundred KB of SQL — well inside every
#: engine's statement limit) and the driver collect is one slim column.
IN_LIST_MAX = 8192


def runtime_filter_clause(
    dim_df: DataFrame,
    dim_key: str,
    dialect: Dialect,
    fact_column: Optional[str] = None,
    in_list_max: int = IN_LIST_MAX,
) -> Tuple[Optional[str], str]:
    """Compute the reduction clause for ``fact_column`` from ``dim_df``'s
    distinct ``dim_key`` values.

    Returns ``(clause_sql, strategy)`` where strategy is one of
    ``in_list`` / ``range`` / ``empty`` / ``none``. ``clause_sql`` is None
    for ``none``: min/max introspection returned NULL, or the key type's
    ordering is not engine-invariant (strings/binary — a remote engine's
    collation may order them differently from Spark, so a BETWEEN could
    drop keys the join keeps, violating the superset contract; equality
    semantics are collation-safe, so the IN-list path still applies).

    NULL keys never join, so they are excluded from the clause; a fact row
    with a NULL key is dropped remotely by ``IN``/range semantics exactly
    as the join would drop it.
    """
    from pyspark.sql import types as T

    q = dialect.quote_ident(fact_column or dim_key)
    dtype = dim_df.schema[dim_key].dataType
    if isinstance(dtype, T.TimestampType):
        # TimestampType values collect as naive datetimes rendered in the
        # SESSION timezone; the remote storage convention this engine writes
        # (and the reference reads) is UTC-naive. Under a non-UTC session a
        # rendered literal would be shifted, dropping matching fact rows —
        # decline unless the session is pinned to UTC, mirroring the
        # string-collation bailout below. TimestampNTZType is naive on both
        # sides and needs no gate.
        tz = dim_df.sparkSession.conf.get("spark.sql.session.timeZone", "")
        if tz not in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
            return None, "none"
    keys = dim_df.select(dim_key).where(F.col(dim_key).isNotNull()).distinct()
    sample = [r[0] for r in keys.limit(in_list_max + 1).collect()]
    if not sample:
        return "FALSE", "empty"
    # Spark joins treat NaN == NaN as TRUE; remote IN/BETWEEN semantics
    # drop NaN rows. A NaN dim key therefore makes every clause lossy —
    # bail out rather than violate the superset contract. Infinities are
    # declined too: some dialects cannot render them as literals (MySQL
    # raises), and a graceful (None, 'none') beats an exception mid-scan.
    import math as _math

    if any(isinstance(v, float) and not _math.isfinite(v) for v in sample):
        return None, "none"
    if len(sample) <= in_list_max:
        lits = ", ".join(dialect.literal(v) for v in sorted(sample))
        return f"{q} IN ({lits})", "in_list"
    ordered_ok = isinstance(
        dtype,
        (
            T.ByteType, T.ShortType, T.IntegerType, T.LongType,
            T.FloatType, T.DoubleType, T.DecimalType,
            T.DateType, T.TimestampType, T.TimestampNTZType,
        ),
    )
    if not ordered_ok:
        return None, "none"
    aggs = [F.min(dim_key).alias("lo"), F.max(dim_key).alias("hi")]
    if isinstance(dtype, (T.FloatType, T.DoubleType)):
        # the bounded sample above can miss a NaN/inf hiding past the cap —
        # scan-level check before trusting a float range
        c = F.col(dim_key)
        bad = (
            F.isnan(c)
            | (c == F.lit(float("inf")))
            | (c == F.lit(float("-inf")))
        )
        aggs.append(F.max(bad).alias("has_bad"))
    row = keys.agg(*aggs).collect()[0]
    if row["lo"] is None or row["hi"] is None or bool(
        row["has_bad"] if "has_bad" in row.__fields__ else False
    ):
        return None, "none"
    lo, hi = dialect.literal(row["lo"]), dialect.literal(row["hi"])
    return f"{q} >= {lo} AND {q} <= {hi}", "range"


def duckdb_semijoin_scan(
    spark: SparkSession,
    backend,
    relation: str,
    fact_key: str,
    dim_df: DataFrame,
    dim_key: Optional[str] = None,
    in_list_max: int = IN_LIST_MAX,
    **reader_kwargs,
) -> Tuple[DataFrame, str]:
    """A ``duckdb_reader_df`` scan of ``relation`` reduced by ``dim_df``'s
    join keys. Returns ``(scan_df, strategy)`` — the caller still performs
    the Spark-side join on ``fact_key`` (the clause is a superset filter,
    not the join). Extra ``reader_kwargs`` (columns, partition_column, …)
    pass through to ``duckdb_reader_df``.
    """
    from datafusion_table_providers_spark.sources.duckdb_source import (
        duckdb_reader_df,
    )

    clause, strategy = runtime_filter_clause(
        dim_df,
        dim_key or fact_key,
        DIALECTS["duckdb"],
        fact_column=fact_key,
        in_list_max=in_list_max,
    )
    extra: List[str] = list(reader_kwargs.pop("extra_where", []) or [])
    if clause is not None:
        extra.append(clause)
    df = duckdb_reader_df(
        spark, backend, relation, extra_where=extra, **reader_kwargs
    )
    return df, strategy
