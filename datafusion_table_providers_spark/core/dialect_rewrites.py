"""Dialect-specific SQL rewrites (A8/A9 parity).

The reference rewrites DataFusion ASTs before unparsing:

- **MySQL windows** (crates/mysql/src/mysql_window.rs:39-74): MySQL rejects
  NULLS FIRST/LAST in window ORDER BY and frame clauses on RANK — both are
  stripped before emission.
- **SQLite intervals** (crates/sqlite/src/sqlite_interval.rs:11-480): SQLite
  has no INTERVAL type; ``col + INTERVAL 'n unit'`` is lowered to
  ``datetime(col, '+n unit')`` / ``date(col, '+n unit')``.

Our SQL generation is structured (we render ORDER BY items and interval
arithmetic through the dialect), so the rewrites live here as rendering
rules rather than post-hoc AST surgery — same emitted SQL, no re-parse.
"""

from __future__ import annotations

import re
from dataclasses import dataclass
from typing import Optional

from datafusion_table_providers_spark.core.expr import Dialect

_UNIT_ALIASES = {
    "day": "days",
    "days": "days",
    "hour": "hours",
    "hours": "hours",
    "minute": "minutes",
    "minutes": "minutes",
    "second": "seconds",
    "seconds": "seconds",
    "month": "months",
    "months": "months",
    "year": "years",
    "years": "years",
}


@dataclass(frozen=True)
class OrderItem:
    expr: str
    ascending: bool = True
    nulls_first: Optional[bool] = None  # None → dialect default


def render_order_item(item: OrderItem, dialect: Dialect) -> str:
    """ORDER BY item with dialect-aware NULLS handling.

    MySQL (mysql_window.rs:39-74 analog): NULLS FIRST/LAST is not valid —
    emulate with an ``IS NULL`` sort key prefix when the requested placement
    differs from MySQL's implicit one (NULLs sort first ASC, last DESC)."""
    direction = "ASC" if item.ascending else "DESC"
    if item.nulls_first is None:
        return f"{item.expr} {direction}"
    nulls = "NULLS FIRST" if item.nulls_first else "NULLS LAST"
    if dialect.name == "mysql":
        implicit_first = item.ascending
        if item.nulls_first == implicit_first:
            return f"{item.expr} {direction}"  # stripped: already implicit
        null_key = f"({item.expr} IS NULL) {'DESC' if item.nulls_first else 'ASC'}"
        return f"{null_key}, {item.expr} {direction}"
    return f"{item.expr} {direction} {nulls}"


def render_interval_add(
    col_expr: str, n: int, unit: str, dialect: Dialect, date_only: bool = False
) -> str:
    """``col + INTERVAL n unit`` per dialect.

    SQLite lowering (sqlite_interval.rs:11-480): datetime()/date() modifier
    strings; negative n renders as '-n unit'."""
    u = _UNIT_ALIASES[unit.lower()]
    if dialect.name == "sqlite":
        fn = "date" if date_only else "datetime"
        sign = "+" if n >= 0 else "-"
        return f"{fn}({col_expr}, '{sign}{abs(n)} {u}')"
    if dialect.name == "mysql":
        fn = "DATE_ADD" if n >= 0 else "DATE_SUB"
        return f"{fn}({col_expr}, INTERVAL {abs(n)} {u.rstrip('s').upper()})"
    return f"{col_expr} + INTERVAL '{n}' {u.rstrip('s').upper()}"


def strip_rank_frames(sql: str) -> str:
    """Remove frame clauses from RANK()/DENSE_RANK() windows (MySQL rejects
    them — mysql_window.rs RANK handling). String-level, used when we emit
    a whole federated query for a MySQL-dialect backend."""
    out = []
    i = 0
    pattern = re.compile(r"\b(RANK|DENSE_RANK)\s*\(\s*\)\s*OVER\s*\(", re.I)
    while True:
        m = pattern.search(sql, i)
        if not m:
            out.append(sql[i:])
            break
        # find the matching close paren of the OVER(
        depth = 1
        j = m.end()
        while j < len(sql) and depth:
            if sql[j] == "(":
                depth += 1
            elif sql[j] == ")":
                depth -= 1
            j += 1
        over_body = sql[m.end() : j - 1]
        cleaned = re.sub(
            r"\s+(ROWS|RANGE|GROUPS)\s+BETWEEN\s+.+$",
            "",
            over_body,
            flags=re.I | re.S,
        )
        out.append(sql[i : m.end()])
        out.append(cleaned)
        out.append(")")
        i = j
    return "".join(out)
