"""Static dialect linter for generated SQL.

No live Postgres/MySQL/ClickHouse server exists in this environment, so the
dialect-specific SQL we generate (pushdown WHERE clauses, SELECTs, DDL) is
never executed remotely. This linter encodes the dialect grammar rules those
servers would enforce — the class of bug the round-2 ADVICE flagged (a float
literal rendered as ``CAST(x AS DOUBLE)``, valid DuckDB, invalid Postgres) is
caught statically here, as a property test over ``core.expr`` generators.

Reference analog: each reference crate carries its own SQL builder with
dialect-aware rendering (crates/postgres/src/lib.rs:202-321,
crates/mysql/src/lib.rs); their integration tests run against live servers.
This is the no-server approximation: tokenize → strip string literals with
the dialect's escape rules → assert lexical invariants.
"""

from __future__ import annotations

import re
from typing import List

#: dialects where backslash inside a single-quoted string escapes the next
#: character (ANSI treats backslash as a plain character; '' doubles quotes)
BACKSLASH_ESCAPE_DIALECTS = {"mysql", "clickhouse"}

IDENT_QUOTE = {
    "ansi": '"',
    "duckdb": '"',
    "sqlite": '"',
    "postgres": '"',
    "odbc": '"',
    "adbc": '"',
    "mysql": "`",
    "clickhouse": "`",
}


class DialectLintError(AssertionError):
    pass


def strip_strings(sql: str, dialect: str) -> str:
    """Remove the BODIES of single-quoted string literals (leaving ``''``
    markers) and of quoted identifiers (leaving ``""``/`` `` `` markers),
    honoring the dialect's escape conventions. Raises if the scan ends
    inside an unterminated literal — the string-boundary-break / injection
    class (e.g. a trailing backslash swallowing the closing quote in
    ClickHouse).
    """
    backslash = dialect in BACKSLASH_ESCAPE_DIALECTS
    iq = IDENT_QUOTE[dialect]
    out: List[str] = []
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'" or c == iq:
            quote = c
            esc = backslash and quote == "'"
            i += 1
            while True:
                if i >= n:
                    raise DialectLintError(
                        f"unterminated quoted section in {dialect} SQL: {sql!r}"
                    )
                c = sql[i]
                if esc and c == "\\":
                    i += 2
                    continue
                if c == quote:
                    if i + 1 < n and sql[i + 1] == quote:  # doubling
                        i += 2
                        continue
                    i += 1
                    break
                i += 1
            out.append(quote + quote)
            continue
        out.append(c)
        i += 1
    return "".join(out)


def lint_sql(sql: str, dialect: str) -> None:
    """Raise DialectLintError on any lexical dialect violation."""
    code = strip_strings(sql, dialect)

    # bare inf/nan tokens bind as identifiers, never valid literals
    if re.search(r"(?<![\w'])(inf|nan|Infinity|NaN)(?![\w'])", code):
        raise DialectLintError(f"bare non-finite token in {dialect}: {sql!r}")

    wrong_quote = "`" if IDENT_QUOTE[dialect] == '"' else '"'
    if wrong_quote in code:
        raise DialectLintError(
            f"wrong identifier-quote char {wrong_quote!r} in {dialect} SQL: {sql!r}"
        )

    if dialect in ("postgres", "mysql", "odbc", "adbc", "ansi"):
        # CAST(… AS DOUBLE) — DuckDB-ism; Postgres has no DOUBLE type and
        # MySQL only accepts it from 8.0.17 (the round-2 ADVICE bug class)
        if re.search(r"AS\s+DOUBLE\s*\)", code, re.IGNORECASE):
            raise DialectLintError(
                f"CAST(... AS DOUBLE) is not portable {dialect} SQL: {sql!r}"
            )
    if dialect == "mysql":
        if re.search(r"DOUBLE\s+PRECISION", code, re.IGNORECASE):
            raise DialectLintError(f"DOUBLE PRECISION in mysql SQL: {sql!r}")
    if dialect == "postgres":
        for fn in ("unhex", "toDateTime64", "toDate32"):
            if re.search(rf"(?<!\w){fn}\s*\(", code, re.IGNORECASE):
                raise DialectLintError(
                    f"{fn}() is not a Postgres function: {sql!r}"
                )
        if re.search(r"(?<!\w)X''", code):
            raise DialectLintError(f"X'...' blob literal in postgres: {sql!r}")
    if dialect == "clickhouse":
        # keyword-style temporal literals are not ClickHouse grammar
        if re.search(r"(?<!\w)(TIMESTAMP|DATE)\s*''", code):
            raise DialectLintError(
                f"keyword temporal literal in clickhouse: {sql!r}"
            )
    if dialect == "sqlite":
        # '::' cast syntax is Postgres/DuckDB grammar, not SQLite
        if "::" in code:
            raise DialectLintError(f"'::' cast operator in sqlite SQL: {sql!r}")
        # ILIKE is not an SQLite operator (its LIKE is already
        # ASCII-case-insensitive); the generator must lower to LIKE
        if re.search(r"(?<!\w)ILIKE(?!\w)", code, re.IGNORECASE):
            raise DialectLintError(f"ILIKE operator in sqlite SQL: {sql!r}")

    # parenthesis balance (cheap structural sanity)
    depth = 0
    for c in code:
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth < 0:
                raise DialectLintError(f"unbalanced parens in {sql!r}")
    if depth != 0:
        raise DialectLintError(f"unbalanced parens in {sql!r}")
