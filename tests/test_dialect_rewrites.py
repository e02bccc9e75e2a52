"""A8/A9 dialect rewrite tests (MySQL window NULLS/frames, SQLite intervals).

Expected shapes per crates/mysql/src/mysql_window.rs:39-74 and
crates/sqlite/src/sqlite_interval.rs:11-480."""

from datafusion_table_providers_spark.core.dialect_rewrites import (
    OrderItem,
    render_interval_add,
    render_order_item,
    strip_rank_frames,
)
from datafusion_table_providers_spark.core.expr import DIALECTS

MY = DIALECTS["mysql"]
LITE = DIALECTS["sqlite"]
DUCK = DIALECTS["duckdb"]


def test_mysql_strips_implicit_nulls_placement():
    # ASC + NULLS FIRST is MySQL's implicit behavior → plain ASC
    assert render_order_item(OrderItem("x", True, True), MY) == "x ASC"
    assert render_order_item(OrderItem("x", False, False), MY) == "x DESC"


def test_mysql_emulates_explicit_nulls_placement():
    assert (
        render_order_item(OrderItem("x", True, False), MY)
        == "(x IS NULL) ASC, x ASC"
    )
    assert (
        render_order_item(OrderItem("x", False, True), MY)
        == "(x IS NULL) DESC, x DESC"
    )


def test_standard_dialect_keeps_nulls_spec():
    assert (
        render_order_item(OrderItem("x", False, nulls_first=False), DUCK)
        == "x DESC NULLS LAST"
    )


def test_sqlite_interval_lowering():
    assert render_interval_add("d", 90, "day", LITE) == "datetime(d, '+90 days')"
    assert (
        render_interval_add("d", -3, "months", LITE, date_only=True)
        == "date(d, '-3 months')"
    )


def test_mysql_and_ansi_interval():
    assert render_interval_add("d", 90, "day", MY) == "DATE_ADD(d, INTERVAL 90 DAY)"
    assert render_interval_add("d", 90, "day", DUCK) == "d + INTERVAL '90' DAY"


def test_rank_frame_stripped_only_for_rank():
    sql = (
        "SELECT RANK() OVER (PARTITION BY a ORDER BY b "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), "
        "SUM(x) OVER (ORDER BY b ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM t"
    )
    out = strip_rank_frames(sql)
    assert "RANK() OVER (PARTITION BY a ORDER BY b)" in out
    assert "SUM(x) OVER (ORDER BY b ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)" in out


def test_rewritten_sql_passes_dialect_lint():
    """A8/A9 rewrite outputs obey the target dialect's lexical rules
    (core.dialect_lint) — ties the rewrite layer to the same no-server
    grammar gate the filter/DDL generators go through."""
    from datafusion_table_providers_spark.core.dialect_lint import lint_sql
    from datafusion_table_providers_spark.core.dialect_rewrites import (
        OrderItem,
        render_interval_add,
        render_order_item,
    )
    from datafusion_table_providers_spark.core.expr import DIALECTS

    for name in ("mysql", "sqlite", "postgres", "duckdb"):
        d = DIALECTS[name]
        frag = render_order_item(
            OrderItem(d.quote_ident("col"), ascending=False, nulls_first=True),
            d,
        )
        lint_sql(f"SELECT 1 ORDER BY {frag}", name)
        expr = render_interval_add(d.quote_ident("ts"), 3, "days", d)
        lint_sql(f"SELECT {expr}", name)
