"""Every package module must import cleanly.

Round-2 lesson: ``streaming/events.py`` shipped with a name used at call time
whose import existed only inside another function — nothing imported the
module at collection time, so pytest stayed green while every caller broke.
Walking the whole package closes that hole for good.
"""

import importlib
import pkgutil

import pytest

import datafusion_table_providers_spark as pkg

MODULES = sorted(
    name
    for _, name, _ in pkgutil.walk_packages(pkg.__path__, prefix=pkg.__name__ + ".")
)


def test_found_modules():
    # Guard against the walker silently finding nothing.
    assert len(MODULES) > 15


@pytest.mark.parametrize("module", MODULES)
def test_module_imports(module):
    importlib.import_module(module)


def test_streaming_events_callables_resolve():
    """The specific round-2 failure shape: module-level names used inside
    functions must resolve (os was only imported inside a sibling fn)."""
    from datafusion_table_providers_spark.streaming import events

    assert events.os is not None  # module-scope import present


def test_priority_window_is_first_fifty():
    """The driver's correctness gate reads the FIRST 50 registry entries;
    PRIORITY_WINDOW must be exactly 50 names, all registered, and the
    registry must serve them first, in order."""
    from datafusion_table_providers_spark.suite import (
        FULL_SUITE,
        PRIORITY_WINDOW,
    )

    assert len(PRIORITY_WINDOW) == 50
    assert len(set(PRIORITY_WINDOW)) == 50
    assert list(FULL_SUITE)[:50] == PRIORITY_WINDOW
    for name in PRIORITY_WINDOW:
        case = FULL_SUITE[name]
        assert case.oracle, f"{name} has no oracle SQL"


def test_all_oracle_sql_parses_on_duckdb():
    """Cheap registry-wide oracle health check: every oracle_sql entry must
    EXPLAIN (parse + bind) against DuckDB views over the driver tables —
    catches oracle typos/drift in seconds without running the queries."""
    import duckdb

    from datafusion_table_providers_spark.suite import FULL_SUITE

    con = duckdb.connect()
    sf_dir = "/root/testdata/sf0.001"
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = []
    for name, case in FULL_SUITE.items():
        if not case.oracle:
            continue
        try:
            con.execute(f"EXPLAIN {case.oracle}")
        except Exception as e:  # noqa: BLE001 — collected for the report
            bad.append((name, str(e).splitlines()[0]))
    assert not bad, bad


def test_examples_run(spark):
    """Every example's main() runs end-to-end in-process (the reference
    ships python/examples/*; these are their Spark translations)."""
    import importlib
    import sys

    sys.path.insert(0, "/root/repo/examples")
    try:
        for mod in (
            "duckdb_demo",
            "sqlite_demo",
            "adbc_demo",
            "flight_demo",
            "postgres_demo",
            "clickhouse_demo",
            "runtime_filter_demo",
        ):
            importlib.import_module(mod).main()
    finally:
        sys.path.remove("/root/repo/examples")
