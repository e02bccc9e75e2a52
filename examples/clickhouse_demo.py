"""ClickHouse factory demo — reference python/examples/clickhouse_demo.py.

No ClickHouse server ships here, so the demo exercises the no-server
surface: the parameterized-view relation rendering (the reference's
table-function argument tuples) and the dialect-correct SQL a scan would
push — backtick identifiers, ClickHouse literal escaping. Point the
params at a live server and ``get_table`` goes live with the same code.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from datafusion_table_providers_spark.core.expr import DIALECTS, build_select
from datafusion_table_providers_spark.factories import ClickHouseTableFactory


def main():
    factory = ClickHouseTableFactory(
        {"host": "localhost", "port": "8123", "db": "default", "user": "default"}
    )
    b = factory.backend
    print("compute context:", b.compute_context())

    # parameterized view args render as name(k = v, ...) with escaped
    # literals; argument NAMES are identifier-validated (injection guard)
    lit = b.dialect.literal
    args = {"from_date": "2024-01-01", "limit_n": 100}
    rendered = ", ".join(f"{k} = {lit(v)}" for k, v in args.items())
    print("parameterized view relation:", f"events_view({rendered})")

    d = DIALECTS["clickhouse"]
    sql = build_select(
        d,
        d.quote_ident("metrics"),
        columns=["ts", "value"],
        where=["`value` > 0.5"],
        limit=10,
    )
    print("pushed scan SQL:", sql)


if __name__ == "__main__":
    main()
