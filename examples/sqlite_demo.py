"""SQLite factory demo — reference python/examples/sqlite_demo.py on Spark."""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import sqlite3
import tempfile

from datafusion_table_providers_spark.factories import SqliteTableFactory
from datafusion_table_providers_spark.session import get_spark


def main():
    path = os.path.join(tempfile.mkdtemp(), "sqlite_example.db")
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE users (id INTEGER PRIMARY KEY, name TEXT)")
    con.executemany(
        "INSERT INTO users VALUES (?, ?)", [(1, "ada"), (2, "grace")]
    )
    con.commit()
    con.close()

    spark = get_spark("sqlite_demo")
    factory = SqliteTableFactory(path, "file", 3.0, None).with_session(spark)
    for t in factory.tables():
        print("Checking table:", t)
        factory.get_table(t).show()


if __name__ == "__main__":
    main()
