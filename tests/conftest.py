import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    from datafusion_table_providers_spark.session import get_spark

    spark = get_spark("tests")
    spark.sparkContext.setLogLevel("ERROR")
    yield spark


@pytest.fixture()
def tmp_duckdb(tmp_path):
    from datafusion_table_providers_spark.sources.backends import DuckDBBackend

    return DuckDBBackend(str(tmp_path / "t.duckdb"))


@pytest.fixture()
def tmp_sqlite(tmp_path):
    from datafusion_table_providers_spark.sources.backends import SQLiteBackend

    return SQLiteBackend(str(tmp_path / "t.db"))
