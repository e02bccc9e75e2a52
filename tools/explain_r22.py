"""Dump `.explain("formatted")` for the round-22 target queries into
plans/r22/<query>_<tag>.txt. Usage: python tools/explain_r22.py <tag> [names...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_table_providers_spark.session import get_spark  # noqa: E402
from datafusion_table_providers_spark.suite import FULL_SUITE  # noqa: E402

DEFAULT = [
    "d13_decontaminate",
    "d22_editdist_neardup",
    "d35_ensemble_neardup",
    "b08_multi_join_q3",
    "p02_full_curation",
    "d16b_vector_compression",
    "c01_duckdb_scan_pushdown",
    "c02_duckdb_partitioned_scan",
]

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main():
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r22")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("explain_r22")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = FULL_SUITE[name].fn(spark, SF)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")


if __name__ == "__main__":
    main()
