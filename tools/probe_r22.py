"""Focused wall-clock probe for the round-22 target operators.

Usage: python tools/probe_r22.py <sf_dir> [names...] [--runs N]
Times fn(spark, sf_dir).count() steady-state (best of N, default 2).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datafusion_table_providers_spark.core.memo import clear_memo_caches  # noqa: E402
from datafusion_table_providers_spark.session import get_spark  # noqa: E402
from datafusion_table_providers_spark.suite import FULL_SUITE  # noqa: E402

DEFAULT = ["d13_decontaminate", "d22_editdist_neardup", "d35_ensemble_neardup", "p02_full_curation"]


def main():
    args = [a for a in sys.argv[1:]]
    runs = 2
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/repo/.sf1"
    names = args[1:] or DEFAULT
    spark = get_spark("probe_r22")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        fn = FULL_SUITE[name].fn
        best, n = None, 0
        times = []
        for _ in range(runs):
            clear_memo_caches()
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            el = time.time() - t0
            times.append(el)
            best = el if best is None or el < best else best
        print(f"{name}: best {best:.2f}s of {['%.2f' % t for t in times]} ({n} rows)", flush=True)


if __name__ == "__main__":
    main()
