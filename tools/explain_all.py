"""Plan audit: print a one-line physical-plan summary per driver query —
exchange (shuffle) count, broadcast joins, codegen stages, pushed filters —
and flag smells (regex duplication, interpreted fallbacks).

Usage: python tools/explain_all.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from grower_spark.driver_queries import QUERIES
    from grower_spark.session import get_spark

    spark = get_spark("explain-all", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            print(f"{name:24s} ERROR {exc}")
            continue
        n_exchange = len(re.findall(r"Exchange (hash|range|RoundRobin|SinglePartition)", plan))
        n_broadcast = len(re.findall(r"BroadcastExchange", plan))
        n_wsc = len(set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)))
        n_regex = plan.count("regexp_replace")
        n_sort = len(re.findall(r"\bSort\b", plan))
        smells = []
        if n_regex > 1:
            smells.append(f"regex x{n_regex}")
        print(
            f"{name:24s} shuffles={n_exchange:2d} broadcasts={n_broadcast}"
            f" codegen_stages={n_wsc:2d} sorts={n_sort}"
            + ("  ⚠ " + ", ".join(smells) if smells else "")
        )
    spark.stop()


if __name__ == "__main__":
    main()
