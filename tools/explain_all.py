"""Plan audit: print a one-line physical-plan summary per driver query —
exchange (shuffle) count, broadcast joins, codegen stages, pushed filters —
and flag smells (regex duplication, interpreted fallbacks).

Under AQE the pre-execution plan string is `AdaptiveSparkPlan
isFinalPlan=false` with NO codegen markers (stages are planned lazily), so
the audit EXECUTES each query (collect on the same QueryExecution) and reads
the final plan, where codegen shows as `*(n)` prefixes.  This also means
the reported shuffle/broadcast counts are AQE's *actual* runtime decisions,
not the static guess.

Usage: python tools/explain_all.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_stats(df, execute: bool = True) -> dict:
    """Summary counters for a DataFrame's physical plan.

    With ``execute=True`` (default) the query is run first so AQE's final
    plan is inspected; codegen stage ids appear as ``*(n)`` there.  The
    pre-execution string has zero codegen markers under AQE — counting it
    would silently report 0 for every query (round-1 verdict bug).
    """
    qe = df._jdf.queryExecution()
    if execute:
        df.collect()
    plan = qe.executedPlan().toString()
    # An executed AdaptiveSparkPlan prints "== Final Plan ==" AND
    # "== Initial Plan ==" sections; counting the whole string would
    # double-count every node.  Keep only the final section.
    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==")[0]
    codegen_ids = set(re.findall(r"WholeStageCodegen \((\d+)\)", plan)) | set(
        re.findall(r"\*\((\d+)\)", plan)
    )
    return {
        "shuffles": len(
            re.findall(r"Exchange (hash|range|RoundRobin|SinglePartition)", plan)
        ),
        "broadcasts": len(re.findall(r"BroadcastExchange", plan)),
        "joins": len(
            re.findall(
                r"SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin"
                r"|BroadcastNestedLoopJoin|CartesianProduct",
                plan,
            )
        ),
        "codegen_stages": len(codegen_ids),
        "regex_execs": plan.count("regexp_replace"),
        "sorts": len(re.findall(r"\bSort \[", plan)),
        "is_final": "isFinalPlan=true" in plan or "AdaptiveSparkPlan" not in plan,
    }


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
            stats = plan_stats(fn(spark, sf_dir))
        except Exception as exc:
            print(f"{name:24s} ERROR {exc}")
            continue
        smells = []
        if stats["regex_execs"] > 1:
            smells.append(f"regex x{stats['regex_execs']}")
        if stats["codegen_stages"] == 0:
            smells.append("no codegen (interpreted?)")
        if not stats["is_final"]:
            smells.append("plan not final")
        print(
            f"{name:24s} shuffles={stats['shuffles']:2d}"
            f" broadcasts={stats['broadcasts']}"
            f" codegen_stages={stats['codegen_stages']:2d}"
            f" sorts={stats['sorts']}"
            + ("  ⚠ " + ", ".join(smells) if smells else "")
        )
    spark.stop()


if __name__ == "__main__":
    main()
