"""Plan audit: print a one-line physical-plan summary per driver query —
exchange (shuffle) count, broadcast joins, codegen stages, pushed filters —
and flag smells (regex duplication, interpreted fallbacks).

Under AQE the pre-execution plan string is `AdaptiveSparkPlan
isFinalPlan=false` with NO codegen markers (stages are planned lazily), so
the audit EXECUTES each query (collect on the same QueryExecution) and reads
the final plan, where codegen shows as `*(n)` prefixes.  This also means
the reported shuffle/broadcast counts are AQE's *actual* runtime decisions,
not the static guess.

Barrier blind spot (r12 verdict item 5): queries that ``localCheckpoint``
internally truncate their visible lineage, so the top-level plan of e.g.
``dedup_edit_distance`` reads as a bare scan — 0 shuffles for the most
expensive rows.  The audit therefore installs a probe on
``DataFrame.localCheckpoint`` that reads each pre-barrier segment's plan
at checkpoint time and accumulates its counters; rows report them as a
``(pre-barrier ...)`` annotation.  Eager checkpoints are read after they
execute (AQE-final numbers); lazy ones are read at declaration time
(static Exchange counts — AQE may still coalesce at runtime).

Usage: python tools/explain_all.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_COUNTER_KEYS = ("shuffles", "broadcasts", "joins", "codegen_stages",
                 "regex_execs", "sorts")

# accumulates counters from plan segments hidden behind localCheckpoint
# barriers; reset per audited query by main()
BARRIER_STATS: dict = {k: 0 for k in _COUNTER_KEYS}
BARRIER_STATS["segments"] = 0


def _stats_from_plan(plan: str) -> dict:
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
    return _stats_from_plan(qe.executedPlan().toString())


def install_barrier_probe() -> None:
    """Patch ``DataFrame.localCheckpoint`` to accumulate each barrier
    segment's plan counters into ``BARRIER_STATS`` before truncation
    hides them.  Audit-process only — never imported by library code."""
    # pyspark 4.x: the runtime class is pyspark.sql.classic.dataframe.
    # DataFrame — patching the abstract pyspark.sql.DataFrame would
    # never fire because classic overrides the method
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:  # older pyspark: one concrete class
        from pyspark.sql import DataFrame

    if getattr(DataFrame.localCheckpoint, "_is_barrier_probe", False):
        return
    orig = DataFrame.localCheckpoint

    def probed(self, eager: bool = True, *args, **kwargs):
        res = orig(self, eager, *args, **kwargs)
        try:
            # for eager=True the checkpoint just executed, so this is the
            # AQE-final plan; for eager=False it is the static plan (the
            # segment runs later, after the audit's collect)
            seg = _stats_from_plan(
                self._jdf.queryExecution().executedPlan().toString()
            )
            for k in _COUNTER_KEYS:
                BARRIER_STATS[k] += seg[k]
            BARRIER_STATS["segments"] += 1
        except Exception:  # noqa: BLE001 — the probe must never break a run
            pass
        return res

    probed._is_barrier_probe = True  # type: ignore[attr-defined]
    DataFrame.localCheckpoint = probed


def reset_barrier_stats() -> dict:
    prev = dict(BARRIER_STATS)
    for k in BARRIER_STATS:
        BARRIER_STATS[k] = 0
    return prev


# accumulates counters from bounded "model, not data" fit collects that
# run at query-CONSTRUCTION time (tokenize_ids vocab, mixture schedule,
# embedding_quantize_int8 per-dim min/max): those jobs finish before the
# returned plan exists, so without this probe their shuffles are
# invisible — the collect-side twin of the localCheckpoint blind spot
FIT_STATS: dict = {k: 0 for k in _COUNTER_KEYS}
FIT_STATS["collects"] = 0
IN_CONSTRUCTION = {"flag": False}


def install_fit_probe() -> None:
    """Patch ``DataFrame.collect`` to accumulate plan counters for
    collects that fire while a query function is being CONSTRUCTED
    (IN_CONSTRUCTION set by main); the audit's own materializing collect
    runs outside the flag and is never counted."""
    try:
        from pyspark.sql.classic.dataframe import DataFrame
    except ImportError:
        from pyspark.sql import DataFrame

    if getattr(DataFrame.collect, "_is_fit_probe", False):
        return
    orig = DataFrame.collect

    def probed(self, *args, **kwargs):
        res = orig(self, *args, **kwargs)
        if IN_CONSTRUCTION["flag"]:
            try:
                seg = _stats_from_plan(
                    self._jdf.queryExecution().executedPlan().toString()
                )
                for k in _COUNTER_KEYS:
                    FIT_STATS[k] += seg[k]
                FIT_STATS["collects"] += 1
            except Exception:  # noqa: BLE001 — never break a run
                pass
        return res

    probed._is_fit_probe = True  # type: ignore[attr-defined]
    DataFrame.collect = probed


def reset_fit_stats() -> None:
    for k in FIT_STATS:
        FIT_STATS[k] = 0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from grower_spark.driver_queries import QUERIES
    from grower_spark.session import get_spark

    spark = get_spark("explain-all", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    install_barrier_probe()
    install_fit_probe()

    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        reset_barrier_stats()
        reset_fit_stats()
        try:
            # barriers fire both at query-construction time (eager
            # checkpoints inside fn) and during plan_stats' collect
            # (lazy ones) — both accumulate into BARRIER_STATS.  Fit
            # collects only fire during construction, so the flag wraps
            # fn() alone (plan_stats' collect stays uncounted).
            IN_CONSTRUCTION["flag"] = True
            try:
                df = fn(spark, sf_dir)
            finally:
                IN_CONSTRUCTION["flag"] = False
            stats = plan_stats(df)
        except Exception as exc:
            print(f"{name:24s} ERROR {exc}")
            continue
        bar = dict(BARRIER_STATS)
        smells = []
        if stats["regex_execs"] + bar["regex_execs"] > 1:
            smells.append(f"regex x{stats['regex_execs'] + bar['regex_execs']}")
        if stats["codegen_stages"] == 0 and bar["codegen_stages"] == 0:
            smells.append("no codegen (interpreted?)")
        if not stats["is_final"]:
            smells.append("plan not final")
        barrier_note = ""
        if bar["segments"]:
            barrier_note = (
                f"  (pre-barrier: {bar['segments']} segments"
                f" shuffles={bar['shuffles']}"
                f" broadcasts={bar['broadcasts']}"
                f" joins={bar['joins']}"
                f" codegen={bar['codegen_stages']})"
            )
        if FIT_STATS["collects"]:
            barrier_note += (
                f"  (fit-collect: {FIT_STATS['collects']} jobs"
                f" shuffles={FIT_STATS['shuffles']}"
                f" broadcasts={FIT_STATS['broadcasts']}"
                f" codegen={FIT_STATS['codegen_stages']})"
            )
        print(
            f"{name:24s} shuffles={stats['shuffles']:2d}"
            f" broadcasts={stats['broadcasts']}"
            f" codegen_stages={stats['codegen_stages']:2d}"
            f" sorts={stats['sorts']}"
            + barrier_note
            + ("  ⚠ " + ", ".join(smells) if smells else "")
        )
    spark.stop()


if __name__ == "__main__":
    main()
