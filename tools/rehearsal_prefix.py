"""Round-11 rehearsal leg: prefix_dedup on a duplicate-DENSE corpus whose
duplicate-group table grows with the corpus — the exact shape where the
pre-r11 forced ``F.broadcast(groups)`` was a driver-OOM scale-killer
(VERDICT r10 item 1).

Corpus: n docs, every leading-token prefix shared by exactly 2 docs, so
the duplicate-group table holds n/2 rows — at x16 (8M docs) that is 4M
groups (~100 MB+ as an in-driver broadcast relation), far past any sane
``autoBroadcastJoinThreshold``; a forced hint would build it anyway.

Measured per factor: the WINDOW rewrite's wall + shuffle bytes/records
(expect ~linear in n, zero broadcast), and at the smaller factors the old
broadcast-back plan for comparison (its wall hides the real hazard —
driver heap — so we also record the group count it would broadcast).

Usage: python tools/rehearsal_prefix.py --out scale_rehearsal_r11_prefix.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def _shuffle_totals(app_url: str) -> tuple[int, int]:
    import urllib.request

    with urllib.request.urlopen(f"{app_url}/stages?status=complete") as r:
        stages = json.load(r)
    return (
        sum(s.get("shuffleWriteBytes", 0) for s in stages),
        sum(s.get("shuffleWriteRecords", 0) for s in stages),
    )


def _app_url(spark) -> str:
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    return f"{ui}/api/v1/applications/{app_id}"


def corpus(spark, n_docs: int, n_parts: int = 32):
    """Every prefix group has exactly 2 members: doc i and doc i + n/2
    share the 4-token opening; tails differ."""
    half = n_docs // 2
    return spark.range(0, n_docs, 1, n_parts).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("form letter variant "),
            (F.col("id") % half).cast("string"),
            F.lit(" opening line unique tail "),
            F.col("id").cast("string"),
        ).alias("text"),
    )


def old_broadcast_plan(df, n_tokens: int = 4):
    """The pre-r11 plan, kept here ONLY as the rehearsal comparison."""
    from grower_spark.functions.hashing import md5_60

    prefix = F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, n_tokens))
    keyed = df.select(F.col("doc_id"), md5_60(prefix).alias("prefix_h60"))
    groups = (
        keyed.groupBy("prefix_h60")
        .agg(F.min("doc_id").alias("_keep_id"), F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") >= 2)
    )
    return keyed.join(F.broadcast(groups), "prefix_h60", "left").select(
        "doc_id", "prefix_h60",
        F.coalesce(F.col("_n"), F.lit(1)).cast("long").alias("n_same_prefix"),
        F.when(
            F.col("_keep_id").isNull() | (F.col("_keep_id") == F.col("doc_id")),
            1,
        ).otherwise(0).cast("int").alias("keep"),
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--base-docs", type=int, default=500_000)
    ap.add_argument("--factors", default="1,4,16")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--old-plan-max-factor", type=int, default=4,
                    help="run the old broadcast plan only up to this "
                         "factor (its hazard is driver heap)")
    args = ap.parse_args()

    from tools.scale_rehearsal import _session

    from grower_spark.operators.dedup import prefix_dedup

    # _session, not session.get_spark: the REST shuffle metrics need
    # spark.ui.enabled, which the library session deliberately turns off
    spark = _session("rehearsal-prefix", ui=True)
    spark.sparkContext.setLogLevel("ERROR")
    app = _app_url(spark)

    results: dict = {"base_docs": args.base_docs, "factors": {}}
    for factor in [int(x) for x in args.factors.split(",")]:
        n = args.base_docs * factor
        docs = corpus(spark, n).localCheckpoint(eager=True)
        n_groups = n // 2
        entry: dict = {"n_docs": n, "n_dup_groups": n_groups, "ops": {}}
        plans = {"window": lambda d: prefix_dedup(d, n_tokens=4)}
        if factor <= args.old_plan_max_factor:
            plans["old_broadcast"] = old_broadcast_plan
        for name, fn in plans.items():
            fn(docs).agg(F.sum("keep")).collect()  # warm
            walls, sb0, sr0 = [], *_shuffle_totals(app)
            for _ in range(args.runs):
                t0 = time.time()
                got = fn(docs).agg(
                    F.sum("keep").alias("k"), F.count(F.lit(1)).alias("n")
                ).collect()[0]
                walls.append(round(time.time() - t0, 3))
                assert got["k"] == n_groups and got["n"] == n, got
            sb1, sr1 = _shuffle_totals(app)
            entry["ops"][name] = {
                "wall_median": sorted(walls)[len(walls) // 2],
                "walls": walls,
                "shuffle_bytes_per_run": (sb1 - sb0) // args.runs,
                "shuffle_records_per_run": (sr1 - sr0) // args.runs,
            }
            print(f"x{factor} {name}: {entry['ops'][name]}")
        results["factors"][f"x{factor}"] = entry
        docs.unpersist()
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
        f.write("\n")
    print(f"wrote {args.out}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
