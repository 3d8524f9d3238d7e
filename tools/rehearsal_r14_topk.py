"""r14 top-k window rehearsal: prove the two-level partial top-k
(operators/similarity.py::_partial_topk, r13 verdict item 2) re-bases the
final rank window's reducer input from input-partitions x k (grows with
the corpus) to shuffle-partitions x k (a config constant).

Honest framing of what the fix changes: Spark already inserts a partial
``WindowGroupLimit`` map-side for a rank-filter window (SPARK-37099), so
the pre-r14 single-window plan was NOT sorting the raw N x Q stream per
reducer — its reducer input was already input-partitions x k.  But that
bound still GROWS with the corpus (more input splits => more rows per
reducer) and lands on at most n_queries reducer tasks no matter the
cluster size.  The two-level scheme spreads stage 1 over
min(shuffle.partitions, keys x partitions) tasks and caps the final
stage at (stage-1 reducer partitions) x k per query — flat in corpus
size.

Method: jittered replicas of the sf0.1 embeddings table at x1/x10/x100
(replica 0 verbatim so the qid<8 query panel is scale-invariant), input
repartitioned to 4 x factor splits so input-partition growth — the thing
that inflates the old bound — actually happens at local scale.  For each
factor run BOTH variants (current ann_int8_topk; the pre-r14
single-window shape) and read, from the Spark REST API, the max
per-task shuffle-read records of the job's FINAL window stage (the
reducer input the verdict's 'Done' criterion names).  Output: one JSON
document (scale_rehearsal_r14_topk.json).

Usage: python tools/rehearsal_r14_topk.py [--factors 1,10,100]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402
from pyspark.sql import SparkSession, Window  # noqa: E402

N_QUERIES = 8
K = 10


def _session() -> SparkSession:
    # UI on for REST task metrics (the library session turns it off)
    return (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .appName("r14-topk-rehearsal")
        .config("spark.sql.shuffle.partitions", "32")
        # coalescing is a small-data artifact: at rehearsal volumes AQE
        # folds every reducer into one task and hides the task-width
        # difference the rehearsal exists to measure; a 100 TB run keeps
        # its reducer width
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.ui.enabled", "true")
        .config("spark.ui.port", "4049")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )


def _app_url(spark) -> str:
    app_id = spark.sparkContext.applicationId
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
    return f"http://localhost:{port}/api/v1/applications/{app_id}"


def _get(url: str):
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def _stage_ids(app_url: str) -> set:
    return {s["stageId"] for s in _get(f"{app_url}/stages")}


def _reading_stages(app_url: str, new_ids: set) -> list:
    """Every new COMPLETE stage that shuffle-reads: aggregate records +
    MAX-task records + active task count.  The highest stageId is the
    job's final window stage — the reducer input the verdict's 'Done'
    criterion names."""
    out = []
    for s in _get(f"{app_url}/stages"):
        if s["stageId"] not in new_ids or s.get("status") != "COMPLETE":
            continue
        if not s.get("shuffleReadRecords"):
            continue
        try:
            summ = _get(
                f"{app_url}/stages/{s['stageId']}/0/taskSummary"
                "?quantiles=0.0,0.5,1.0")
            mx = int(summ["shuffleReadMetrics"]["readRecords"][-1])
        except Exception:
            mx = -1  # summary endpoint unavailable: aggregate only
        out.append({
            "stageId": s["stageId"],
            "stage_read_records": int(s["shuffleReadRecords"]),
            "max_task_read_records": mx,
            "n_tasks": s.get("numCompleteTasks"),
        })
    return sorted(out, key=lambda x: x["stageId"])


def _single_window_int8_topk(emb, n_queries=N_QUERIES, k=K):
    """The pre-r14 shape: one global rank window (Spark's own partial
    WindowGroupLimit still applies map-side — this is the honest
    baseline, not a strawman)."""
    from grower_spark.operators.diversity import quantized_codes

    half = 254 // 2
    codes = quantized_codes(emb).where(
        F.size("_codes") == F.size("_mn")
    ).select(F.col("vec_id"), F.col("_codes").alias("codes"))
    queries = codes.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("qid"), F.col("codes").alias("qcodes"))
    pairs = codes.crossJoin(F.broadcast(queries)).where(
        F.col("vec_id") != F.col("qid"))
    dot = F.expr(
        f"aggregate(zip_with(codes, qcodes, "
        f"(c, q) -> (c - {half}L) * (q - {half}L)), 0L, (a, v) -> a + v)")
    scored = pairs.select("qid", "vec_id", dot.alias("dot"))
    w = Window.partitionBy("qid").orderBy(F.desc("dot"), F.asc("vec_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k).select("qid", "vec_id", "rank", "dot"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,10,100")
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    factors = [int(f) for f in args.factors.split(",")]

    from grower_spark.operators.similarity import ann_int8_topk

    spark = _session()
    app_url = _app_url(spark)
    base = spark.read.parquet(os.path.join(args.base,
                                           "embeddings.parquet"))
    n_base = base.count()
    out = {"metric": "r14_topk_reducer_bound", "base_rows": n_base,
           "k": K, "n_queries": N_QUERIES,
           "shuffle_partitions": 32, "legs": []}
    for f in factors:
        # replica 0 verbatim (keeps the qid<8 panel identical across
        # factors); replicas r>0 get offset ids + deterministic jitter so
        # they are near- but not exact duplicates
        grown = (
            base.withColumn("r", F.explode(F.sequence(F.lit(0),
                                                      F.lit(f - 1))))
            .select(
                (F.col("vec_id") + F.col("r") * n_base).alias("vec_id"),
                F.when(F.col("r") == 0, F.col("embedding")).otherwise(
                    F.transform(
                        "embedding",
                        lambda x, i: x + (
                            F.xxhash64(F.col("vec_id"), F.col("r"), i)
                            % 1000).cast("double") / 1e6,
                    )
                ).alias("embedding"),
            )
            .repartition(4 * f)
            .localCheckpoint(eager=True)  # isolate gen cost from the runs
        )
        n_parts = grown.rdd.getNumPartitions()
        for variant, fn in (
            ("two_level", lambda d: ann_int8_topk(d, N_QUERIES, K)),
            ("single_window", _single_window_int8_topk),
        ):
            before = _stage_ids(app_url)
            t0 = time.time()
            n_out = len(fn(grown).collect())
            wall = round(time.time() - t0, 2)
            time.sleep(0.5)  # let the UI ingest task metrics
            stages = _reading_stages(app_url,
                                     _stage_ids(app_url) - before)
            final = stages[-1] if stages else {}
            out["legs"].append({
                "factor": f, "rows": n_base * f,
                "input_partitions": n_parts, "variant": variant,
                "rows_out": n_out, "wall_sec": wall,
                "final_stage": final, "reading_stages": stages,
            })
            print(json.dumps(out["legs"][-1]), file=sys.stderr)
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
