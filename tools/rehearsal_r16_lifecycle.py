"""r16 lifecycle rehearsal: price the deletion and rebuild halves of the
persisted ANN index (operators/ann_index.py) across corpus scale — the
claims the r16 operators make, measured:

1. ``delete_sec`` — tombstoning a FIXED 500-id batch must cost the same
   against a ×1 index as against a ×300 index: the delete writes ids +
   params only, no codes touch (work ∝ batch, the append discipline).
2. ``query_clean_sec`` vs ``query_tombstoned_sec`` — the serving cost
   of a small (500-row) tombstone set on the flat code-tier top-k: one
   anti-join whose build side is the tombstone table.  The overhead
   must stay a bounded additive term, not scale faster than the codes
   scan itself.
3. ``query_tomb10pct_sec`` — the same query with 10% of the corpus
   tombstoned: the realistic between-rebuilds worst case (a dedup pass
   retiring a tenth of the corpus).  Still bounded: the anti-join's
   build side grows with the tombstone set, the probe side is the same
   codes scan.
4. ``rebuild_sec`` vs ``build_sec`` — the compaction event: a rebuild
   after an append + the 10% deletion must cost ~one fresh build (fit +
   encode + partitioned write over the survivors), because that is
   exactly what it is (pinned hash-identical in tests).  Also recorded:
   ``files_before_rebuild`` / ``files_after_rebuild`` (the append
   fragments the layout; rebuild restores the files_per_cell bound)
   and ``query_after_rebuild_sec`` (back to clean-query cost — the
   anti-join is gone with the tombstones).

Method matches rehearsal_r15_index.py: jittered corpus replicas written
to parquet first (replica 0 verbatim), per-variant untimed warm call,
medians of --repeats timed runs, loadavg stamped.  Output:
scale_rehearsal_r16_lifecycle.json.

Usage: python tools/rehearsal_r16_lifecycle.py [--factors 1,30,300]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from grower_spark.session import get_spark  # noqa: E402

N_QUERIES = 8
K = 10
SF_DIR = os.environ.get("SPARK_GRAFT_REHEARSAL_SF", "/root/testdata/sf0.01")


def _scaled_corpus(spark, factor: int, path: str) -> None:
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    n = emb.count()
    parts = [emb.select("vec_id", "embedding")]
    for r in range(1, factor):
        parts.append(
            emb.select(
                (F.col("vec_id") + r * n).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x, i: x + F.lit(r * 0.001) * F.cos(i.cast("double")),
                ).alias("embedding"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.repartition(max(4, 4 * factor)).write.mode("overwrite").parquet(path)


def _median(xs: list[float]) -> float:
    return sorted(xs)[len(xs) // 2]


def _count_code_files(idx_path: str) -> int:
    from grower_spark.operators.ann_index import codes_dir
    return len(glob.glob(os.path.join(codes_dir(idx_path), "**", "*.parquet"),
                         recursive=True))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,30,300")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]

    from grower_spark.operators.ann_index import (
        ann_index_int8_topk,
        append_ann_index,
        build_ann_index,
        delete_from_ann_index,
        rebuild_ann_index,
    )

    spark = get_spark("r16-lifecycle-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    work = tempfile.mkdtemp(prefix="r16life_")
    out = {
        "what": "index deletion/rebuild lifecycle cost vs corpus scale",
        "sf_base": SF_DIR,
        "repeats": args.repeats,
        "loadavg_before": [round(x, 2) for x in os.getloadavg()],
        "legs": [],
    }
    try:
        for factor in factors:
            corpus_path = os.path.join(work, f"corpus_x{factor}")
            _scaled_corpus(spark, factor, corpus_path)
            emb = spark.read.parquet(corpus_path)
            q = emb.where(F.col("vec_id") < N_QUERIES).select(
                F.col("vec_id").alias("qid"),
                F.col("embedding").alias("qvec"),
            )
            idx_path = os.path.join(work, f"idx_x{factor}")
            fpc = max(1, (4 * factor) // 16)
            t0 = time.time()
            params = build_ann_index(emb, idx_path, n_cells=16,
                                     files_per_cell=fpc)
            build_sec = time.time() - t0
            n_rows = params["n_rows"]

            def _timed(fn, warm=True, repeats=None):
                if warm:
                    fn()
                runs = []
                for _ in range(repeats or args.repeats):
                    t = time.time()
                    fn()
                    runs.append(time.time() - t)
                return runs

            def _query():
                ann_index_int8_topk(spark, idx_path, q, k=K).collect()

            clean = _timed(_query)

            # fixed 500-id delete batch (ids synthesized, not scanned:
            # the production caller hands over a dedup pass's id list)
            def _mk_ids(base):
                return spark.range(500).select(
                    (F.col("id") * 37 + base).alias("vec_id"))

            dels = []
            for i in range(args.repeats):
                t0 = time.time()
                delete_from_ann_index(spark, idx_path,
                                      _mk_ids(20_000_000 + i))
                dels.append(time.time() - t0)
            # one real 500-row tombstone batch (in-corpus ids) for the
            # serving-overhead probe
            delete_from_ann_index(
                spark, idx_path,
                spark.range(500).select(
                    (F.col("id") * 7 + 100).alias("vec_id")),
            )
            tomb_small = _timed(_query)

            # grow the tombstones to ~10% of the corpus
            ten_pct = max(1, n_rows // 10)
            delete_from_ann_index(
                spark, idx_path,
                emb.where(F.col("vec_id") % 10 == 3)
                .select("vec_id").limit(ten_pct),
            )
            tomb_big = _timed(_query)

            # an append (fragments the layout), then the rebuild event
            append_ann_index(
                spark.read.parquet(
                    os.path.join(SF_DIR, "embeddings.parquet")
                ).select(
                    (F.col("vec_id") + 50_000_000).alias("vec_id"),
                    "embedding",
                ),
                idx_path, files_per_cell=fpc,
            )
            files_before = _count_code_files(idx_path)
            union = emb.unionByName(
                spark.read.parquet(
                    os.path.join(SF_DIR, "embeddings.parquet")
                ).select(
                    (F.col("vec_id") + 50_000_000).alias("vec_id"),
                    "embedding",
                )
            )
            t0 = time.time()
            rb = rebuild_ann_index(union, idx_path, files_per_cell=fpc)
            rebuild_sec = time.time() - t0
            files_after = _count_code_files(idx_path)
            after = _timed(_query)

            out["legs"].append({
                "factor": factor,
                "corpus_rows": n_rows,
                "build_sec": round(build_sec, 2),
                "delete_500_sec": round(_median(dels), 2),
                "delete_500_runs": [round(x, 2) for x in dels],
                "query_clean_sec": round(_median(clean), 2),
                "query_tombstoned_sec": round(_median(tomb_small), 2),
                "query_tomb10pct_sec": round(_median(tomb_big), 2),
                "rebuild_sec": round(rebuild_sec, 2),
                "rebuild_rows": rb["n_rows"],
                "files_before_rebuild": files_before,
                "files_after_rebuild": files_after,
                "query_after_rebuild_sec": round(_median(after), 2),
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            })
            print(json.dumps(out["legs"][-1]))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scale_rehearsal_r16_lifecycle.json",
    )
    with open(dest, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print("wrote", dest)
    return 0


if __name__ == "__main__":
    sys.exit(main())
