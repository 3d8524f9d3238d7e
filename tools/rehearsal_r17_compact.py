"""r17 lifecycle rehearsal: price the two new lifecycle mechanics and
re-measure what r17 changed about the old ones, across corpus scale.

1. ``delete_500_sec`` — RE-MEASURED: r17's delete semi-joins the batch
   against the indexed vec_ids (the accounting fix — never-indexed ids
   must add zero rebuild signal), so delete cost is no longer
   metadata-flat: it now includes one pruned single-column scan of the
   codes table.  The claim to verify is "grows like a column scan,
   stays id-sized on the write side", not "flat" (SCALE.md updated to
   match the measurement).
2. ``compact_sec`` vs ``rebuild_sec`` vs ``build_sec`` — the new
   float-free repair against the full event it replaces when only the
   deleted-fraction trigger fires.  Compact = one codes scan + one
   clustered write (no fit collect, no float I/O); it should price
   BELOW a rebuild and the gap should grow with corpus scale (the
   rebuild re-reads the float corpus and re-runs the fit+encode).
3. ``files_before/after_compact`` + ``query_after_compact_sec`` — the
   layout bound restored and the anti-join gone without a rebuild.
4. ``append_plain_sec`` vs ``append_epoch_sec`` — the exactly-once
   staging protocol's overhead on the same batch (stage write + file
   moves + scrub probe vs a direct append).  Must be a bounded additive
   cost, not a multiple.

Method matches rehearsal_r16_lifecycle.py: jittered corpus replicas
written to parquet first, per-variant untimed warm call, medians of
--repeats timed runs, loadavg stamped.  Output:
scale_rehearsal_r17_compact.json.

Usage: python tools/rehearsal_r17_compact.py [--factors 1,30,300]
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
        compact_ann_index,
        delete_from_ann_index,
        rebuild_ann_index,
    )

    spark = get_spark("r17-compact-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000).selectExpr("sum(id)").collect()

    work = tempfile.mkdtemp(prefix="r17compact_")
    out = {
        "what": "compact-vs-rebuild pricing + semi-joined delete cost "
                "+ exactly-once append overhead vs corpus scale",
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

            def _timed(fn, repeats=None):
                fn()  # warm
                runs = []
                for _ in range(repeats or args.repeats):
                    t = time.time()
                    fn()
                    runs.append(time.time() - t)
                return runs

            def _query():
                ann_index_int8_topk(spark, idx_path, q, k=K).collect()

            clean = _timed(_query)

            # append overhead: identical synthetic batches, plain vs
            # epoch-staged (each lands rows; totals stay small vs corpus)
            base_emb = spark.read.parquet(
                os.path.join(SF_DIR, "embeddings.parquet"))

            def _batch(off):
                return base_emb.select(
                    (F.col("vec_id") + off).alias("vec_id"), "embedding")

            plain_runs, epoch_runs = [], []
            for i in range(args.repeats):
                t0 = time.time()
                append_ann_index(_batch(60_000_000 + i * 1000), idx_path,
                                 files_per_cell=fpc)
                plain_runs.append(time.time() - t0)
            for i in range(args.repeats):
                t0 = time.time()
                append_ann_index(_batch(70_000_000 + i * 1000), idx_path,
                                 files_per_cell=fpc,
                                 epoch=(f"rehearsal-x{factor}", i))
                epoch_runs.append(time.time() - t0)

            # in-corpus 500-id delete batches (they actually tombstone
            # under the r17 semi-join; cost now includes the vec_id
            # column scan of the codes table)
            dels = []
            for i in range(args.repeats):
                t0 = time.time()
                delete_from_ann_index(
                    spark, idx_path,
                    spark.range(500).select(
                        (F.col("id") * 7 + 100 + i * 4000).alias("vec_id")),
                )
                dels.append(time.time() - t0)

            # grow deletions to ~10% of the corpus, then the two repairs
            ten_pct = max(1, n_rows // 10)
            delete_from_ann_index(
                spark, idx_path,
                emb.where(F.col("vec_id") % 10 == 3)
                .select("vec_id").limit(ten_pct),
            )
            files_before = _count_code_files(idx_path)
            t0 = time.time()
            cp = compact_ann_index(spark, idx_path, files_per_cell=fpc)
            compact_sec = time.time() - t0
            files_after = _count_code_files(idx_path)
            after_compact = _timed(_query)

            # rebuild on the SAME post-compact index for an apples
            # comparison of the full event (fit + encode over floats)
            t0 = time.time()
            rb = rebuild_ann_index(emb, idx_path, files_per_cell=fpc)
            rebuild_sec = time.time() - t0

            out["legs"].append({
                "factor": factor,
                "corpus_rows": n_rows,
                "build_sec": round(build_sec, 2),
                "append_plain_sec": round(_median(plain_runs), 2),
                "append_epoch_sec": round(_median(epoch_runs), 2),
                "delete_500_sec": round(_median(dels), 2),
                "delete_500_runs": [round(x, 2) for x in dels],
                "query_clean_sec": round(_median(clean), 2),
                "compact_sec": round(compact_sec, 2),
                "compact_rows": cp["n_rows"],
                "files_before_compact": files_before,
                "files_after_compact": files_after,
                "query_after_compact_sec": round(_median(after_compact), 2),
                "rebuild_sec": round(rebuild_sec, 2),
                "rebuild_rows": rb["n_rows"],
                "loadavg": [round(x, 2) for x in os.getloadavg()],
            })
            print(json.dumps(out["legs"][-1]))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    dest = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scale_rehearsal_r17_compact.json",
    )
    with open(dest, "w") as f:
        json.dump(out, f, indent=2)
        f.write("\n")
    print("wrote", dest)
    return 0


if __name__ == "__main__":
    sys.exit(main())
