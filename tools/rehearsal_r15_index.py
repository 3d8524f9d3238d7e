"""r15 index/query-split rehearsal: prove the persisted ANN index
(operators/ann_index.py, r14 verdict item 2) makes query-path cost
independent of index-build cost — and that the one-shot family it
replaces re-pays the build on EVERY call.

Claims measured, per corpus scale factor:

1. ``build_sec`` — one-time cost of ``build_ann_index`` (fit collect +
   encode + argmax cell + partitioned write).  Grows with the corpus;
   paid once.
2. ``query_prebuilt_sec`` — median of repeated ``ann_index_int8_topk``
   calls against the PREBUILT index.  Pays no corpus fit/encode: its
   corpus-side work is the stored-code scan plus an 8-row panel encode
   against the stored fit.
3. ``query_oneshot_sec`` — median of repeated ``ann_int8_topk``
   calls: the IDENTICAL-OUTPUT one-shot twin of the flat index query
   (same contract, pinned in tests), which re-runs the fit collect and
   re-encodes the whole corpus on every call.
4. ``query_rerank_sec`` — the composed three-stage retrieval over the
   prebuilt index, for reference (it does strictly more work than the
   flat pair: float rerank tier on top).
5. ``append_sec`` — appending one base-sized batch to the leg's index:
   the never-reprocess-old-rows contract, measured — the cost must
   track the BATCH size across legs, flat in the index size (old rows
   are untouched by design).

Plus the scan-level decomposition that isolates exactly what the index
amortizes (end-to-end medians at local scale carry ~2 s of constant
top-k window/AQE machinery and a query-panel corpus scan that mask it):
``fit_sec`` (the per-call fit job the one-shot re-pays),
``encode_scan_sec`` (float scan + re-encode + code fold — the one-shot
corpus pass), ``codes_scan_sec`` (stored-code scan + identical fold —
the prebuilt corpus pass).  The split's claim is
``fit_sec + (encode_scan_sec - codes_scan_sec)`` — work paid per call
before, once at build now — GROWS with the corpus, while the prebuilt
query path's own corpus-side cost is the codes scan alone.

Method: jittered replicas of the sf0.01 embeddings at the given
factors (replica 0 verbatim so the qid<8 panel is scale-invariant),
written to parquet first so every variant reads the same on-disk
corpus; per-leg untimed warm call of each variant so JIT lands outside
the medians.  Output: one JSON doc (scale_rehearsal_r15_index.json).

Usage: python tools/rehearsal_r15_index.py [--factors 1,10,100]
"""

from __future__ import annotations

import argparse
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
M = 40
N_PROBE = 2
SF_DIR = os.environ.get("SPARK_GRAFT_REHEARSAL_SF", "/root/testdata/sf0.01")


def _scaled_corpus(spark, factor: int, path: str) -> None:
    """Replicas 1..factor-1 jitter vec_id into fresh id space and nudge
    the vector (deterministic per replica) so dedupe-free uniform growth;
    replica 0 is verbatim so the query panel rows exist unchanged."""
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


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,10,100")
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]

    from grower_spark.operators.ann_index import (
        ann_index_int8_topk,
        ann_index_ivf_rerank,
        build_ann_index,
    )
    from grower_spark.operators.similarity import ann_int8_topk

    spark = get_spark("r15-index-rehearsal")
    spark.sparkContext.setLogLevel("ERROR")
    # JIT warm so leg 1 doesn't carry the cold start
    spark.range(1000).selectExpr("sum(id)").collect()

    work = tempfile.mkdtemp(prefix="r15idx_")
    out = {
        "what": "persisted-index query cost vs one-shot re-fit cost",
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
            # match the corpus's file granularity (4*factor files) so the
            # two scans get the same split-packing parallelism and the
            # comparison isolates fit/encode savings + scan density —
            # the first x300 run showed a 16-file index packed into ONE
            # split losing to a 1200-file corpus packed into ~37 (local
            # openCostInBytes packing; at cluster scale both sides are
            # 128 MiB-file tables and the asymmetry does not exist)
            fpc = max(1, (4 * factor) // 16)
            t0 = time.time()
            params = build_ann_index(emb, idx_path, n_cells=16,
                                     files_per_cell=fpc)
            build_sec = time.time() - t0

            def _prebuilt():
                return ann_index_int8_topk(spark, idx_path, q, k=K)

            def _oneshot():
                return ann_int8_topk(emb, n_queries=N_QUERIES, k=K)

            def _rerank():
                return ann_index_ivf_rerank(
                    spark, idx_path, emb, q, m=M, k=K, n_probe=N_PROBE)

            # scan-level decomposition probes (identical fold on both
            # sides so only fit/encode-vs-stored differs)
            from grower_spark.operators.ann_index import load_ann_index
            from grower_spark.operators.diversity import quantize_fit
            from grower_spark.operators.similarity import _int8_code_corpus

            codes_df = load_ann_index(spark, idx_path)[0]
            fold = "aggregate({}, 0L, (a, v) -> a + v)"

            def _codes_scan():
                return codes_df.select(
                    F.expr(fold.format("codes")).alias("s")
                ).agg(F.sum("s"))

            def _encode_scan():
                return _int8_code_corpus(
                    emb, "vec_id", "embedding", 254
                ).select(F.expr(fold.format("_codes")).alias("s")) \
                    .agg(F.sum("s"))

            # untimed warm call per variant: JIT/codegen outside medians
            for fn in (_prebuilt, _oneshot, _rerank, _codes_scan,
                       _encode_scan):
                fn().collect()
            quantize_fit(emb)
            pre, oneshot, rerank = [], [], []
            cscan, escan, fits = [], [], []
            for runs, fn in ((pre, _prebuilt), (oneshot, _oneshot),
                             (rerank, _rerank), (cscan, _codes_scan),
                             (escan, _encode_scan)):
                for _ in range(args.repeats):
                    t0 = time.time()
                    fn().collect()
                    runs.append(time.time() - t0)
            for _ in range(args.repeats):
                t0 = time.time()
                quantize_fit(emb)
                fits.append(time.time() - t0)
            leg = {
                "factor": factor,
                "corpus_rows": params["n_rows"],
                "build_sec": round(build_sec, 2),
                "query_prebuilt_sec": round(_median(pre), 2),
                "query_prebuilt_runs": [round(x, 2) for x in pre],
                "query_oneshot_sec": round(_median(oneshot), 2),
                "query_oneshot_runs": [round(x, 2) for x in oneshot],
                "query_rerank_sec": round(_median(rerank), 2),
                "query_rerank_runs": [round(x, 2) for x in rerank],
                "fit_sec": round(_median(fits), 2),
                "encode_scan_sec": round(_median(escan), 2),
                "codes_scan_sec": round(_median(cscan), 2),
                "amortized_per_call_sec": round(
                    _median(fits) + _median(escan) - _median(cscan), 2),
            }
            # append leg: the never-reprocess-old-rows claim, measured —
            # appending a fixed base-sized batch must cost the same
            # against a x1 index as against a x300 index (work ∝ batch,
            # not index; old rows are untouched by contract)
            from grower_spark.operators.ann_index import append_ann_index

            batch = spark.read.parquet(
                os.path.join(SF_DIR, "embeddings.parquet")
            ).select(
                (F.col("vec_id") + 10_000_000).alias("vec_id"),
                "embedding",
            )
            t0 = time.time()
            app = append_ann_index(batch, idx_path)
            leg["append_batch_rows"] = app["rows"]
            leg["append_sec"] = round(time.time() - t0, 2)
            out["legs"].append(leg)
            print(json.dumps(leg), file=sys.stderr)
    finally:
        shutil.rmtree(work, ignore_errors=True)
        spark.stop()
    out["loadavg_after"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(out, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
