"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Row-producing queries are materialized with the `noop` sink (full execution,
no driver collect); small aggregates are collected.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from grower_spark.session import get_spark  # noqa: E402

BENCH_QUERIES = [
    # (name, materialization) — "noop" for row streams, "collect" for tiny aggs
    ("nginx_parse_rows", "noop"),
    ("nginx_parse_json", "noop"),
    ("nginx_parse_agg", "collect"),
    ("nginx_deadletter", "collect"),
    ("syslog_extract", "noop"),
    ("tpch_q1", "collect"),
    ("tpch_q3", "collect"),
    ("tpch_q5", "collect"),
    ("tpch_q6", "collect"),
    ("tpch_q14", "collect"),
    ("events_window_agg", "noop"),
    ("events_sessionize", "noop"),
    ("events_session_window", "noop"),
    ("events_sliding_window", "noop"),
    ("events_topk_per_user", "noop"),
    ("events_rollup", "noop"),
    ("events_exact_stats", "collect"),
    ("events_sample_stratified", "noop"),
    ("events_sketches", "collect"),
    ("events_asof_join", "noop"),
    ("events_range_join", "noop"),
    ("salted_agg_users", "noop"),
    ("salted_join_events", "noop"),
    ("dedup_exact", "noop"),
    ("dedup_minhash_lsh", "noop"),
    ("dedup_simhash", "noop"),
    ("dedup_ngram_jaccard", "noop"),
    ("text_stats", "noop"),
    ("text_lang_id", "noop"),
    ("dedup_paragraphs", "noop"),
    ("doc_fingerprint", "noop"),
    ("ann_cosine_topk_np", "collect"),
    ("ann_lsh", "collect"),
    ("ann_lsh_multiprobe", "collect"),
    ("ann_ivf", "collect"),
    ("embedding_neardup_lsh", "collect"),
    ("doc_rolling_hash61", "noop"),
    ("multimodal_pipeline", "noop"),
    ("pack_documents", "noop"),
    ("chunk_documents", "noop"),
    ("json_fields", "noop"),
    ("doc_decontaminate", "noop"),
    ("text_repetition", "noop"),
    ("dedup_substring", "noop"),
    ("semdedup", "noop"),
    ("pii_redact", "noop"),
    ("corpus_vocab", "collect"),
    ("tpch_q4", "collect"),
    ("tpch_q10", "collect"),
    ("tpch_q13", "collect"),
    ("tpch_q18", "collect"),
    ("tpch_q2", "collect"),
    ("tpch_q7", "collect"),
    ("tpch_q8", "collect"),
    ("tpch_q9", "collect"),
    ("tpch_q11", "collect"),
    ("tpch_q12", "collect"),
    ("tpch_q15", "collect"),
    ("tpch_q16", "collect"),
    ("tpch_q17", "collect"),
    ("tpch_q19", "collect"),
    ("tpch_q20", "collect"),
    ("tpch_q21", "collect"),
    ("tpch_q22", "collect"),
    ("tokenize_ids", "noop"),
    ("shard_shuffle", "noop"),
    ("dedup_minhash_incremental", "noop"),
    ("events_outliers", "noop"),
    ("source_mix", "collect"),
    ("semantic_decontam", "noop"),
    ("semantic_decontam_bcast", "noop"),
    ("multimodal_decode_png", "noop"),
    ("multimodal_decode_wav", "noop"),
    ("lm_perplexity", "noop"),
    ("dsir_weights", "noop"),
    ("multimodal_fused", "noop"),
    ("bigram_lm_perplexity", "noop"),
    ("cluster_split", "noop"),
    ("corpus_report", "collect"),
    ("multimodal_decode_meta", "noop"),
    ("multimodal_decode_mp4", "noop"),
    ("events_funnel", "noop"),
    ("events_retention", "collect"),
    ("events_transitions", "collect"),
    ("lm_tail_keep", "noop"),
    ("nginx_error_rate", "noop"),
    ("nginx_latency_percentiles", "noop"),
    ("events_cusum", "collect"),
    ("events_winsorized", "collect"),
    ("events_robust_stats", "collect"),
    # new r8 rows
    ("bigram_lm_score_join", "noop"),
    ("events_session_funnel", "noop"),
    ("source_overlap", "collect"),
    ("embedding_kmeans", "noop"),
    ("kmeans_representatives", "collect"),
    ("dedup_keep_best", "noop"),
    ("doc_novelty", "noop"),
    ("doc_top_terms", "noop"),
    ("events_top_paths", "collect"),
    ("events_funnel_timing", "collect"),
    ("events_dau_wau", "collect"),
    ("nb_lang_score", "noop"),
    ("doc_bm25", "collect"),
    ("cluster_balanced_sample", "noop"),
    ("nginx_session_funnel", "noop"),
    ("corpus_token_budget", "noop"),
    ("events_hourly_baseline", "noop"),
    ("nginx_top_clients", "collect"),
    ("nginx_ip_prefix", "collect"),
    ("events_lifecycle", "collect"),
    ("events_value_deciles", "collect"),
    ("doc_containment", "noop"),
    ("embedding_density", "noop"),
    ("corpus_diff", "noop"),
    ("sample_weighted", "noop"),
    ("quality_adaptive", "collect"),
    ("embedding_diversity", "collect"),
    ("term_affinity", "collect"),
    ("sample_exact_k", "noop"),
    ("embedding_dim_stats", "collect"),
    ("corpus_drift", "collect"),
    ("benchmark_leakage", "collect"),
    ("lang_confusion", "collect"),
    ("events_gap_stats", "collect"),
    ("lsh_precision", "collect"),
    ("doc_quality_outliers", "collect"),
    ("embedding_norm_outliers", "collect"),
    # r10: the 7 registry rows the bench never covered (VERDICT r9
    # "What's missing" #1) — with these, bench coverage == registry.
    ("dedup_clusters", "noop"),
    ("dedup_simhash_pairs", "noop"),
    ("embedding_neardup", "collect"),
    ("nginx_custom_casts", "noop"),
    ("scalar_funcs", "noop"),
    ("text_bpe_tokens", "noop"),
    ("text_normalize", "noop"),
    # r10: the driver-certifiable streaming row — a real Structured
    # Streaming run (file source -> parse -> applyInPandasWithState
    # funnel) to completion per invocation; its wall is micro-batch
    # machinery + state store, not the batch operators, so expect ~9 s
    # at sf0.1 (documented honest cost, not a regression).
    ("streaming_session_funnel", "noop"),
    # r10 debuts
    ("doc_gopher_rules", "noop"),
    ("token_heavy_hitters", "collect"),
    ("events_split_leakage", "collect"),
    ("lang_fertility", "collect"),
    ("dedup_cluster_sizes", "collect"),
    ("dedup_prefix", "noop"),
    ("doc_fineweb_filters", "noop"),
    ("source_dedup_rates", "collect"),
    ("doc_length_histogram", "collect"),
    ("source_pii_rates", "collect"),
    ("events_burstiness", "collect"),
    ("user_type_diversity", "collect"),
    ("events_churn", "collect"),
    # second streaming replay row (windowed stateful agg path); like the
    # funnel replay, the wall is micro-batch + state machinery (~7 s
    # warm at sf0.1, documented honest cost)
    ("streaming_drift_gate", "noop"),
    # r11: the composed corpus-build governance row — the whole
    # tools/corpus_build.py pipeline (adaptive quality gate, repetition
    # filter, keep-best exact+LSH dedup, packing) per invocation, so its
    # wall is the sum of its stages (documented honest cost)
    ("corpus_build_full", "collect"),
    ("corpus_build_mixture", "collect"),
    # r11 debuts: the mixture rows are model-sized / map-side explode;
    # winnowing + edit-distance inherit the pair-emit family cost;
    # hard negatives rides the brute-panel scan
    ("source_mixture_plan", "collect"),
    ("mixture_materialize", "noop"),
    ("ann_hard_negatives", "collect"),
    ("dedup_winnowing", "noop"),
    ("dedup_edit_distance", "collect"),
    ("dedup_editdist_unicode", "collect"),
    # r13 debuts: fit collect + zero-shuffle encode, one flat row/vector;
    # the int8 ANN rides the same broadcast-panel scan as the float rows
    ("embedding_quantize_int8", "collect"),
    ("ann_int8_topk", "collect"),
    ("ann_int8_rerank", "collect"),
    ("ann_ivf_int8", "collect"),
    # r15 debuts: both read the PREBUILT persisted index — the first
    # warmup run pays the one-time build (ensure_ann_index cache), the
    # timed runs measure the query path only, which is exactly the
    # operators' production contract (build once, query many)
    ("ann_index_int8", "collect"),
    ("ann_ivf_int8_rerank", "collect"),
    ("ann_index_append", "collect"),
    # r16 debuts: the completed lifecycle — delete/rebuild/trained read
    # their own prebuilt on-disk states (warmup pays the one-time
    # build+mutations, timed runs measure serving), oov rides the
    # shared full index with an external clamped query panel
    ("ann_index_delete", "collect"),
    ("ann_index_rebuild", "collect"),
    ("ann_index_trained", "collect"),
    ("ann_index_oov", "collect"),
    # r17 debuts: serving cost of the compacted index (tombstone fold
    # under the stored fit), the production trained+tombstones config,
    # and an index grown by exactly-once epoch appends — warmup pays
    # each one-time lifecycle, timed runs measure the query path
    ("ann_index_compact", "collect"),
    ("ann_index_trained_delete", "collect"),
    ("ann_index_stream_append", "collect"),
]


def materialize(df, how: str) -> int:
    if how == "collect":
        return len(df.collect())
    df.write.format("noop").mode("overwrite").save()
    return -1


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 8)

    # Host-load gate (r12 verdict item 3): the r12 driver run started at
    # 1-min loadavg 5.58 and recorded worst per-query noise of 7.11
    # max/min (r11, idle: 1.86) — the auto-reruns below treat symptoms;
    # delaying the timed loop until the host calms treats the cause.
    # Semantics are delay-then-proceed, never refuse: the per-round
    # driver must always get an artifact, so after max_wait the run
    # proceeds and the decision is recorded in host.load_gate for the
    # reader to weigh.  Sampled BEFORE the JVM spawns (our own session
    # would inflate the reading).  SPARK_GRAFT_BENCH_MAX_LOAD=0 disables.
    gate_max_load = float(os.environ.get("SPARK_GRAFT_BENCH_MAX_LOAD", "4.0"))
    gate_max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_LOAD_WAIT", "300"))
    gate_waited = 0.0
    gate_load0 = os.getloadavg()[0]
    if gate_max_load > 0:
        while (os.getloadavg()[0] > gate_max_load
               and gate_waited < gate_max_wait):
            print(
                f"load gate: 1-min loadavg {os.getloadavg()[0]:.2f} > "
                f"{gate_max_load}, waiting ({gate_waited:.0f}s of "
                f"{gate_max_wait:.0f}s max)...", file=sys.stderr,
            )
            time.sleep(15.0)
            gate_waited += 15.0
    gate_load1 = os.getloadavg()[0]
    load_gate = {
        "threshold": gate_max_load,
        "load_at_start": round(gate_load0, 2),
        "load_after_wait": round(gate_load1, 2),
        "waited_sec": round(gate_waited),
        "decision": (
            "disabled" if gate_max_load <= 0
            else "clear" if gate_load0 <= gate_max_load
            else "waited_until_clear" if gate_load1 <= gate_max_load
            else "proceeded_overloaded"
        ),
    }
    if load_gate["decision"] == "proceeded_overloaded":
        print(
            f"load gate: proceeding at loadavg {gate_load1:.2f} after "
            f"{gate_waited:.0f}s — treat this run's drift flags as "
            "contaminated", file=sys.stderr,
        )

    from grower_spark.driver_queries import QUERIES

    spark = get_spark("grower-spark-bench", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/codegen path and the Python-UDF workers once so
    # per-query numbers measure the engine, not first-call JIT or the
    # pandas import in every worker process.
    spark.range(1000).selectExpr("sum(id)").collect()

    def _noop_batch(it):
        yield from it

    spark.range(0, cpus * 4, 1, cpus).mapInPandas(_noop_batch, "id long").count()

    # Per query: TWO discarded warmup runs, then n_runs timed runs; REPORT
    # the median and the full run list.  Two warmups, not one: queries with
    # wide generated code (dedup_minhash_lsh's 16-permutation projection)
    # show HotSpot tiered-compilation decay over the first ~3 executions
    # (measured r6: 1.5, 1.1, 1.0, 0.95... monotonic — JIT tiering, not AQE
    # flapping, which would be non-monotonic); r5's worst_max_over_min of
    # 12.46 was all first-run JIT.  A single-shot number is additionally at
    # the mercy of host noise (observed 3-6x outliers from VM contention;
    # round 3 burned review time on three phantom "regressions") — the
    # median of warm runs is the engine's cost, and the per-query run list
    # makes residual noise visible in the artifact instead of inferred
    # after the fact.
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "5"))
    n_warm = int(os.environ.get("SPARK_GRAFT_BENCH_WARMUPS", "2"))
    # Isolated re-measurement hook (r6 verdict item 6 playbook): run only
    # the named queries, e.g. SPARK_GRAFT_BENCH_ONLY=multimodal_pipeline.
    only = {
        q for q in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if q
    }
    bench_queries = [
        (n, h) for n, h in BENCH_QUERIES if not only or n in only
    ]
    # Capture the host-contention baseline BEFORE the warm preamble
    # below: the preamble's own Spark jobs raise loadavg, and the drift
    # protocol uses loadavg_before to attribute or dismiss isolation
    # runs — a self-contaminated baseline would make an idle host look
    # contended (r14 review).
    load_before = list(os.getloadavg())
    # Fixed JIT-warm preamble for subset runs (r13 verdict item 5): a
    # full run amortizes JVM/codegen tiering across 150+ queries, but an
    # isolated subset starts cold and its per-query warmups alone left
    # enough tiering inflation to fake a cross-round "level shift" in
    # r13.  Burn the cold start on a fixed query before any timing.
    if only:
        for _ in range(3):
            QUERIES["nginx_parse_agg"](spark, sf_dir).collect()
    # Host-contention probe: this VM's CPU is shared and identical Spark
    # jobs vary 3-6x under load (rounds 3/5/6 each burned review time on
    # phantom regressions).  load_before (captured above, pre-preamble)
    # plus the after-run reading make a noisy snapshot self-evident in
    # the artifact; the common-query sum vs the committed snapshot
    # auto-flags drift >10%.
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    total = 0.0
    # Noise auto-rerun (r10 verdict item 6): a query whose max/min run
    # spread exceeds RERUN_SPREAD gets a second batch of warm runs, and
    # the median is taken over ALL runs — host-contention outliers stop
    # producing phantom drift flags that burn a RESPONSES disposition.
    rerun_spread = float(os.environ.get("SPARK_GRAFT_BENCH_RERUN_SPREAD",
                                        "1.5"))
    reran: list[str] = []
    # Cross-round drift auto-rerun (r11 verdict item 5): a query whose
    # median drifts >= 1.3x vs the FROZEN round-start pin while its code
    # is untouched gets a second batch in the same invocation, so
    # sub-gate creep (cluster_balanced_sample's 1.39x in r11, just under
    # the 1.4x flag) is re-measured at the moment it appears instead of
    # burning a next-round disposition.  The pin is bench_prev_round.json
    # (round-stable); queries absent from it (debuts) are skipped.
    drift_rerun = float(os.environ.get("SPARK_GRAFT_BENCH_DRIFT_RERUN",
                                       "1.3"))
    pin: dict[str, float] = {}
    if sf == "0.1" and not only:
        # Subset guard (r13 verdict item 5): an isolated BENCH_ONLY run
        # starts with a cold JIT, which inflated subset medians enough to
        # mis-call a "host-generation level shift" in r13's item-2 first
        # disposition.  In subset mode the pin stays empty (no drift
        # comparison against full-run numbers) and the summary is stamped
        # subset_mode below; the sf condition already notes the pin holds
        # sf0.1 medians and is meaningless elsewhere.
        try:
            with open(os.path.join(
                    os.path.dirname(os.path.abspath(__file__)),
                    "bench_prev_round.json")) as f:
                pin = json.load(f).get("queries", {})
        except (OSError, ValueError):
            pass
    reran_drift: list[str] = []
    for name, how in bench_queries:
        fn = QUERIES[name]
        for _ in range(n_warm):
            materialize(fn(spark, sf_dir), how)  # warmup, discarded
        # spread is computed on UNROUNDED durations with the denominator
        # floored at the timer's useful resolution (1 ms) — rounding first
        # made any <0.5 ms run record 0.0 and the ratio astronomically
        # large, so the noise rerun always fired for very fast queries and
        # reran_for_noise misreported them (r11 advice item 3)
        rs = []
        for _ in range(max(n_runs, 1)):
            t0 = time.time()
            materialize(fn(spark, sf_dir), how)
            rs.append(time.time() - t0)
        if max(rs) / max(min(rs), 1e-3) > rerun_spread:
            reran.append(name)
            for _ in range(max(n_runs, 1)):
                t0 = time.time()
                materialize(fn(spark, sf_dir), how)
                rs.append(time.time() - t0)
        med = sorted(rs)[len(rs) // 2]
        pq = pin.get(name)
        if (pq and pq > 0
                and max(med, pq) / max(min(med, pq), 1e-3) > drift_rerun):
            reran_drift.append(name)
            for _ in range(max(n_runs, 1)):
                t0 = time.time()
                materialize(fn(spark, sf_dir), how)
                rs.append(time.time() - t0)
        runs[name] = [round(r, 3) for r in rs]
        timings[name] = round(sorted(rs)[len(rs) // 2], 3)
        total += timings[name]
    if not runs:
        print(f"no bench queries matched SPARK_GRAFT_BENCH_ONLY={only}",
              file=sys.stderr)
        sys.exit(2)
    spreads = sorted(max(r) / max(min(r), 1e-3) for r in runs.values())
    noise = {
        "median_max_over_min": round(spreads[len(spreads) // 2], 2),
        "worst_max_over_min": round(spreads[-1], 2),
        "reran_for_noise": reran,
        "reran_for_drift": reran_drift,
    }

    # Ingest-throughput sanity figure vs the reference's 10k lines/s bar
    # (BASELINE.md): lines parsed+cast+validated per second, measured on a
    # warm second run so it reflects steady-state, not JVM/codegen warm-up.
    t0 = time.time()
    n_lines = QUERIES["nginx_parse_rows"](spark, sf_dir).count()
    lps = round(n_lines / max(time.time() - t0, 1e-9))

    here = os.path.dirname(os.path.abspath(__file__))
    host = {
        "loadavg_before": [round(x, 2) for x in load_before],
        "loadavg_after": [round(x, 2) for x in os.getloadavg()],
        "cpus": os.cpu_count(),
        "load_gate": load_gate,
    }
    snap_name = (
        "bench_summary.json" if sf == "0.1" else f"bench_summary_sf{sf}.json"
    )
    drift = None
    try:
        if only:
            # refuse drift comparison outright in subset mode — subset
            # medians vs full-run snapshots was the r13 confound even
            # with the preamble above (r13 verdict item 5)
            raise OSError("subset mode: no snapshot comparison")
        with open(os.path.join(here, snap_name)) as f:
            prev = json.load(f).get("queries", {})
        common = [q for q in timings if q in prev and prev[q] > 0]
        if common:
            cur_sum = sum(timings[q] for q in common)
            prev_sum = sum(prev[q] for q in common)
            ratio = round(cur_sum / max(prev_sum, 1e-9), 3)
            # Per-query drift gate (r8 verdict item 4): name every query
            # whose median moved >1.4x vs the committed snapshot in
            # EITHER direction.  Protocol: before committing a new
            # snapshot, re-run the listed queries isolated
            # (SPARK_GRAFT_BENCH_ONLY=<list>) on an idle host and carry
            # the re-run numbers in the snapshot commit message — a
            # query-level 1.4x is exactly the spread host contention
            # produces here, so a flagged row is unattributed until
            # isolated.
            per_query = sorted(
                q for q in common
                if max(timings[q], prev[q]) / max(min(timings[q], prev[q]),
                                                  1e-9) > 1.4
            )
            drift = {
                "common_queries": len(common),
                "sum_vs_committed": ratio,
                "flagged": abs(ratio - 1.0) > 0.10,
                "per_query_over_1_4x": per_query,
            }
    except (OSError, ValueError):
        pass

    # Cross-round drift pin (r9 verdict item 3): bench_summary.json is
    # refreshed mid-round, so by the final refresh its baseline has
    # already absorbed any early-round drift — a clean-to-clean
    # regression (r9's dedup_paragraphs) is invisible to the gate above.
    # bench_prev_round.json is FROZEN at round start (a copy of the
    # previous round's final committed snapshot; bench.py never writes
    # it) and gives a second, round-stable comparison.  Caveat recorded
    # in the artifact: this host's wall clock drifts 1.3-1.7x
    # round-over-round on git-identical queries (r10 control
    # measurement: doc_fingerprint/doc_rolling_hash61/text_repetition,
    # all untouched since r8, at 1.5-1.7x under load) — a flagged row
    # here is unattributed until isolated against those controls.
    if drift is not None and sf == "0.1":
        try:
            with open(os.path.join(here, "bench_prev_round.json")) as f:
                prevr = json.load(f).get("queries", {})
            common = [q for q in timings if q in prevr and prevr[q] > 0]
            if common:
                cur_sum = sum(timings[q] for q in common)
                prev_sum = sum(prevr[q] for q in common)
                drift["vs_prev_round"] = {
                    "common_queries": len(common),
                    "sum_ratio": round(cur_sum / max(prev_sum, 1e-9), 3),
                    "per_query_over_1_4x": sorted(
                        q for q in common
                        if max(timings[q], prevr[q])
                        / max(min(timings[q], prevr[q]), 1e-9) > 1.4
                    ),
                }
        except (OSError, ValueError):
            pass

    summary = {
        "metric": "headline_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "parse_lines_per_sec": lps,
        "runs": runs,
        "noise": noise,
        "host": host,
        "drift": drift,
        "subset_mode": bool(only),
        # r14 verdict "What's wrong" 2: even with the JIT preamble, a
        # subset process misses the C2 tiering a 160-query full run
        # accumulates (~1.5x measured on untouched queries) — subset
        # medians are only comparable to other numbers from the SAME
        # process, never to full-run snapshots or pins.
        "stat": (
            f"median of {n_runs} warm runs ({n_warm} warmups discarded)"
            + ("; subset mode: numbers are A/B-comparable WITHIN this "
               "process only — not vs full-run snapshots/pins (C2 "
               "tiering gap, r14)" if only else "")
        ),
    }
    print(json.dumps(summary))
    # Provenance: the driver records only the printed tail; a committed
    # copy at a stable path makes round-over-round comparison independent
    # of tail parsing (VERDICT r5 item 8).  Subset runs (BENCH_ONLY) never
    # overwrite the committed full snapshot, and non-default scale factors
    # write a suffixed file — an sf0.01 verify drive must not masquerade
    # as the sf0.1 snapshot (r7: exactly that corrupted the drift check).
    if not only:
        try:
            with open(os.path.join(here, snap_name), "w") as f:
                json.dump(summary, f, indent=2)
                f.write("\n")
        except OSError:
            pass  # read-only checkout: the printed line is still the artifact
    spark.stop()


if __name__ == "__main__":
    main()
