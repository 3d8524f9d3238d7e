"""Scale rehearsal: measure the shuffle-heaviest dedup operators across a
decade of data growth, turning the SCALE.md plan-shape arguments into
measured evidence.

Two subcommands:

``gen``   — deterministically synthesize an N× corpus from the sf0.1
            ``documents`` table: each base document gets N replicas with
            ~10% token dropout keyed by xxhash64 (replica 0 is verbatim),
            so near-dup cluster structure — the thing that stresses the
            operators — scales WITH the data instead of being diluted by
            it.  A second column ``text_par`` wraps the mutated text in
            header/footer paragraphs drawn from a small boilerplate pool,
            giving ``drop_common_paragraphs`` a realistic high-df target.
            Generation is map-side only (explode over a sequence — no
            join, no shuffle) and writes multi-file parquet.

``run``   — time the three ops (``minhash_lsh_pairs``,
            ``ngram_jaccard_pairs`` base AND prefix at a production
            threshold, ``drop_common_paragraphs``) over the generated
            corpora, median wall-clock of ``--runs`` with one discarded
            warmup, plus total shuffle read/write bytes per run measured
            from the Spark REST API (the UI is enabled for this session
            only).  Emits one JSON document for SCALE.md.

``--embeddings`` on both subcommands switches to the ANN leg: grow the
embeddings table (jittered replicas) and measure
brute/LSH/multiprobe/IVF top-k against a fixed query set.

Usage:
    python tools/scale_rehearsal.py gen --base /root/testdata/sf0.1 \
        --out /tmp/scale --factors 1,3,10
    python tools/scale_rehearsal.py run --out /tmp/scale --factors 1,3,10 \
        --runs 3 > /tmp/scale_results.json
    python tools/scale_rehearsal.py gen --out /tmp/se --factors 1,10,30 --embeddings
    python tools/scale_rehearsal.py run --out /tmp/se --factors 1,10,30 --embeddings
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request
from typing import Optional

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

BOILERPLATE = [
    # a pool of corpus-wide common paragraphs (cookie banners, license
    # headers, navigation crumbs) — every document draws a header and a
    # footer from here, so each pool entry's document frequency is
    # ~2*N_docs/pool, far above any min_df threshold
    f"boilerplate paragraph {i}: this site uses cookies to improve your "
    f"experience please accept our terms and conditions before continuing"
    for i in range(24)
]

JACCARD_PROD_THRESHOLD = 0.5  # near-dup threshold a training-data run uses
JACCARD_MAX_DF = 100
PARA_MIN_DF = 24  # ~N_docs*2/24 instances per pool entry >> 24 at any factor


def _session(name: str, ui: bool):
    # Private builder rather than session.get_spark: the REST metrics need
    # spark.ui.enabled, which the library session deliberately turns off.
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or (os.cpu_count() or 4)
    return (
        SparkSession.builder.appName(name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", str(ui).lower())
        .config("spark.ui.port", "4049")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .getOrCreate()
    )


def generate(spark, base_dir: str, out_dir: str, factor: int) -> str:
    from grower_spark.io_tables import load_table

    docs = load_table(spark, base_dir, "documents")
    reps = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
    big = docs.select("doc_id", "text", "lang", "source", reps)
    new_id = (F.col("doc_id") * factor + F.col("rep")).alias("doc_id")
    toks = F.split("text", " ")
    # replica 0 verbatim; others drop each token with p=1/10 keyed by
    # (new doc_id, token position) — deterministic, no RNG state
    mutated = F.when(F.col("rep") == 0, F.col("text")).otherwise(
        F.array_join(
            F.filter(
                toks,
                lambda t, i: F.pmod(
                    F.xxhash64(F.col("doc_id") * factor + F.col("rep"), i), F.lit(10)
                ) != 0,
            ),
            " ",
        )
    )
    pool = F.array(*[F.lit(s) for s in BOILERPLATE])
    hdr = F.element_at(pool, (F.pmod(F.xxhash64(new_id, F.lit("h")), F.lit(24)) + 1).cast("int"))
    ftr = F.element_at(pool, (F.pmod(F.xxhash64(new_id, F.lit("f")), F.lit(24)) + 1).cast("int"))
    out = big.select(
        new_id,
        mutated.alias("text"),
        F.concat(hdr, F.lit("\n\n"), mutated, F.lit("\n\n"), ftr).alias("text_par"),
        "lang",
        "source",
    ).withColumn("n_chars", F.length("text"))
    path = os.path.join(out_dir, f"x{factor}", "documents.parquet")
    out.repartition(32).write.mode("overwrite").parquet(path)
    return path


def generate_embeddings(spark, base_dir: str, out_dir: str, factor: int) -> str:
    """×N the embeddings table: replicas with a deterministic ±5e-2
    per-component jitter keyed by (new vec_id, component) — near-duplicate
    vectors cluster with their base vector, so ANN bucket occupancy grows
    with the corpus the way a real embedded corpus's does."""
    from grower_spark.io_tables import load_table

    emb = load_table(spark, base_dir, "embeddings")
    reps = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
    big = emb.select("vec_id", "embedding", "label", reps)
    new_id = F.col("vec_id") * factor + F.col("rep")
    jittered = F.when(F.col("rep") == 0, F.col("embedding")).otherwise(
        F.transform(
            "embedding",
            lambda x, i: x + (
                F.pmod(F.xxhash64(new_id, i), F.lit(1000)).cast("double")
                - 500.0
            ) * F.lit(1e-4).cast("double"),
        ).cast("array<float>")
    )
    out = big.select(
        new_id.alias("vec_id"), jittered.alias("embedding"), "label"
    )
    path = os.path.join(out_dir, f"x{factor}", "embeddings.parquet")
    out.repartition(16).write.mode("overwrite").parquet(path)
    return path


def generate_events(spark, base_dir: str, out_dir: str, factor: int) -> str:
    """×N the events table along the axis real product data grows: MORE
    USERS (user_id * factor + rep), events-per-user constant.  Replica 0
    is verbatim; other replicas jitter each event's timestamp by a
    deterministic ±24 h keyed by the new event_id, so replica users land
    in different sessions / cohort weeks instead of being exact time
    clones."""
    from grower_spark.io_tables import load_table

    ev = load_table(spark, base_dir, "events")
    reps = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
    big = ev.select("event_id", "ts_ns", "user_id", "event_type", "value",
                    "props", reps)
    new_eid = F.col("event_id") * factor + F.col("rep")
    new_uid = F.col("user_id") * factor + F.col("rep")
    jitter_ns = (
        (F.pmod(F.xxhash64(new_eid, F.lit("t")), F.lit(2 * 86400)) - 86400)
        * F.lit(1_000_000_000)
    )
    new_ts_ns = F.when(F.col("rep") == 0, F.col("ts_ns")).otherwise(
        F.col("ts_ns") + jitter_ns
    )
    out = big.withColumn("_new_ts_ns", new_ts_ns).select(
        new_eid.alias("event_id"),
        # `div` (integer division), never float `/`: epoch-nanos exceed
        # 2^53, so a double round-trip drifts the micros — the exact
        # pitfall io_tables.py documents.  Replica 0 must be verbatim.
        F.timestamp_micros(
            F.expr("_new_ts_ns div 1000").cast("long")
        ).alias("ts"),
        new_uid.alias("user_id"),
        "event_type", "value", "props",
    )
    path = os.path.join(out_dir, f"x{factor}", "events.parquet")
    out.repartition(32).write.mode("overwrite").parquet(path)
    return path


def run_events_ops(spark, out_dir: str, factors: list[int], runs: int) -> dict:
    """Rehearsal legs for the product-analytics family (VERDICT r7 item
    6): funnel / sessionized funnel / retention / transitions / CUSUM
    over a user-growing events table.  Every op is a one-user-shuffle
    fold or a rollup to bounded cardinality (type², cohort-weeks,
    buckets), so walls should track the event count linearly and shuffle
    bytes should track users (funnels) or stay ~flat (rollups).  Each
    op's output sits on the count path behind a filter so Catalyst can't
    prune the computation away."""
    from grower_spark.io_tables import load_table
    from grower_spark.operators.anomaly import rate_cusum
    from grower_spark.operators.funnel import (
        funnel_depth,
        funnel_step_times,
        sessionized_funnel_depth,
    )
    from grower_spark.operators.retention import (
        active_user_stats,
        event_transitions,
        retention_cohorts,
        top_event_paths,
        user_lifecycle,
        value_deciles,
    )

    steps = ["view", "click", "purchase"]
    gap_ns = 30 * 60 * 1_000_000_000
    app = _app_url(spark)
    ops = {
        "events_funnel": lambda d: funnel_depth(d, steps).where(
            F.col("funnel_depth") >= 0
        ),
        "events_session_funnel": lambda d: sessionized_funnel_depth(
            d, steps, gap=gap_ns
        ).where(F.col("funnel_depth") >= 0),
        "events_retention": lambda d: retention_cohorts(d).where(
            F.col("n_users") >= 0
        ),
        "events_transitions": lambda d: event_transitions(d).where(
            F.col("n") >= 0
        ),
        "events_cusum": lambda d: rate_cusum(d).where(
            F.col("cusum_max") >= 0
        ),
        # r8 additions
        "events_top_paths": lambda d: top_event_paths(d).where(
            F.col("n") >= 0
        ),
        "events_funnel_timing": lambda d: funnel_step_times(d, steps).where(
            F.col("n_reached") >= 0
        ),
        "events_dau_wau": lambda d: active_user_stats(d).where(
            F.col("wau") >= 0
        ),
        # r9 session-2 additions: growth accounting (one window pass,
        # user-week shuffle) and decile segmentation (user rollup +
        # distributed global rank — walls should track users, and the
        # rank must never collapse to one partition)
        "events_lifecycle": lambda d: user_lifecycle(d).where(
            F.col("n_new") >= 0
        ),
        "events_value_deciles": lambda d: value_deciles(d).where(
            F.col("n_users") >= 0
        ),
        # r10: split leakage — one user-keyed agg + a scalar rollup; wall
        # should track events linearly, shuffle should track USERS
        "events_split_leakage": lambda d: _split_leakage(d),
        # r10: burstiness (two bounded aggs: type x minutes, then type),
        # diversity (user x day x type distinct -> tiny histogram), and
        # churn (one (type, user) min/max agg) — all model-sized shuffles
        "events_burstiness": lambda d: _burstiness(d),
        "user_type_diversity": lambda d: _type_diversity(d),
        "events_churn": lambda d: _churn(d),
    }
    results: dict = {}
    for factor in factors:
        ev = load_table(spark, os.path.join(out_dir, f"x{factor}"), "events")
        n_events = ev.count()
        results[f"x{factor}"] = {"n_events": n_events, "ops": {}}
        for name, mk in ops.items():
            mk(ev).count()  # warmup discarded
            wall, sread, swrite, rows = [], [], [], 0
            for _ in range(runs):
                r0, w0 = _shuffle_totals(app)
                t0 = time.monotonic()
                rows = mk(ev).count()
                wall.append(time.monotonic() - t0)
                r1, w1 = _shuffle_totals(app)
                sread.append(r1 - r0)
                swrite.append(w1 - w0)
            wall.sort()
            med = wall[len(wall) // 2]
            results[f"x{factor}"]["ops"][name] = {
                "rows": rows,
                "wall_median_s": round(med, 3),
                "wall_all_s": [round(x, 3) for x in wall],
                "shuffle_read_mb": round(max(sread) / 1e6, 2),
                "shuffle_write_mb": round(max(swrite) / 1e6, 2),
            }
            print(f"  x{factor} {name}: {med:.2f}s rows={rows} "
                  f"shw={max(swrite)/1e6:.1f}MB", file=sys.stderr)
    return results


def _hard_negatives(corpus, np_kernel=False):
    from grower_spark.operators.similarity import (
        hard_negative_topk,
        hard_negative_topk_np,
    )

    q = corpus.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qvec"),
        F.col("label").alias("qlabel"),
    )
    fn = hard_negative_topk_np if np_kernel else hard_negative_topk
    return fn(corpus, q, k=10)


def _diversity(corpus):
    from grower_spark.operators.diversity import embedding_diversity

    return embedding_diversity(corpus, group_col="label")


def _weighted(docs):
    from grower_spark.operators.sampling import weighted_poisson_sample

    return weighted_poisson_sample(
        docs, "n_chars", target_rows=500, key_col="doc_id", salt="wps"
    ).select("doc_id", "n_chars")


def _adaptive(docs):
    from grower_spark.operators.sampling import adaptive_quality_cut

    base = docs.where(F.col("text").isNotNull())
    n_alpha = F.length(F.regexp_replace(F.col("text"), r"[^A-Za-z]", ""))
    score = F.round(
        F.lit(1000.0) * n_alpha / F.greatest(F.length("text"), F.lit(1))
    ).cast("long")
    return adaptive_quality_cut(
        base.select("lang", score.alias("score")), "lang", "score", 300
    )


def _affinity(docs):
    from grower_spark.operators.text import term_affinity_topk

    return term_affinity_topk(docs, k=50, min_count=5)


def _exact_k(docs):
    from grower_spark.operators.sampling import sample_exact_k_per_group

    return sample_exact_k_per_group(docs, "source", k=30, key_col="doc_id")


def _drift(docs):
    from grower_spark.operators.diff import distribution_drift_bins

    base = docs.where(F.col("text").isNotNull())
    n_alpha = F.length(F.regexp_replace(F.col("text"), r"[^A-Za-z]", ""))
    score = F.round(
        F.lit(1000.0) * n_alpha / F.greatest(F.length("text"), F.lit(1))
    ).cast("long")
    scored = base.select(score.alias("score"))
    old = base.where(F.col("doc_id") % 10 != 7).select(score.alias("score"))
    return distribution_drift_bins(old, scored, score_col="score")


def _dim_stats(corpus):
    from grower_spark.operators.diversity import embedding_dim_stats

    return embedding_dim_stats(corpus)


def _quantize_int8(corpus):
    from grower_spark.operators.diversity import quantize_embeddings_int8

    return quantize_embeddings_int8(corpus)


def _leakage(docs):
    from grower_spark.operators.decontam import benchmark_leakage

    bench = docs.where(F.col("doc_id") % 31 == 0)
    corpus = docs.where(F.col("doc_id") % 31 != 0)
    return benchmark_leakage(corpus, bench, n=3)


def _precision(docs):
    from grower_spark.operators.dedup import lsh_precision_audit

    # r10: budget-sized (the r9 leg measured the fixed-permille audit
    # growing 49 -> 13k pairs at x10 on duplicate-dense replicas; the
    # budget keeps the verify side flat at ~200 pairs at every factor)
    return lsh_precision_audit(docs, pair_budget=200)


def _split_leakage(ev):
    from grower_spark.operators.sampling import time_split_leakage

    return time_split_leakage(ev, train_permille=800)


def _burstiness(ev):
    from grower_spark.operators.anomaly import rate_fano

    return rate_fano(ev, bucket_secs=60)


def _type_diversity(ev):
    day = F.expr("unix_micros(ts) div 86400000000L")
    per_ud = ev.groupBy("user_id", day.alias("_day")).agg(
        F.countDistinct("event_type").alias("n_types")
    )
    return per_ud.groupBy("n_types").agg(F.count(F.lit(1)).alias("n"))


def _churn(ev):
    us = F.unix_micros("ts")
    b = ev.agg(F.min(us).alias("lo"), F.max(us).alias("hi")).collect()[0]
    cut = int(b["lo"]) + ((int(b["hi"]) - int(b["lo"])) * 800) // 1000
    pu = ev.groupBy("event_type", "user_id").agg(
        F.min(us).alias("_t0"), F.max(us).alias("_t1")
    )
    return pu.groupBy("event_type").agg(
        F.sum(((F.col("_t0") < cut) & ~(F.col("_t1") >= cut)).cast("long"))
        .alias("n_churned")
    )


def _winnowing(docs, cap):
    from grower_spark.operators.dedup import winnowing_pairs

    return winnowing_pairs(
        docs, k=3, window=4, min_shared=2, max_fp_df=cap, hash_fn="xxhash"
    )


def _mixture(docs):
    from grower_spark.operators.sampling import mixture_plan

    return mixture_plan(docs, "lang", 100_000, key_col="doc_id", salt="mixplan")


def _edit_distance(docs, cap, capped):
    # the Levenshtein kernel cannot be pruned under count(): the permille
    # gate filters on the dist column, so every candidate pair pays the
    # kernel — which is exactly what this leg measures (candidate_count ×
    # len² for capped=False vs candidate_count × len × p·len/1000 for the
    # banded early-exit production default)
    from grower_spark.operators.dedup import edit_distance_pairs

    return edit_distance_pairs(
        docs, max_dist_permille=200, num_perm=16, bands=4,
        hash_fn="xxhash", max_bucket_width=cap, capped=capped,
    )


def _gopher(docs):
    from grower_spark.operators.text import gopher_rules

    return gopher_rules(docs).select("doc_id", "gopher_pass").where(
        F.col("gopher_pass") >= 0
    )


def _heavy_hitters(docs):
    from grower_spark.operators.sketch import mg_heavy_hitters

    return mg_heavy_hitters(docs, threshold_permille=5, k=512)


def _cluster_sizes(docs, cap):
    from grower_spark.operators.dedup import (
        duplicate_clusters,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(
        docs, threshold=JACCARD_PROD_THRESHOLD, max_shingle_df=cap
    )
    sizes = duplicate_clusters(pairs, backend="star").groupBy(
        "cluster_id"
    ).agg(F.count(F.lit(1)).alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters")
    )


def _fertility(docs):
    from grower_spark.operators.text import fertility_stats

    return fertility_stats(docs)


def run_ann_ops(spark, out_dir: str, factors: list[int], runs: int,
                only: Optional[list[str]] = None) -> dict:
    """Fixed query set (first 64 base vectors), growing corpus: measures
    the corpus-side scaling of each ANN strategy."""
    from grower_spark.operators.similarity import (
        cosine_topk_np,
        density_vs_panel,
        density_vs_panel_np,
        ivf_ann_topk,
        lsh_ann_topk,
    )

    app = _app_url(spark)
    from grower_spark.operators.clustering import kmeans_quantized

    ops = {
        # r8: the iterative op — each timed run includes the seed collect,
        # one centroid-update rollup, and both assignment passes
        "embedding_kmeans": lambda c, q: kmeans_quantized(
            c, k=8, n_iter=2
        ).where(F.col("dist_sq_q") >= 0),
        "ann_brute_np": lambda c, q: cosine_topk_np(c, q, k=10),
        # r11 debut: the label filter rides the same broadcast-panel scan
        # as brute force — wall should track ann_brute's slope (the HOF
        # scorer's per-pair fold), shuffle stays the tiny top-k stream
        "ann_hard_negatives": lambda c, q: _hard_negatives(c, np_kernel=False),
        "ann_hard_negatives_np": lambda c, q: _hard_negatives(c, np_kernel=True),
        "ann_lsh": lambda c, q: lsh_ann_topk(c, q, k=10, n_planes=8, dim=64),
        "ann_lsh_multiprobe": lambda c, q: lsh_ann_topk(
            c, q, k=10, n_planes=8, dim=64, n_probes=2
        ),
        "ann_ivf": lambda c, q: ivf_ann_topk(
            c, q, k=10, n_cells=16, n_probe=2, dim=64
        ),
        # r9 session-2: density outlier filter vs a FIXED panel (base-id
        # range, ~1/11 of the base 5000-vector table at every factor) —
        # the production contract is a bounded broadcast reference set,
        # so wall should be linear in the corpus and shuffle ~flat
        "embedding_density": lambda c, q: density_vs_panel(
            c,
            c.where((F.col("vec_id") < 5000) & (F.col("vec_id") % 11 == 0))
             .select(F.col("vec_id").alias("pid"),
                     F.col("embedding").alias("pvec")),
            tau=0.2,
        ).where(F.col("n_close") >= 0),
        # BLAS twin: same contract, matmul kernel (the production path
        # at real dims/panels — parity pytest pins row equality)
        "embedding_density_np": lambda c, q: density_vs_panel_np(
            c,
            c.where((F.col("vec_id") < 5000) & (F.col("vec_id") % 11 == 0))
             .select(F.col("vec_id").alias("pid"),
                     F.col("embedding").alias("pvec")),
            tau=0.2,
        ).where(F.col("n_close") >= 0),
        # r9 session-3: the moment-identity diversity — O(n·d) with a
        # model-sized output; wall should be LINEAR in the corpus and the
        # shuffle bounded by partitions × labels × dim (the partial agg)
        "embedding_diversity": lambda c, q: _diversity(c),
        "embedding_dim_stats": lambda c, q: _dim_stats(c),
        # r13 debut: int8 quantization — each timed run includes the
        # model-sized fit collect (one map-combinable per-dim agg) plus
        # the zero-shuffle encode, so wall should be LINEAR in the
        # corpus and shuffle ~flat (partitions × dim partials only)
        "embedding_quantize_int8": lambda c, q: _quantize_int8(c),
    }
    if only:
        ops = {k: v for k, v in ops.items() if k in only}
    results: dict = {}
    for factor in factors:
        path = os.path.join(out_dir, f"x{factor}", "embeddings.parquet")
        corpus = spark.read.parquet(path)
        queries = corpus.where(
            (F.col("vec_id") % factor == 0) & (F.col("vec_id") < 64 * factor)
        ).select(F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"))
        results[f"x{factor}"] = {"n_vecs": corpus.count(), "ops": {}}
        for name, mk in ops.items():
            mk(corpus, queries).count()  # warmup discarded
            wall, swrite, rows = [], [], 0
            for _ in range(runs):
                _r0, w0 = _shuffle_totals(app)
                t0 = time.monotonic()
                rows = mk(corpus, queries).count()
                wall.append(time.monotonic() - t0)
                _r1, w1 = _shuffle_totals(app)
                swrite.append(w1 - w0)
            wall.sort()
            med = wall[len(wall) // 2]
            results[f"x{factor}"]["ops"][name] = {
                "rows": rows,
                "wall_median_s": round(med, 3),
                "wall_all_s": [round(x, 3) for x in wall],
                "shuffle_write_mb": round(max(swrite) / 1e6, 2),
            }
            print(f"  x{factor} {name}: {med:.2f}s rows={rows} "
                  f"shw={max(swrite)/1e6:.1f}MB", file=sys.stderr)
    return results


def _shuffle_totals(app_url: str) -> tuple[int, int]:
    with urllib.request.urlopen(f"{app_url}/executors", timeout=10) as r:
        execs = json.load(r)
    return (
        sum(e["totalShuffleRead"] for e in execs),
        sum(e["totalShuffleWrite"] for e in execs),
    )


def _shuffle_records(app_url: str) -> int:
    """Cumulative shuffle-WRITE record count across all completed stages.
    At local rehearsal scale shuffle BYTES lie (sequential int64 keys
    lz4-compress to ~KB regardless of row count); records through the
    Exchange are the metric that actually scales with the data — a plan
    that exchanges the full corpus shows corpus-linear records even when
    its bytes round to 0.0 MB."""
    with urllib.request.urlopen(f"{app_url}/stages", timeout=10) as r:
        stages = json.load(r)
    return sum(s.get("shuffleWriteRecords", 0) for s in stages
               if s.get("status") == "COMPLETE")


def _app_url(spark) -> str:
    app_id = spark.sparkContext.applicationId
    port = spark.sparkContext.uiWebUrl.rsplit(":", 1)[1]
    return f"http://localhost:{port}/api/v1/applications/{app_id}"


def run_ops(spark, out_dir: str, factors: list[int], runs: int,
            jaccard_cap: Optional[int] = None,
            only: Optional[list[str]] = None) -> dict:
    """``jaccard_cap`` overrides the fixed stop-shingle cap — pass
    ``100 * factor`` to reproduce the SCALE.md ×30 stress run (a FIXED
    cap collapses recall as duplicate-cluster size grows).  ``only``
    restricts to a subset of op names (the base-vs-prefix stress
    comparison is far slower than the rest)."""
    from grower_spark.operators.dedup import (
        drop_common_paragraphs,
        minhash_lsh_pairs,
        ngram_containment_pairs,
        ngram_jaccard_pairs,
        ngram_jaccard_pairs_prefix,
    )

    app = _app_url(spark)
    cap = JACCARD_MAX_DF if jaccard_cap is None else jaccard_cap
    ops = {
        "minhash_lsh_pairs": lambda d: minhash_lsh_pairs(
            d, num_perm=16, bands=4, shingle_n=3, hash_fn="xxhash"
        ),
        "ngram_jaccard_base": lambda d: ngram_jaccard_pairs(
            d, threshold=JACCARD_PROD_THRESHOLD, max_shingle_df=cap
        ),
        "ngram_jaccard_prefix": lambda d: ngram_jaccard_pairs_prefix(
            d, threshold=JACCARD_PROD_THRESHOLD, max_shingle_df=cap
        ),
        "drop_common_paragraphs": lambda d: drop_common_paragraphs(
            d.select("doc_id", F.col("text_par").alias("text")),
            min_df=PARA_MIN_DF,
        ),
        # r9 session-2: containment shares ngram_jaccard's pair-emit core,
        # so its scaling exponent should match ngram_jaccard_base
        "doc_containment": lambda d: ngram_containment_pairs(
            d, threshold=0.25, max_shingle_df=cap
        ),
        # r9 session-3: both should be LINEAR — weighted sampling is one
        # scalar agg + a map-side filter; the adaptive cut's shuffle is
        # the bounded (lang, score) histogram, not the corpus
        "sample_weighted": lambda d: _weighted(d),
        "quality_adaptive": lambda d: _adaptive(d),
        # term affinity: two explode→agg shuffles (map-combinable, so the
        # shuffle tracks vocab growth, sublinear in the corpus) + top-k
        "term_affinity": lambda d: _affinity(d),
        # exact-k: histogram shuffle is groups × buckets × partitions;
        # the rank window sees only the boundary buckets (~0.1%)
        "sample_exact_k": lambda d: _exact_k(d),
        # leakage: corpus explode joined against broadcast bench grams —
        # wall linear in corpus tokens, shuffle = hit rows only
        "benchmark_leakage": lambda d: _leakage(d),
        # precision audit: LSH candidate pass + sample-bounded verify —
        # wall should track the LSH row, not the pair count
        "lsh_precision": lambda d: _precision(d),
        # drift bins: two histogram shuffles (partitions × bins) + a
        # 10-row join — wall should be pure scan growth
        "corpus_drift": lambda d: _drift(d),
        # r10 debuts: gopher is pure map-side (wall = scan growth, one
        # spread shuffle); heavy hitters' shuffle is candidates + the
        # pruned exact counts (bounded by (k-1) x batches, NOT vocab);
        # cluster_sizes inherits the pair-emit + CC family scaling
        "doc_gopher_rules": lambda d: _gopher(d),
        "token_heavy_hitters": lambda d: _heavy_hitters(d),
        "dedup_cluster_sizes": lambda d: _cluster_sizes(d, cap),
        "lang_fertility": lambda d: _fertility(d),
        # r11 debuts: winnowing inherits the posting-list pair-emit
        # family (expect the jaccard-base regime: shuffle tracks the
        # fingerprint stream, pair emit bounded by the df cap; the
        # fingerprint stream itself is ~2/(window+1) of the k-gram
        # stream, so the constant should sit BELOW jaccard's).
        # mixture_plan should be LINEAR-scan/flat-shuffle: the only
        # corpus-wide shuffle is the bounded (group x permille)
        # histogram.
        "dedup_winnowing": lambda d: _winnowing(d, cap),
        "mixture_plan": lambda d: _mixture(d),
    }
    # r12 opt-in legs (--ops edit_distance,edit_distance_uncapped): the
    # only r11 debut without its own measured leg.  The new term over the
    # inherited LSH candidate legs is the PER-PAIR Levenshtein cost:
    # candidate_count × len_a × len_b uncapped, vs candidate_count ×
    # len × (p·len/1000) for the banded capped kernel (the production
    # default) — the rehearsal corpus's ~10%-dropout replicas are long
    # near-identical texts, the early-exit's worst-favorable case.
    # Opt-in because the uncapped counterfactual is expensive by design.
    if only and "edit_distance" in only:
        ops["edit_distance"] = lambda d: _edit_distance(d, cap, True)
    if only and "edit_distance_uncapped" in only:
        ops["edit_distance_uncapped"] = lambda d: _edit_distance(d, cap, False)
    if only:
        ops = {k: v for k, v in ops.items() if k in only}
    results: dict = {}
    for factor in factors:
        path = os.path.join(out_dir, f"x{factor}", "documents.parquet")
        docs = spark.read.parquet(path)
        n_docs = docs.count()
        results[f"x{factor}"] = {"n_docs": n_docs, "ops": {}}
        # opt-in legs (named via --ops only): the r6 training-prep operators.
        # tokenize fits the vocab per factor OUTSIDE the timed loop — the
        # timed op is the encode, the fit is the model step.
        # Both legs put the op's output on the row-count path (a filter over
        # it): the harness materializes with .count(), under which Catalyst
        # column-prunes anything count doesn't need — an unreferenced
        # window/encode disappears entirely (measured: 0 shuffle bytes,
        # flat walls).  A filter can't be pruned, so the encode / the rank
        # window actually runs.
        if only and "tokenize_ids" in only:
            from grower_spark.operators.text import collect_vocab, tokenize_to_ids

            vocab = collect_vocab(docs, k=256)
            ops["tokenize_ids"] = lambda d, v=vocab: tokenize_to_ids(d, v).where(
                F.length("ids_csv") >= 0
            )
        if only and "dedup_clusters" in only:
            # component resolution over the GROWING near-dup pair graph
            # (star backend + the r7 pair-set checkpoint): wall/shuffle
            # should track the PAIR count, not the corpus
            from grower_spark.operators.dedup import (
                duplicate_clusters,
                minhash_lsh_pairs,
            )

            ops["dedup_clusters"] = lambda d: duplicate_clusters(
                minhash_lsh_pairs(
                    d, num_perm=16, bands=4, shingle_n=3, hash_fn="xxhash"
                ),
                backend="star",
            )
        if only and "lm_score" in only:
            # LM scoring leg: the unigram fit runs OUTSIDE the timed loop
            # (the model step); the timed op is the map-literal scoring
            # pass, which like tokenize should show ~zero shuffle bytes
            # and flat walls across the decade.  The filter keeps the
            # scoring on the count path (Catalyst would prune an
            # unreferenced projection entirely).
            from grower_spark.operators.text import fit_unigram_lm, lm_score

            lm = fit_unigram_lm(docs, vocab_k=4096)
            ops["lm_score"] = lambda d, m=lm: lm_score(d, m).where(
                F.col("xent_micro") >= 0
            )
        if only and ("keep_best" in only or "keep_best_corpuswin" in only):
            # r8-judge item 2: quality-aware canonical selection.  The
            # pair graph is computed OUTSIDE the timed loop over a FIXED
            # 1-in-20 subset of the corpus, so duplicates stay a small
            # fraction while the corpus grows — the realistic regime
            # (≫90% singletons) the plan rewrite targets.  (The default
            # rehearsal corpus makes ~every doc a near-dup of its base,
            # which degenerates pair-graph ≈ corpus and measures only the
            # clustering, not the corpus-side resolution.)  `keep_best`
            # is the production plan (pair-graph window + measured
            # broadcast joins, corpus never exchanged);
            # `keep_best_corpuswin` is the RETIRED r8 plan kept as the
            # measured counterfactual — coalesce(cluster_id, id) onto
            # every doc, then ONE window that hash-partitions the FULL
            # corpus.  Shuffle bytes should stay ~flat across the decade
            # for the new plan and grow ~linearly with the corpus for
            # the old one.
            from pyspark.sql import Window

            from grower_spark.operators.dedup import (
                keep_best_per_cluster,
                duplicate_clusters,
                minhash_lsh_pairs,
            )

            pairs_kb = minhash_lsh_pairs(
                docs.where(F.col("doc_id") % 20 == 0),
                num_perm=16, bands=4, shingle_n=3, hash_fn="xxhash",
            ).localCheckpoint()
            docs_q = docs.select(
                "doc_id", (F.xxhash64("doc_id") % 100).alias("q")
            )
            if "keep_best" in only:
                # kept >= 1 (the keepers), NOT an always-true kept >= 0:
                # Catalyst constant-folds cast(bool as int) >= 0 to true
                # and then PRUNES the unreferenced window under count()
                # — the rehearsal would time nothing (measured: the old
                # plan's 50k-row corpus window showed 760 shuffle
                # records before this fix, 50k+ after).
                ops["keep_best"] = lambda d, p=pairs_kb, dq=docs_q: (
                    keep_best_per_cluster(dq, p, "q", backend="star")
                    .where(F.col("kept") >= 1)
                )
            if "keep_best_corpuswin" in only:
                def _old_plan(d, p=pairs_kb, dq=docs_q):
                    cl = duplicate_clusters(p, backend="star").select(
                        F.col("doc_id"), "cluster_id"
                    )
                    withc = dq.join(cl, "doc_id", "left").select(
                        "doc_id", "q",
                        F.coalesce("cluster_id", "doc_id").cast("long")
                        .alias("cluster_id"),
                    )
                    w = Window.partitionBy("cluster_id").orderBy(
                        F.desc("q"), F.asc("doc_id")
                    )
                    return withc.select(
                        "doc_id", "cluster_id", "q",
                        (F.row_number().over(w) == 1).cast("int").alias("kept"),
                    ).where(F.col("kept") >= 1)
                ops["keep_best_corpuswin"] = _old_plan
        if only and "shard_shuffle" in only:
            from grower_spark.operators.sampling import shard_shuffle

            ops["shard_shuffle"] = lambda d: shard_shuffle(
                d.select("doc_id"), "doc_id", 64, salt="sr"
            ).where(F.col("shard_pos") >= 1)
        if only and (
            "minhash_incremental" in only or "minhash_incremental_stored" in only
        ):
            # continuous-ingest measurement: a FIXED-SIZE batch (the x1
            # corpus's row count) deduped against the rest as a band
            # index — wall/shuffle should stay ~flat as the corpus
            # grows, unlike the full-batch pair emit over old ∪ new
            from grower_spark.operators.dedup import (
                minhash_band_index,
                minhash_lsh_pairs_incremental,
            )

            batch_n = 5000
            batch = docs.where(F.col("doc_id") % (max(n_docs // batch_n, 1)) == 0)
            index = minhash_band_index(
                docs.join(batch.select("doc_id"), "doc_id", "left_anti"),
                num_perm=16, bands=4,
            )
            if "minhash_incremental" in only:
                ops["minhash_incremental"] = lambda d, b=batch, ix=index: (
                    minhash_lsh_pairs_incremental(b, ix, num_perm=16, bands=4)
                )
            if "minhash_incremental_stored" in only:
                # the PRODUCTION append shape (r6 verdict item 5): the old
                # side's band index is pre-materialized to parquet (the
                # write_dedup_state path) OUTSIDE the timed loop, so the
                # measured wall/shuffle is the per-batch append cost alone
                # — no live index rebuild hidden inside the timing
                ixp = os.path.join(out_dir, f"x{factor}", "band_index.parquet")
                index.write.mode("overwrite").parquet(ixp)
                stored = spark.read.parquet(ixp)
                ops["minhash_incremental_stored"] = (
                    lambda d, b=batch, ix=stored: minhash_lsh_pairs_incremental(
                        b, ix, num_perm=16, bands=4
                    )
                )
        for name, mk in ops.items():
            mk(docs).count()  # warmup discarded (JIT + file listing)
            wall, sread, swrite, srec, rows = [], [], [], [], 0
            for _ in range(runs):
                r0, w0 = _shuffle_totals(app)
                c0 = _shuffle_records(app)
                t0 = time.monotonic()
                rows = mk(docs).count()
                wall.append(time.monotonic() - t0)
                r1, w1 = _shuffle_totals(app)
                sread.append(r1 - r0)
                swrite.append(w1 - w0)
                srec.append(_shuffle_records(app) - c0)
            wall.sort()
            med = wall[len(wall) // 2]
            results[f"x{factor}"]["ops"][name] = {
                "rows": rows,
                "wall_median_s": round(med, 3),
                "wall_all_s": [round(x, 3) for x in wall],
                "shuffle_read_mb": round(max(sread) / 1e6, 2),
                "shuffle_write_mb": round(max(swrite) / 1e6, 2),
                "shuffle_write_records": max(srec),
            }
            print(f"  x{factor} {name}: {med:.2f}s rows={rows} "
                  f"shw={max(swrite)/1e6:.1f}MB shrec={max(srec)}",
                  file=sys.stderr)
    return results


def main() -> int:
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    g = sub.add_parser("gen")
    g.add_argument("--base", default="/root/testdata/sf0.1")
    g.add_argument("--out", required=True)
    g.add_argument("--factors", default="1,10")
    g.add_argument("--embeddings", action="store_true",
                   help="grow the embeddings table instead of documents")
    g.add_argument("--events", action="store_true",
                   help="grow the events table instead of documents")
    r = sub.add_parser("run")
    r.add_argument("--out", required=True)
    r.add_argument("--factors", default="1,10")
    r.add_argument("--runs", type=int, default=3)
    r.add_argument("--embeddings", action="store_true",
                   help="measure the ANN ops instead of the dedup ops")
    r.add_argument("--events", action="store_true",
                   help="measure the product-analytics ops instead")
    r.add_argument("--jaccard-cap", type=int, default=None,
                   help="override the stop-shingle cap (pass 100*factor to "
                        "reproduce the SCALE.md x30 stress run)")
    r.add_argument("--ops", default=None,
                   help="comma-separated subset of dedup op names")
    args = ap.parse_args()
    factors = [int(x) for x in args.factors.split(",")]
    if args.cmd == "gen":
        spark = _session("scale-gen", ui=False)
        gen = (generate_embeddings if args.embeddings
               else generate_events if args.events else generate)
        for f_ in factors:
            p = gen(spark, args.base, args.out, f_)
            print(f"wrote {p}", file=sys.stderr)
        spark.stop()
        return 0
    spark = _session("scale-run", ui=True)
    if args.embeddings:
        res = run_ann_ops(spark, args.out, factors, args.runs,
                          only=args.ops.split(",") if args.ops else None)
    elif args.events:
        res = run_events_ops(spark, args.out, factors, args.runs)
    else:
        res = run_ops(spark, args.out, factors, args.runs,
                      jaccard_cap=args.jaccard_cap,
                      only=args.ops.split(",") if args.ops else None)
    spark.stop()
    json.dump(res, sys.stdout, indent=2)
    print()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
