"""Round-13 hardening tests: the r12 advice items (mixture schedule
cached before the dispatch probe) plus this round's operator work."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest


def test_mixture_join_path_reuses_cached_schedule(spark):
    """r12 advice item 4: on the join path the fitted schedule is
    evaluated twice (probe collect + join onto df).  The schedule must
    be cached before the probe so the join reads an InMemoryRelation
    instead of repeating the corpus-wide histogram aggregation."""
    from grower_spark.operators.sampling import mixture_assign_copies

    df = spark.createDataFrame(
        [(i, str(i % 7)) for i in range(70)], "k long, g string"
    )
    out = mixture_assign_copies(df, "g", 140, "k", max_plan_groups=0)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "InMemoryRelation" in plan, plan
    # values unchanged by the cache (sum over a uniform 7-group frame)
    total = out.agg(F.sum("_n_copies")).collect()[0][0]
    assert total == 140


def test_mixture_when_chain_path_releases_cache(spark):
    """Below the cap the probe rows are the schedule's only use — the
    cache must be released, not left pinning executor memory."""
    from grower_spark.operators.sampling import mixture_assign_copies

    df = spark.createDataFrame(
        [(i, ["a", "b"][i % 2]) for i in range(40)], "k long, g string"
    )
    before = {r.id() for r in
              spark.sparkContext._jsc.sc().getRDDStorageInfo()}
    out = mixture_assign_copies(df, "g", 80, "k")
    out.count()
    after = {r.id() for r in
             spark.sparkContext._jsc.sc().getRDDStorageInfo()}
    assert after <= before, (before, after)
