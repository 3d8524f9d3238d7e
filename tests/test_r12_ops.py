"""Round-12: the r11 verdict/advice hardening set — governance-rollup
NULL counts, NaN-label normalization in the hard-negative BLAS twin,
the mixture high-cardinality guard (when-chain cap + join-path
auto-switch), the capped 3-arg Levenshtein production kernel, and the
winnowing xxhash/md5 twin pair-set pin."""

import pytest
import pyspark.sql.functions as F


# --- r11 advice item 1: governance rollup on a drop-free source ---


def test_governance_rollup_dropfree_source_zero_not_null(spark):
    """A source whose docs were ALL kept must report 0 in every drop
    column — sum(cast) over a group whose reasons are all NULL returned
    NULL and diverged from the oracle's count(*) FILTER."""
    from grower_spark.driver_queries import governance_rollup

    base = spark.createDataFrame(
        [(1, "dirty", 10), (2, "dirty", 20), (3, "clean", 30),
         (4, "clean", 40)],
        "doc_id long, source string, _nt long",
    )
    drops = spark.createDataFrame(
        [(1, "quality")], "doc_id long, reason string"
    )
    rows = {r["source"]: r for r in governance_rollup(base, drops).collect()}
    clean = rows["clean"]
    for c in ("n_drop_quality", "n_drop_repetition", "n_drop_exact",
              "n_drop_near_dup"):
        assert clean[c] == 0, f"{c} must be 0, not {clean[c]!r}"
    assert clean["n_kept"] == 2 and clean["kept_tokens"] == 70
    dirty = rows["dirty"]
    assert dirty["n_drop_quality"] == 1 and dirty["n_kept"] == 1
    assert dirty["kept_tokens"] == 20


# --- r11 advice item 2: NaN labels in the hard-negative BLAS twin ---


def test_hard_negative_np_numeric_null_labels(spark):
    """Arrow->pandas renders NULLs in NUMERIC label columns as NaN, which
    fails both `is None` and `==` — the twin must normalize them so the
    eqNullSafe semantics (NULL corpus label = negative for labeled
    queries, NULL-vs-NULL excluded) hold beyond string labels, and must
    stay row-identical to the HOF reference."""
    from grower_spark.operators.similarity import (
        hard_negative_topk,
        hard_negative_topk_np,
    )

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0], 7), (2, [0.9, 0.1], None), (3, [0.8, 0.1], 8),
         (4, [0.7, 0.2], None)],
        "vec_id long, embedding array<double>, label long",
    )
    qn = spark.createDataFrame(
        [(10, [1.0, 0.0], 7), (11, [1.0, 0.0], None)],
        "qid long, qvec array<double>, qlabel long",
    )
    hof = sorted(map(tuple, hard_negative_topk(corpus, qn, k=5).collect()))
    blas = sorted(map(tuple, hard_negative_topk_np(corpus, qn, k=5).collect()))
    assert hof == blas
    got = {}
    for qid, vid, *_ in blas:
        got.setdefault(qid, set()).add(vid)
    # labeled query 10: same-label 1 excluded, NULL-label 2 and 4 kept
    assert got[10] == {2, 3, 4}
    # NULL query 11: NULL-vs-NULL 2 and 4 excluded (pre-fix they leaked
    # in as NaN), labeled 1 and 3 kept
    assert got[11] == {1, 3}


# --- r11 verdict item 2: mixture high-cardinality guard ---


def test_mixture_copy_counts_raises_over_cap():
    from grower_spark.operators.sampling import mixture_copy_counts

    plan_rows = [
        {"g": f"g{i}", "full_epochs": 1, "partial_permille": 0}
        for i in range(11)
    ]
    with pytest.raises(ValueError, match="when-chain compile cap"):
        mixture_copy_counts(plan_rows, "g", "k", max_plan_groups=10)


def test_mixture_assign_copies_join_path_parity(spark):
    """Forcing the join path (cap 0) on a small frame must produce the
    same per-row copy counts as the default when-chain compile —
    including for a NULL group."""
    from grower_spark.operators.sampling import mixture_assign_copies

    df = spark.createDataFrame(
        [(i, ["a", "b", None][i % 3]) for i in range(90)],
        "k long, g string",
    )
    chain = {
        r["k"]: r["_n_copies"]
        for r in mixture_assign_copies(df, "g", 200, "k").collect()
    }
    join = {
        r["k"]: r["_n_copies"]
        for r in mixture_assign_copies(
            df, "g", 200, "k", max_plan_groups=0
        ).collect()
    }
    assert chain == join and len(chain) == 90


def test_mixture_materialize_adversarial_groups_join_path(spark):
    """The adversarial input the r10 prefix_dedup class warns about: a
    group column with 10k+ distinct values.  Must auto-switch to the
    join path (no 10k-deep when-chain, no ValueError) and still produce
    the integer-exact schedule: every group has n=1, weight=1, so
    target 2x rows means exactly 2 epochs per key."""
    from grower_spark.operators.sampling import mixture_materialize

    n = 12_000
    df = spark.range(n).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("g")
    )
    out = mixture_materialize(df, "g", 2 * n, "k")
    assert out.count() == 2 * n
    epochs = {r["epoch"] for r in out.select("epoch").distinct().collect()}
    assert epochs == {0, 1}


def test_mixture_materialize_default_path_still_zero_shuffle(spark):
    """The guard must not change the documented model-sized contract:
    below the cap, materialization stays a pure map-side explode."""
    from grower_spark.operators.sampling import mixture_materialize
    from tools.explain_all import plan_stats

    df = spark.createDataFrame(
        [(i, ["web", "code"][i % 2]) for i in range(40)],
        "k long, g string",
    )
    out = mixture_materialize(df, "g", 80, "k")
    stats = plan_stats(out)
    assert stats["shuffles"] == 0 and stats["joins"] == 0, stats


# --- r11 verdict item 3: capped 3-arg Levenshtein ---


def test_edit_distance_capped_parity_fixture(spark):
    """The capped kernel's per-pair threshold is the LARGEST distance
    that can pass the permille gate, so kept pairs AND reported
    distances must be identical to the uncapped oracle twin on the real
    documents fixture."""
    from tests.conftest import SF_SMALL
    from grower_spark.operators.dedup import edit_distance_pairs

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").where(
        F.col("text").isNotNull()
    )
    capped = sorted(
        map(tuple, edit_distance_pairs(docs, capped=True).collect())
    )
    uncapped = sorted(
        map(tuple, edit_distance_pairs(docs, capped=False).collect())
    )
    assert capped == uncapped and capped, "parity (and non-empty) required"
    assert all(t[2] >= 0 for t in capped), "-1 sentinel must never leak"


def test_edit_distance_cap_boundary(spark):
    """Pairs exactly AT the permille gate stay; one token-edit past it
    drops — under both kernels.  100 unique 2-char tokens (len 299),
    p=200: the gate keeps dist <= 60 ((1000*60) DIV 299 = 200) and cuts
    dist 62 ((1000*62) DIV 299 = 207); uppercasing the first 30 vs 31
    tokens produces exactly those distances."""
    from grower_spark.operators.dedup import edit_distance_pairs

    toks = [chr(97 + i // 26) + chr(97 + i % 26) for i in range(100)]
    base = " ".join(toks)
    at_gate = " ".join([t.upper() for t in toks[:30]] + toks[30:])
    past_gate = " ".join([t.upper() for t in toks[:31]] + toks[31:])
    df = spark.createDataFrame(
        [(1, base), (2, at_gate), (3, past_gate)], "doc_id long, text string"
    )
    for capped in (True, False):
        pairs = {
            (r["id_a"], r["id_b"]): (r["dist"], r["sim_permille"])
            for r in edit_distance_pairs(
                df, max_dist_permille=200, capped=capped,
                num_perm=16, bands=16,  # 1-row bands: recall ~ total
            ).collect()
        }
        assert pairs.get((1, 2)) == (60, 800), (capped, pairs)
        assert (1, 3) not in pairs, (capped, pairs)


def test_edit_distance_kernel_parallelism_floor(spark):
    """The r12 scale finding: AQE sizes shuffle partitions by BYTES, so
    the bytes-small candidate pair table coalesced to ONE partition and
    the CPU-dense Levenshtein pass ran single-threaded (63-69s at the
    x10 rehearsal).  Pin the fix: the scored table keeps at least the
    session's core count of partitions regardless of how small the
    candidate set is."""
    from tests.conftest import SF_SMALL
    from grower_spark.operators.dedup import edit_distance_pairs

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").where(
        F.col("text").isNotNull()
    )
    out = edit_distance_pairs(docs)
    floor = spark.sparkContext.defaultParallelism
    assert out.rdd.getNumPartitions() >= floor


# --- r11 verdict item 7: winnowing xxhash/md5 twin pair-set pin ---


def test_winnowing_xxhash_md5_guaranteed_pairs_fixture(spark):
    """Twin-parity pin for the production xxhash path vs the md5 oracle
    path, honest about what winnowing actually guarantees: each hash
    picks its OWN window minima, so coincidental low-overlap pairs at
    the min_shared margin legitimately differ between hashes — full
    pair-set equality is NOT a property of the algorithm.  What IS
    hash-independent is the shared-run guarantee (>= 1 common
    fingerprint per shared run >= window + k - 1 under ANY hash), so
    genuine near-dups — pairs whose overlap spans several runs — must
    surface under both.  Pin (measured on the fixture: md5-only and
    xx-only pairs top out at n_shared 2-3): every pair with
    n_shared >= 4 under EITHER hash is in the OTHER path's candidate
    set."""
    from tests.conftest import SF_SMALL
    from grower_spark.operators.dedup import winnowing_pairs

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").where(
        F.col("text").isNotNull()
    )
    md5 = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in winnowing_pairs(docs, hash_fn="md5").collect()
    }
    xx = {
        (r["id_a"], r["id_b"]): r["n_shared"]
        for r in winnowing_pairs(docs, hash_fn="xxhash").collect()
    }
    strong_md5 = {p for p, n in md5.items() if n >= 4}
    strong_xx = {p for p, n in xx.items() if n >= 4}
    assert strong_md5 and strong_xx, "fixture must have strong pairs"
    assert strong_md5 <= set(xx), sorted(strong_md5 - set(xx))[:5]
    assert strong_xx <= set(md5), sorted(strong_xx - set(md5))[:5]


def test_winnowing_xxhash_md5_exact_parity_strong_corpus(spark):
    """On a corpus where every duplicate pair shares a LONG run (40
    tokens >> window + k - 1 = 6) and non-pairs draw from disjoint
    vocabularies, the pair sets must be EXACTLY equal under both hash
    functions — the guarantee floods strong pairs with shared
    fingerprints under any hash, and disjoint-vocab docs can share
    none."""
    from grower_spark.operators.dedup import winnowing_pairs

    rows = []
    for d in range(10):
        run = " ".join(f"d{d}shared{i}" for i in range(40))
        pre = " ".join(f"pre{d}w{j}" for j in range(7))
        post = " ".join(f"post{d}w{j}" for j in range(9))
        rows.append((2 * d, f"{pre} {run} {post}"))
        rows.append((2 * d + 1, f"{post} {run} {pre}"))
    for d in range(10):  # unrelated docs, disjoint vocab
        rows.append((100 + d, " ".join(f"solo{d}w{j}" for j in range(50))))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    md5 = {
        (r["id_a"], r["id_b"])
        for r in winnowing_pairs(df, hash_fn="md5").collect()
    }
    xx = {
        (r["id_a"], r["id_b"])
        for r in winnowing_pairs(df, hash_fn="xxhash").collect()
    }
    expected = {(2 * d, 2 * d + 1) for d in range(10)}
    assert md5 == xx == expected, (sorted(md5)[:5], sorted(xx)[:5])
