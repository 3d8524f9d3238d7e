"""Dedup-LSH recall contract (r9, the symmetric half of lsh_precision):
measured candidate recall of minhash_lsh_pairs against exact-Jaccard
ground truth, by similarity band.  Banding theory for (num_perm=16,
bands=4, rows=4): P(candidate) = 1 - (1 - s^4)^4 — ≈0.95 at s=0.85,
≈0.23 at s=0.5 — so recall must be high in the near-dup band and is
EXPECTED to decay below it; the assertions pin the ordering and the
near-dup floor, not a fiction of perfect recall."""

import pyspark.sql.functions as F


def _shingle_set(text, n=3):
    w = text.split()
    return {" ".join(w[i:i + n]) for i in range(max(len(w) - n + 1, 1))}


def _jaccard(a, b):
    sa, sb = _shingle_set(a), _shingle_set(b)
    return len(sa & sb) / len(sa | sb)


def _make_pairs(n_per_band):
    """(orig, mutated) doc pairs; mutating m spaced tokens of 40 flips
    ~3m of ~38 shingles, sweeping exact Jaccard from ~0.85 (m=1) down
    to ~0.35 (m=6).  Token namespaces are pair-unique so no cross-pair
    similarity exists."""
    rows, truth = [], []
    doc_id = 0
    for m in (1, 2, 5, 6):
        for j in range(n_per_band):
            base = [f"p{m}x{j}t{k}" for k in range(40)]
            mutated = list(base)
            for i in range(m):
                mutated[3 + i * 6] = f"MUT{m}x{j}i{i}"
            a, b = " ".join(base), " ".join(mutated)
            rows += [(doc_id, a), (doc_id + 1, b)]
            truth.append((doc_id, doc_id + 1, m, _jaccard(a, b)))
            doc_id += 2
    return rows, truth


def test_lsh_pair_recall_by_similarity_band(spark):
    from grower_spark.operators.dedup import minhash_lsh_pairs

    rows, truth = _make_pairs(n_per_band=25)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            docs, num_perm=16, bands=4, shingle_n=3, hash_fn="md5"
        ).collect()
    }

    def recall(ms):
        pool = [(a, b) for a, b, m, _ in truth if m in ms]
        hit = sum(1 for p in pool if p in got)
        return hit / len(pool)

    high = recall({1, 2})   # exact jaccard ~0.72-0.85
    low = recall({5, 6})    # exact jaccard ~0.35-0.45
    # sanity on the synthetic spectrum itself
    js = sorted(j for _, _, m, j in truth if m == 1)
    assert js[0] > 0.8, js[0]
    # near-dup band must be found reliably; the far band decays by design
    assert high >= 0.8, (high, low)
    assert high >= low, (high, low)


def test_lsh_pair_recall_improves_with_more_bands(spark):
    """More bands at fixed rows-per-band = more OR chances: recall in
    the mid band must be non-decreasing going (16,4) -> (32,8)."""
    from grower_spark.operators.dedup import minhash_lsh_pairs

    rows, truth = _make_pairs(n_per_band=25)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    mid = [(a, b) for a, b, m, _ in truth if m in (2, 5)]

    def recall(num_perm, bands):
        got = {
            (r.id_a, r.id_b)
            for r in minhash_lsh_pairs(
                docs, num_perm=num_perm, bands=bands, shingle_n=3,
                hash_fn="md5",
            ).collect()
        }
        return sum(1 for p in mid if p in got) / len(mid)

    r4 = recall(16, 4)
    r8 = recall(32, 8)
    assert r8 >= r4, (r4, r8)
