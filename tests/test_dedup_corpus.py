"""End-to-end corpus dedup composition (tools/dedup_corpus.py):
normalize -> exact dedup -> LSH near-dup pairs -> clusters -> keep-list.
Planted exact variants and near-dups must drop; unique docs must keep."""

import pyspark.sql.functions as F

BASE = (
    "the quick brown fox jumps over the lazy dog while a cat sleeps near "
    "the warm stove and birds sing outside the open window all day long"
)


def test_keep_drop_composition(spark):
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from dedup_corpus import build_keep_drop

    docs = spark.createDataFrame(
        [
            (0, BASE),
            (1, BASE.upper()),                     # exact after normalize
            (2, BASE + "  "),                      # exact after normalize
            (3, BASE.replace("cat", "kitten")),    # near-dup of 0
            (4, "entirely different content about rivers and mountains and "
                "forests stretching far beyond the horizon under a pale sky"),
        ],
        ["doc_id", "text"],
    )
    keep, drops = build_keep_drop(docs, min_shared_bands=1)
    kept = sorted(r["doc_id"] for r in keep.collect())
    dropped = {r["doc_id"]: (r["kept_id"], r["reason"]) for r in drops.collect()}

    assert 0 in kept and 4 in kept          # cluster representative + unique
    assert dropped[1] == (0, "exact")
    assert dropped[2] == (0, "exact")
    assert 3 in dropped and dropped[3][1] == "near-dup" and dropped[3][0] == 0
    assert set(kept) | set(dropped) == {0, 1, 2, 3, 4}
    assert set(kept) & set(dropped) == set()
