"""End-to-end corpus dedup driver: the composed training-data pipeline a
reference user runs to turn a raw document table into a keep-list.

    normalize -> exact dedup -> near-dup pairs (minhash LSH) ->
    connected components -> keep lowest id per cluster -> keep-list parquet

Every stage is one of the package operators; the composition is itself
declarative until the (iterative) clustering step.  Output:

    <out>/keep_list/    (doc_id)            — documents to KEEP
    <out>/drop_list/    (doc_id, kept_id, reason)  — dropped + why

Usage:
    python tools/dedup_corpus.py <input parquet dir/file> <out dir>
        [--text-col text] [--id-col doc_id] [--threshold-bands 4]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def build_keep_drop(docs, id_col: str = "doc_id", text_col: str = "text",
                    num_perm: int = 16, bands: int = 4,
                    min_shared_bands: int = 2, max_bucket_width: int = 2000,
                    quality_df=None):
    """Returns (keep_df[doc_id], drop_df[doc_id, kept_id, reason]).

    With ``quality_df`` ((id_col, quality) — e.g. quality_signals'
    0..4 score), BOTH dedup stages keep the highest-quality member of
    each duplicate group instead of the lowest id (ties, and docs with
    no quality row, fall back to the lowest id) — the production
    decision when duplicates differ in extraction quality.  The
    canonical choice changes; the keep/drop PARTITION of doc ids does
    not, so downstream counts are unaffected.
    """
    from pyspark.sql import Window

    from grower_spark.operators.dedup import (
        duplicate_clusters,
        exact_dedup,
        minhash_lsh_pairs,
    )
    from grower_spark.operators.text import normalize_text

    from grower_spark.functions.hashing import md5_60

    norm = normalize_text(docs, text_col=text_col).cache()

    def _best_in(df, group_col):
        # keep_id = the (quality DESC NULLS LAST, id ASC) argmax of the
        # group — one group-keyed window; groups are duplicate-family
        # sized.  desc_nulls_last keeps quality-less docs from winning.
        w = Window.partitionBy(group_col).orderBy(
            F.desc_nulls_last("_q"), F.asc(id_col)
        ).rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        return df.select(
            id_col, group_col, F.first(id_col).over(w).alias("keep_id")
        )

    # 1. exact duplicates on the canonical form: doc -> keep_id via the
    #    content hash (min id, or quality argmax when quality_df given)
    keyed = norm.select(F.col(id_col), md5_60(F.col("text_norm")).alias("h60"))
    if quality_df is not None:
        q = quality_df.select(
            F.col(id_col), F.col(quality_df.columns[1]).alias("_q")
        )
        # NULL-text docs hash to h60=NULL; the window's partitionBy would
        # collapse ALL of them into one "duplicate group" (SQL windows
        # group NULL keys together) and drop every one but the argmax.
        # The default path's inner join on h60 never matches NULL keys,
        # so those docs are kept — match that: exclude NULL h60 from the
        # exact grouping entirely (they fall through to `keep` via the
        # final left_anti, same as the non-quality mode).
        exact_map = _best_in(
            keyed.where(F.col("h60").isNotNull()).join(q, id_col, "left"),
            "h60",
        ).select(id_col, "keep_id")
    else:
        exact = exact_dedup(norm, text_col="text_norm", id_col=id_col)
        exact_map = keyed.join(
            exact.select(F.col("text_h60").alias("h60"), "keep_id"), "h60"
        ).select(id_col, "keep_id")
    exact_drops = exact_map.where(F.col(id_col) != F.col("keep_id")).select(
        F.col(id_col),
        F.col("keep_id").alias("kept_id"),
        F.lit("exact").alias("reason"),
    )

    # 2. near-dup pairs among the exact survivors only
    survivors = exact_map.where(F.col(id_col) == F.col("keep_id")).select(id_col)
    pool = norm.join(survivors, id_col)
    pairs = minhash_lsh_pairs(
        pool, id_col=id_col, text_col="text_norm", num_perm=num_perm,
        bands=bands, max_bucket_width=max_bucket_width,
    ).where(F.col("n_bands") >= min_shared_bands)

    # 3. clusters -> keep one doc per near-dup cluster (lowest id, or
    #    quality argmax); singletons never enter `clusters` and keep
    #    themselves either way
    clusters = duplicate_clusters(pairs, id_a="id_a", id_b="id_b")
    if quality_df is not None:
        members = clusters.select(
            F.col("doc_id").alias(id_col), "cluster_id"
        ).join(q, id_col, "left")
        near_drops = _best_in(members, "cluster_id").where(
            F.col(id_col) != F.col("keep_id")
        ).select(
            F.col(id_col),
            F.col("keep_id").alias("kept_id"),
            F.lit("near-dup").alias("reason"),
        )
    else:
        near_drops = clusters.where(
            F.col("doc_id") != F.col("cluster_id")
        ).select(
            F.col("doc_id").alias(id_col),
            F.col("cluster_id").alias("kept_id"),
            F.lit("near-dup").alias("reason"),
        )

    # re-point exact drops whose keeper was itself dropped as a near-dup
    # (the append path's ADVICE-r7 invariant, applied to the batch build
    # too): near kept_ids are terminal — cluster canonicals survive stage
    # 3 — so one pass closes the chain and every kept_id references a
    # SURVIVING doc
    repoint = near_drops.select(
        F.col(id_col).alias("_gone"), F.col("kept_id").alias("_canon")
    )
    exact_drops = (
        exact_drops.join(repoint, exact_drops.kept_id == F.col("_gone"), "left")
        .select(
            id_col,
            F.coalesce(F.col("_canon"), F.col("kept_id")).alias("kept_id"),
            "reason",
        )
    )

    drops = exact_drops.unionByName(near_drops)
    keep = docs.select(id_col).join(drops.select(id_col), id_col, "left_anti")
    return keep, drops


def write_dedup_state(docs_kept, state_dir: str, id_col: str = "doc_id",
                      text_col: str = "text", num_perm: int = 16,
                      bands: int = 4, batch_id: str = "base") -> None:
    """Persist the dedup state of a (kept) corpus for later appends:

        <state>/exact_hashes/  (h60, keep_id)   canonical-form content hash
        <state>/band_index/    (doc_id, bucket) MinHash band buckets

    Both derive from the NORMALIZED text, matching build_keep_drop.  At
    100 TB, additionally bucket-partition band_index on ``bucket`` so an
    append's join prunes to touched buckets; here it's plain parquet.

    Idempotent appends (r6 advice): both tables are partitioned by
    ``batch_id`` and written with DYNAMIC partition overwrite, so a
    RETRIED append replaces its own partition instead of double-appending
    the batch's survivors, and a crash between the two writes is healed
    by the retry (each table's partition is rewritten whole).  The caller
    must pass a batch_id that is stable across retries of the same batch
    (append_keep_drop derives one from the batch's content hashes).
    """
    from grower_spark.functions.hashing import md5_60
    from grower_spark.operators.dedup import minhash_band_index
    from grower_spark.operators.text import normalize_text

    norm = normalize_text(docs_kept, text_col=text_col)
    hashes = norm.select(
        md5_60(F.col("text_norm")).alias("h60"), F.col(id_col).alias("keep_id")
    ).dropDuplicates(["h60"])
    index = minhash_band_index(
        norm, id_col=id_col, text_col="text_norm", num_perm=num_perm, bands=bands
    )
    for name, df in (("exact_hashes", hashes), ("band_index", index)):
        (
            df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(os.path.join(state_dir, name))
        )


def append_keep_drop(spark, new_docs, state_dir: str, id_col: str = "doc_id",
                     text_col: str = "text", num_perm: int = 16,
                     bands: int = 4, min_shared_bands: int = 2,
                     max_bucket_width: int = 2000, update_state: bool = True,
                     batch_id: str | None = None):
    """Dedup a NEW ingest batch against the persisted corpus state —
    old↔old work never recurs, per-batch cost is O(batch + collisions).

    Returns (keep_df[doc_id], drops_df[doc_id, kept_id, reason]); reasons:
    ``exact`` (in-batch), ``exact-vs-corpus``, ``near-dup`` (in-batch
    cluster), ``near-dup-vs-corpus``.  ``batch_id`` names this batch's
    partition in the persisted state (stable across retries ->
    idempotent append); by default it is derived from the batch's content
    hashes, so retrying the same batch overwrites its own partition
    instead of double-appending survivors.  Policy note vs a monolithic
    rerun:
    corpus matches are dropped first and clustering runs among the
    *remaining* batch docs, so a batch doc chained to the corpus only
    through another (already dropped) batch doc survives — transitive
    chains across batch boundaries resolve per-batch, the standard
    trade of incremental dedup.  With ``update_state`` the surviving
    batch docs' hashes and band buckets are appended to the state, so
    the next batch dedups against old ∪ this batch.
    """
    from grower_spark.functions.hashing import md5_60
    from grower_spark.operators.dedup import (
        duplicate_clusters,
        exact_dedup,
        minhash_lsh_pairs_incremental,
    )
    from grower_spark.operators.text import normalize_text

    norm = normalize_text(new_docs, text_col=text_col).cache()
    keyed = norm.select(F.col(id_col), md5_60(F.col("text_norm")).alias("h60"))

    if batch_id is None:
        # stable across retries: derived from the batch's content hashes
        # + id span, never from wall clock or job id.  (Two DIFFERENT
        # batches colliding would need identical count, id span, and
        # mod-p hash sum — in practice only a retry reproduces it.)
        sig = keyed.agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(F.col("h60") % F.lit(1000000007)).alias("s"),
            F.min(F.col(id_col)).alias("mn"),
            F.max(F.col(id_col)).alias("mx"),
        ).collect()[0]
        batch_id = f"b{sig['c']}_{sig['s']}_{sig['mn']}_{sig['mx']}"

    # Exclude THIS batch's own state partition: a retry after a crashed
    # or completed previous attempt must dedup against exactly the state
    # the first attempt saw, not against its own survivors (otherwise
    # every retried doc "matches the corpus" — itself — and drops).
    hashes = spark.read.parquet(os.path.join(state_dir, "exact_hashes"))
    index = spark.read.parquet(os.path.join(state_dir, "band_index"))
    if "batch_id" in hashes.columns:
        hashes = hashes.where(F.col("batch_id") != batch_id)
    if "batch_id" in index.columns:
        index = index.where(F.col("batch_id") != batch_id)

    # 1. in-batch exact
    exact = exact_dedup(norm, text_col="text_norm", id_col=id_col)
    exact_map = keyed.join(
        exact.select(F.col("text_h60").alias("h60"), "keep_id"), "h60"
    ).select(id_col, "h60", "keep_id")
    exact_drops = exact_map.where(F.col(id_col) != F.col("keep_id")).select(
        F.col(id_col), F.col("keep_id").alias("kept_id"),
        F.lit("exact").alias("reason"),
    )
    survivors = exact_map.where(F.col(id_col) == F.col("keep_id")).select(
        id_col, "h60"
    )

    # 2. exact vs corpus (hash join against the stored hashes)
    corpus_exact = survivors.join(
        hashes.select("h60", F.col("keep_id").alias("_cid")), "h60"
    ).select(
        F.col(id_col), F.col("_cid").alias("kept_id"),
        F.lit("exact-vs-corpus").alias("reason"),
    )
    # re-point in-batch exact drops whose keeper is itself dropped as
    # exact-vs-corpus (r6 advice): every kept_id in the drop list must
    # reference a SURVIVING doc, so those drops inherit the corpus
    # canonical instead of a non-surviving in-batch keeper
    repoint = corpus_exact.select(
        F.col(id_col).alias("_gone"), F.col("kept_id").alias("_canon")
    )
    exact_drops = (
        exact_drops.join(repoint, exact_drops.kept_id == F.col("_gone"), "left")
        .select(
            id_col,
            F.coalesce(F.col("_canon"), F.col("kept_id")).alias("kept_id"),
            "reason",
        )
    )
    pool_ids = survivors.select(id_col).join(
        corpus_exact.select(id_col), id_col, "left_anti"
    )
    pool = norm.join(pool_ids, id_col)

    # 3. near-dup, incremental: one join against the stored band index
    pairs = minhash_lsh_pairs_incremental(
        pool, index, id_col=id_col, text_col="text_norm", num_perm=num_perm,
        bands=bands, max_bucket_width=max_bucket_width,
    ).where(F.col("n_bands") >= min_shared_bands)
    batch_ids = pool.select(F.col(id_col).alias("_bid"))
    # classify each pair side: a pair is vs-corpus when one id is not in
    # the batch
    p = (
        pairs.join(batch_ids, pairs.id_a == F.col("_bid"), "left")
        .withColumnRenamed("_bid", "_a_in")
        .join(batch_ids, pairs.id_b == F.col("_bid"), "left")
        .withColumnRenamed("_bid", "_b_in")
    )
    vs_corpus = p.where(F.col("_a_in").isNull() | F.col("_b_in").isNull()).select(
        F.when(F.col("_a_in").isNull(), F.col("id_b")).otherwise(F.col("id_a")).alias(id_col),
        F.when(F.col("_a_in").isNull(), F.col("id_a")).otherwise(F.col("id_b")).alias("_old"),
    )
    near_corpus_drops = vs_corpus.groupBy(id_col).agg(
        F.min("_old").alias("kept_id")
    ).select(id_col, "kept_id", F.lit("near-dup-vs-corpus").alias("reason"))

    # 4. in-batch near-dup clusters among docs NOT already dropped
    in_batch_pairs = p.where(
        F.col("_a_in").isNotNull() & F.col("_b_in").isNotNull()
    ).select("id_a", "id_b")
    dropped_so_far = near_corpus_drops.select(id_col)
    in_batch_pairs = (
        in_batch_pairs.join(
            dropped_so_far, in_batch_pairs.id_a == dropped_so_far[id_col], "left_anti"
        ).join(
            dropped_so_far, F.col("id_b") == dropped_so_far[id_col], "left_anti"
        )
    )
    clusters = duplicate_clusters(in_batch_pairs, id_a="id_a", id_b="id_b")
    near_drops = clusters.where(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col), F.col("cluster_id").alias("kept_id"),
        F.lit("near-dup").alias("reason"),
    )

    # Second re-point pass (ADVICE r7): an in-batch exact keeper that
    # survived the exact stages and entered the pool can STILL be dropped
    # as near-dup (vs corpus or in-batch cluster); its exact-drop rows
    # must follow it to the surviving canonical, or the invariant "every
    # kept_id references a SURVIVING doc" breaks.  Both near kept_ids are
    # terminal (corpus/index docs and in-batch cluster reps survive), so
    # one pass closes the chain.
    repoint2 = near_corpus_drops.unionByName(near_drops).select(
        F.col(id_col).alias("_gone2"), F.col("kept_id").alias("_canon2")
    )
    exact_drops = (
        exact_drops.join(repoint2, exact_drops.kept_id == F.col("_gone2"), "left")
        .select(
            id_col,
            F.coalesce(F.col("_canon2"), F.col("kept_id")).alias("kept_id"),
            "reason",
        )
    )

    drops = (
        exact_drops.unionByName(corpus_exact)
        .unionByName(near_corpus_drops)
        .unionByName(near_drops)
    )
    # Materialize the decision ONCE (eager localCheckpoint): the caller's
    # keep/drop writes and the state update below would otherwise each
    # re-run the whole dedup DAG, and the norm cache could never be
    # released (r6 advice: repeated appends in one long-lived session
    # accumulated cached blocks).  After the checkpoint the lineage no
    # longer references norm, so unpersist is safe immediately.
    drops = drops.localCheckpoint(eager=True)
    norm.unpersist()
    keep = new_docs.select(id_col).join(drops.select(id_col), id_col, "left_anti")

    if update_state:
        kept_docs = new_docs.join(keep, id_col)
        write_dedup_state(
            kept_docs, state_dir, id_col=id_col, text_col=text_col,
            num_perm=num_perm, bands=bands, batch_id=batch_id,
        )
    return keep, drops


def stream_append(stream_docs, state_dir: str, out_dir: str,
                  id_col: str = "doc_id", text_col: str = "text",
                  checkpoint_dir: str | None = None, **kw):
    """Continuous-ingest dedup as a Structured Streaming sink: each
    micro-batch runs ``append_keep_drop`` against the persisted state via
    ``foreachBatch`` and appends its keep/drop decisions (tagged with the
    epoch) under ``out_dir``.

    Exactly-once story: the streaming epoch id IS the state batch_id
    (``sb{epoch}``), so a replayed epoch — after a crash between the
    output write and the checkpoint commit — overwrites its own state
    partition instead of double-appending, and dedups against exactly
    the state its first attempt saw (the batch-id exclusion in
    append_keep_drop).  The keep/drop parquet appends deduplicate on
    epoch at read time for the same reason (read with
    ``dropDuplicates([id_col])`` if replays matter downstream).

    Returns the started StreamingQuery; callers own awaitTermination.
    """
    def handle(batch_df, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        keep, drops = append_keep_drop(
            spark, batch_df, state_dir, id_col=id_col, text_col=text_col,
            batch_id=f"sb{epoch_id}", **kw,
        )
        tag = F.lit(int(epoch_id)).alias("epoch")
        keep.withColumn("epoch", tag).write.mode("append").parquet(
            os.path.join(out_dir, "keep_list")
        )
        drops.withColumn("epoch", tag).write.mode("append").parquet(
            os.path.join(out_dir, "drop_list")
        )

    writer = stream_docs.writeStream.foreachBatch(handle).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.trigger(availableNow=True).start()


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("input")
    ap.add_argument("out")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--threshold-bands", type=int, default=2,
                    help="min shared LSH bands to call a near-dup")
    ap.add_argument("--state-dir", default=None,
                    help="persist/consume dedup state (exact hashes + band "
                         "index) for incremental appends")
    ap.add_argument("--append", action="store_true",
                    help="treat input as a NEW batch and dedup it against "
                         "--state-dir instead of rebuilding from scratch")
    ap.add_argument("--stream", action="store_true",
                    help="treat input as a STREAMING directory: each parquet "
                         "micro-batch appends against --state-dir via "
                         "foreachBatch (epoch-idempotent)")
    ap.add_argument("--checkpoint-dir", default=None,
                    help="streaming checkpoint location (with --stream)")
    ap.add_argument("--batch-id", default=None,
                    help="stable state-partition name for --append (defaults "
                         "to a content-derived id; pass your ingest batch "
                         "name to make retries explicit)")
    ap.add_argument("--retire-from-index", default=None,
                    help="ANN index directory: tombstone this run's dropped "
                         "doc ids there (delete_from_ann_index), so retired "
                         "near-duplicates stop serving retrieval queries "
                         "immediately — the dedup-pass -> index-lifecycle "
                         "handoff (ids must be the index's vec_ids; "
                         "idempotent, so re-running over an accumulated "
                         "drop_list is harmless)")
    args = ap.parse_args()
    if (args.append or args.stream) and not args.state_dir:
        ap.error("--append/--stream require --state-dir")

    from grower_spark.session import get_spark

    spark = get_spark("dedup-corpus")
    if args.stream:
        # schema inferred from the files already present; availableNow
        # drains everything and returns
        schema = spark.read.parquet(args.input).schema
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(args.input)
        )
        q = stream_append(
            sdf, args.state_dir, args.out, id_col=args.id_col,
            text_col=args.text_col, checkpoint_dir=args.checkpoint_dir,
            min_shared_bands=args.threshold_bands,
        )
        q.awaitTermination()
        n_keep = spark.read.parquet(os.path.join(args.out, "keep_list")).count()
        n_drop = spark.read.parquet(os.path.join(args.out, "drop_list")).count()
        print(f"streamed keep={n_keep} dropped={n_drop}")
        _retire(spark, args, os.path.join(args.out, "drop_list"))
        spark.stop()
        return 0
    docs = spark.read.parquet(args.input)
    if args.append:
        keep, drops = append_keep_drop(
            spark, docs, args.state_dir, id_col=args.id_col,
            text_col=args.text_col, min_shared_bands=args.threshold_bands,
            batch_id=args.batch_id,
        )
    else:
        keep, drops = build_keep_drop(
            docs, id_col=args.id_col, text_col=args.text_col,
            min_shared_bands=args.threshold_bands,
        )
    keep.write.mode("overwrite").parquet(os.path.join(args.out, "keep_list"))
    drops.write.mode("overwrite").parquet(os.path.join(args.out, "drop_list"))
    if args.state_dir and not args.append:
        kept_docs = docs.join(keep.select(args.id_col), args.id_col)
        write_dedup_state(
            kept_docs, args.state_dir, id_col=args.id_col,
            text_col=args.text_col,
        )
    n_in = docs.count()
    n_keep = keep.count()
    print(f"input={n_in} keep={n_keep} dropped={n_in - n_keep}")
    _retire(spark, args, os.path.join(args.out, "drop_list"))
    spark.stop()
    return 0


def _retire(spark, args, drop_list_path: str) -> None:
    """--retire-from-index: tombstone the run's dropped ids in the given
    ANN index (reads the just-written drop_list so every mode — batch,
    append, stream — hands over the same artifact; deletes are
    idempotent, so an accumulated drop_list re-retires harmlessly)."""
    if not args.retire_from_index:
        return
    from grower_spark.operators.ann_index import delete_from_ann_index

    dropped = spark.read.parquet(drop_list_path).select(args.id_col)
    res = delete_from_ann_index(spark, args.retire_from_index, dropped)
    print(f"retired-from-index={res['tombstoned']} "
          f"(index {args.retire_from_index})")


if __name__ == "__main__":
    sys.exit(main())
