"""Streaming corpus ingest with incremental dedup: the production
loop that keeps a growing corpus near-dup-free.

Each micro-batch of arriving documents is (1) self-deduped within the
batch, (2) checked against the persisted MinHash band store of
everything already accepted, (3) survivors appended to the corpus AND
to the band store (bands + delta counts), so the very next batch
dedups against them. ``foreachBatch`` is the right tool: the loop
needs batch-scoped writes to three sinks (corpus, store, audit log),
which no single streaming sink expresses.

Ordering semantics: earlier batches win. A document that near-dups
anything already accepted is dropped and logged; within a batch the
lower doc_id survives (same policy as ``pipeline_clean_corpus``).
Batch boundaries therefore affect WHICH duplicate of a pair survives
— never whether a duplicate pair escapes: cross-batch pairs are
caught by the store check because the earlier batch's bands were
appended before the later batch runs.

Scale notes (100 TB corpus, unbounded stream):
* per-batch cost is O(batch): batch-side signatures only, the
  broadcast-pruned guard, candidate-only text reads (see
  ``dedup_against_store``);
* the corpus parquet is append-only and the store appends delta
  counts — no per-batch rewrite of anything corpus-sized;
* the checkpoint makes the loop restartable, and every sink write is
  EXACTLY-ONCE under replay: each batch writes its own
  ``ingest_batch_id={N}`` / ``batch_id={N}`` partition with overwrite
  semantics, and every read inside the batch fences out partitions
  ``>= N`` (``before_batch``), so a re-delivered batch sees exactly
  the pre-batch state, recomputes the identical survivor set, and
  REPLACES its earlier partial writes instead of appending beside
  them. Any crash point is healed by the replay; no compaction or
  consumer-side fencing needed. (Replay means the ENGINE's replay —
  same checkpoint, batch ids pinned by its offsets log. Starting a
  NEW stream with a fresh checkpoint against an already-populated
  corpus/store is not a replay: the new stream re-batches all source
  files from batch 0 and double-ingests — the caveat every
  checkpointed streaming sink shares.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.dedup import (
    append_to_minhash_band_store,
    dedup_against_store,
    minhash_lsh_pairs,
)

__all__ = ["stream_ingest_dedup"]


def stream_ingest_dedup(
    stream_docs: DataFrame,
    store_path: str,
    corpus_path: str,
    audit_path: str,
    checkpoint_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    tau_num: int = 1,
    tau_den: int = 2,
    max_bucket: int = 50,
    timeout_sec: int = 300,
) -> None:
    """Drain ``stream_docs`` (bounded, availableNow) through the
    dedup-ingest loop. ``store_path`` must hold a band store built by
    ``build_minhash_band_store`` (possibly over an empty corpus);
    ``corpus_path`` accumulates accepted documents, one
    ``ingest_batch_id={N}`` partition per batch; ``audit_path``
    accumulates (doc_old, doc_new, kind) drop records partitioned by
    ``batch_id`` — ``kind`` is 'store' (cross-batch) or 'self'
    (within-batch). All three sinks are exactly-once under streaming
    replay (see module docstring).
    NB: audit dirs written before the ``kind`` column existed hold
    3-column files; read such mixed dirs with
    ``option("mergeSchema", "true")`` (old rows read kind=null)."""
    spark = stream_docs.sparkSession
    if "ingest_batch_id" in stream_docs.columns:
        raise ValueError(
            "stream_ingest_dedup reserves the 'ingest_batch_id' column "
            "for the corpus partition key; rename it in the input"
        )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        # within-batch self-dedup: lower id survives
        self_pairs = minhash_lsh_pairs(
            batch_df,
            text_col,
            id_col,
            n=n,
            tau_num=tau_num,
            tau_den=tau_den,
            max_bucket=max_bucket,
        )
        # materialize the pair set once: it feeds the drop filter AND
        # the audit write, and its lineage is the whole LSH job
        self_pairs = self_pairs.localCheckpoint(eager=True)
        self_drop = self_pairs.select(F.col("doc_b").alias(id_col)).distinct()
        batch = batch_df.join(self_drop, on=id_col, how="left_anti")
        # store check: anything near-dupping the accepted corpus drops
        # (first batch ever: no corpus written yet -> empty relation).
        # ONLY the missing-path case falls back to empty — a corrupt
        # or unreadable corpus must fail the batch, and a MISSING
        # corpus alongside a non-empty store means the caller pointed
        # at the wrong corpus dir: an empty substitute would void the
        # verify join and silently admit every duplicate
        from pyspark.errors import AnalysisException

        try:
            corpus = spark.read.parquet(corpus_path)
            # replay fence: a re-delivered batch must dedup against
            # the PRE-batch corpus — its own earlier partial write
            # (and anything later, which can only exist if the
            # checkpoint was deleted) is excluded by partition pruning
            if "ingest_batch_id" in corpus.columns:
                corpus = corpus.filter(
                    F.col("ingest_batch_id") < batch_id
                ).drop("ingest_batch_id")
        except AnalysisException:
            bands = spark.read.parquet(f"{store_path}/bands")
            if bands.limit(1).count() > 0:
                raise ValueError(
                    f"corpus path {corpus_path!r} is unreadable but the "
                    f"band store at {store_path!r} is non-empty — wrong "
                    "corpus dir? Refusing to treat the corpus as empty "
                    "(that would admit every duplicate)."
                )
            corpus = spark.createDataFrame([], batch_df.schema)
        pairs = dedup_against_store(
            batch,
            store_path,
            corpus,
            text_col,
            id_col,
            n=n,
            tau_num=tau_num,
            tau_den=tau_den,
            max_bucket=max_bucket,
            before_batch=batch_id,  # same replay fence, store side
        ).localCheckpoint(eager=True)  # reused by drop filter + audit
        store_drop = pairs.select(F.col("doc_new").alias(id_col)).distinct()
        # materialize survivors before the two appends: without this,
        # each write re-runs the batch dedup lineage (and the second
        # one would run AFTER the corpus append — correct only by
        # virtue of Spark's cached file listing)
        survivors = batch.join(
            store_drop, on=id_col, how="left_anti"
        ).localCheckpoint(eager=True)
        # every sink write targets this batch's OWN partition with
        # overwrite semantics: a replayed batch replaces its earlier
        # partial write instead of appending beside it (exactly-once)
        survivors.write.mode("overwrite").parquet(
            f"{corpus_path}/ingest_batch_id={batch_id}"
        )
        append_to_minhash_band_store(
            survivors, store_path, text_col, id_col, n, batch_id=batch_id
        )
        # audit BOTH drop kinds: cross-batch (store) and within-batch
        # (self) — a provenance consumer must account for every doc
        # that entered the stream but not the corpus
        audit = pairs.select("doc_old", "doc_new").withColumn(
            "kind", F.lit("store")
        ).unionByName(
            self_pairs.select(
                F.col("doc_a").alias("doc_old"), F.col("doc_b").alias("doc_new")
            ).withColumn("kind", F.lit("self"))
        )
        audit.write.mode("overwrite").parquet(
            f"{audit_path}/batch_id={batch_id}"
        )

    q = (
        stream_docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError("stream_ingest_dedup did not finish")
    finally:
        q.stop()
