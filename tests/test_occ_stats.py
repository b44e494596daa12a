"""Persisted occupancy side tables for the ANN-index hot-cell/bucket
guards (VERDICT r14 item 2, the band store's ``counts`` precedent):
every build/append/compact writes ``_occ_counts`` delta partitions so
``max_cell``/``max_bucket`` become a metadata read + broadcast anti
join instead of a corpus-scale groupBy over the index per guarded
run. These tests pin

* stats-path vs recount-path RESULT equality (the guard drops the
  same hot groups either way),
* the plan shape (the stats path reads ``_occ_counts`` and anti-joins
  a broadcast hot set; the recount path aggregates the index),
* the freshness fallback (a foreign write that bypasses the append
  API makes the listing mismatch and the guard silently recounts),
* compaction rewriting the side table with the data it describes.
"""

import shutil
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from tests.conftest import plan_of


def _blob_and_cold(spark, n_blob=30, id0=0):
    # n_blob near-identical vectors (one degenerate bucket/cell) plus
    # a few well-separated cold vectors
    rows = [
        (id0 + i, [1.0, 0.001 * i, 0.0, 0.0]) for i in range(n_blob)
    ] + [
        (id0 + n_blob, [0.0, 1.0, 0.0, 0.0]),
        (id0 + n_blob + 1, [0.0, 1.0, 0.001, 0.0]),
        (id0 + n_blob + 2, [0.0, 0.0, 1.0, 0.0]),
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


def _pairs(df):
    return sorted(
        (r.doc_old, r.doc_new, round(r.cos, 9)) for r in df.collect()
    )


def test_lsh_guard_stats_path_equals_recount(spark, tmp_path):
    from spark_sorted_spark.functions.similarity import (
        _load_occ_counts,
        append_to_ann_lsh_index,
        build_ann_lsh_index,
        cosine_neardup_against_index,
    )

    corpus = _blob_and_cold(spark)
    path = str(tmp_path / "lsh_occ")
    build_ann_lsh_index(corpus, path, n_planes=4, dim=4)
    # grow through BOTH append modes so the delta-row semantics are
    # exercised: idempotent batch partition + base-partition append
    append_to_ann_lsh_index(
        _blob_and_cold(spark, n_blob=10, id0=100), path, batch_id=7
    )
    append_to_ann_lsh_index(
        _blob_and_cold(spark, n_blob=5, id0=200), path
    )

    batch = _blob_and_cold(spark, n_blob=3, id0=900000)
    guarded = cosine_neardup_against_index(
        batch, path, 0.9, max_bucket=10
    )
    plan = plan_of(guarded, "simple")
    # structural signature (see the IVF twin below for why not the
    # _occ_counts path string): stats sum + broadcast anti join
    assert "sum(occ_n" in plan, plan
    assert "LeftAnti" in plan, plan
    with_stats = _pairs(guarded)

    # the blob is hot (45 members across three writes) and must be
    # dropped; the cold buckets (9 members) must survive
    blob_ids = set(range(30)) | set(range(100, 110)) | set(range(200, 205))
    assert with_stats, "cold-bucket pairs must survive the guard"
    assert not any(old in blob_ids for old, _n, _c in with_stats)

    # recount fallback: identical pairs once the side table is gone
    shutil.rmtree(Path(path) / "_occ_counts")
    assert _load_occ_counts(spark, path, "bucket") is None
    recounted = cosine_neardup_against_index(
        batch, path, 0.9, max_bucket=10
    )
    assert "sum(occ_n" not in plan_of(recounted, "simple")
    assert _pairs(recounted) == with_stats

    # unguarded runs never touch the side table
    unguarded = cosine_neardup_against_index(batch, path, 0.9)
    assert "sum(occ_n" not in plan_of(unguarded, "simple")


def test_ivf_guard_stats_path_equals_recount(spark, tmp_path):
    from spark_sorted_spark.functions.similarity import (
        _load_occ_counts,
        append_to_ann_ivf_index,
        build_ann_ivf_index,
        cosine_neardup_against_ivf_index,
    )

    corpus = _blob_and_cold(spark)
    path = str(tmp_path / "ivf_occ")
    build_ann_ivf_index(corpus, path, nlist=3)
    append_to_ann_ivf_index(
        _blob_and_cold(spark, n_blob=10, id0=100), path, batch_id=3
    )
    append_to_ann_ivf_index(
        _blob_and_cold(spark, n_blob=5, id0=200), path
    )

    batch = _blob_and_cold(spark, n_blob=3, id0=900000)
    guarded = cosine_neardup_against_ivf_index(
        batch, path, 0.9, nprobe=1, max_cell=10
    )
    plan = plan_of(guarded, "simple")
    # structural signature of the stats path (the Location strings
    # truncate under long tmp dirs): a metadata-scale sum over the
    # side table's occ_n, anti-joined broadcast — never count(1)
    # grouped over the index relation
    assert "sum(occ_n" in plan, plan
    assert "LeftAnti" in plan, plan
    with_stats = _pairs(guarded)
    assert not any(old < 30 for old, _n, _c in with_stats)

    shutil.rmtree(Path(path) / "_occ_counts")
    assert _load_occ_counts(spark, path, "cell") is None
    recounted = cosine_neardup_against_ivf_index(
        batch, path, 0.9, nprobe=1, max_cell=10
    )
    assert "sum(occ_n" not in plan_of(recounted, "simple")
    assert _pairs(recounted) == with_stats


def test_occ_stats_refuse_stale_listing(spark, tmp_path):
    """A writer that bypasses the append API leaves a data batch
    partition with no stats partition — the side table must be
    REFUSED (listing mismatch), not trusted, and the guard's recount
    fallback must still see the foreign rows."""
    from spark_sorted_spark.functions.similarity import (
        _load_occ_counts,
        build_ann_ivf_index,
        cosine_neardup_against_ivf_index,
    )
    from spark_sorted_spark.sources.bucketed import write_partitioned

    corpus = _blob_and_cold(spark, n_blob=8)
    path = str(tmp_path / "ivf_foreign")
    build_ann_ivf_index(corpus, path, nlist=3)
    assert _load_occ_counts(spark, path, "cell") is not None

    # foreign write: 8 more members forced into the MODAL blob cell
    # (the seeded pick puts one blob member in its own centroid cell,
    # so the blob's bulk sits in one other cell), no stats update.
    # Combined occupancy exceeds max_cell=12; the per-write stats
    # alone would say <= 12 and KEEP the hot cell — the listing check
    # must force the recount instead.
    idx = spark.read.parquet(path)
    mode_row = (
        idx.filter(F.col("vec_id") < 8)
        .groupBy("cell")
        .count()
        .orderBy(F.desc("count"), "cell")
        .head()
    )
    hot_cell, hot_n = int(mode_row.cell), int(mode_row["count"])
    hot_ids = {
        r.vec_id
        for r in idx.filter(
            (F.col("cell") == hot_cell) & (F.col("vec_id") < 8)
        ).collect()
    }
    assert hot_n + 8 > 12  # the recount must see a hot cell
    foreign = _blob_and_cold(spark, n_blob=8, id0=500).limit(8)
    celled = foreign.select(
        "vec_id", "embedding", F.lit(hot_cell).alias("cell")
    )
    write_partitioned(celled, f"{path}/ingest_batch_id=42", "cell")
    assert _load_occ_counts(spark, path, "cell") is None

    batch = _blob_and_cold(spark, n_blob=2, id0=900000)
    got = cosine_neardup_against_ivf_index(
        batch, path, 0.9, nprobe=1, max_cell=12
    )
    assert "sum(occ_n" not in plan_of(got, "simple")
    # recount sees hot_n + 8 > 12 members -> hot cell dropped, both
    # its build members and the foreign rows
    assert not any(
        r.doc_old in hot_ids or 500 <= r.doc_old < 600
        for r in got.collect()
    )


def test_compact_rewrites_occ_stats(spark, tmp_path):
    from spark_sorted_spark.functions.similarity import (
        _load_occ_counts,
        append_to_ann_ivf_index,
        build_ann_ivf_index,
        compact_ann_index,
        cosine_neardup_against_ivf_index,
    )

    corpus = _blob_and_cold(spark)
    path = str(tmp_path / "ivf_compact")
    build_ann_ivf_index(corpus, path, nlist=3)
    append_to_ann_ivf_index(
        _blob_and_cold(spark, n_blob=10, id0=100), path, batch_id=1
    )
    batch = _blob_and_cold(spark, n_blob=3, id0=900000)
    before = _pairs(
        cosine_neardup_against_ivf_index(
            batch, path, 0.9, nprobe=1, max_cell=10
        )
    )

    compact_ann_index(spark, path)
    stats = _load_occ_counts(spark, path, "cell")
    assert stats is not None
    # collapsed to the base partition: one row per cell, totals kept
    total = stats.agg(F.sum("occ_n").alias("s")).head().s
    assert total == 33 + 13
    after_df = cosine_neardup_against_ivf_index(
        batch, path, 0.9, nprobe=1, max_cell=10
    )
    assert "sum(occ_n" in plan_of(after_df, "simple")
    assert _pairs(after_df) == before


def test_sq8_and_pq_builds_write_occ_stats(spark, tmp_path):
    from spark_sorted_spark.functions.similarity import (
        _load_occ_counts,
        append_to_ann_ivfsq8_index,
        build_ann_ivfpq_index,
        build_ann_ivfsq8_index,
        cosine_neardup_against_ivf_index,
    )

    corpus = _blob_and_cold(spark)
    sq8 = str(tmp_path / "sq8_occ")
    build_ann_ivfsq8_index(corpus, sq8, nlist=3, dim=4)
    append_to_ann_ivfsq8_index(
        _blob_and_cold(spark, n_blob=4, id0=100), sq8, batch_id=1
    )
    stats = _load_occ_counts(spark, sq8, "cell")
    assert stats is not None
    assert stats.agg(F.sum("occ_n")).head()[0] == 33 + 7
    batch = _blob_and_cold(spark, n_blob=2, id0=900000)
    guarded = cosine_neardup_against_ivf_index(
        batch, sq8, 0.9, nprobe=1, max_cell=10
    )
    assert "sum(occ_n" in plan_of(guarded, "simple")
    assert not any(r.doc_old < 30 for r in guarded.collect())

    pq = str(tmp_path / "ivfpq_occ")
    build_ann_ivfpq_index(corpus, pq, nlist=3, m=2, ksub=4, dim=4)
    assert _load_occ_counts(spark, pq, "cell") is not None


def test_empty_corpus_build_then_append(spark, tmp_path):
    """Regression (round-15 review): the occ-stats read-back of a
    just-written EMPTY base partition (only _SUCCESS, no parquet
    files) crashed every empty-corpus build with
    UNABLE_TO_INFER_SCHEMA — but build-empty-then-append is a
    supported bootstrap flow (_check_corpus_dim explicitly tolerates
    empty corpora, and the streaming maintainers start from it)."""
    from spark_sorted_spark.functions.similarity import (
        ann_lsh_topk_indexed,
        append_to_ann_lsh_index,
        build_ann_lsh_index,
    )

    empty = spark.createDataFrame(
        [], "vec_id bigint, embedding array<double>"
    )
    path = str(tmp_path / "lsh_bootstrap")
    build_ann_lsh_index(empty, path, n_planes=4, dim=4)
    append_to_ann_lsh_index(
        _blob_and_cold(spark, n_blob=5), path, batch_id=0
    )
    got = ann_lsh_topk_indexed(spark, path, [1.0, 0.0, 0.0, 0.0], k=3)
    assert got.count() == 3


def test_reland_batch_stats_match_new_rows(spark, tmp_path):
    """A RE-LANDED batch id (replay of a batch whose earlier attempt
    completed BOTH writes) must leave stats describing the NEW rows.
    The invalidate-first ordering is what makes every crash point
    between the data overwrite and the stats rewrite
    listing-detectable (stats partition missing -> guards recount)
    instead of silently stale."""
    from spark_sorted_spark.functions.similarity import (
        _invalidate_occ_counts,
        _load_occ_counts,
        append_to_ann_ivf_index,
        build_ann_ivf_index,
    )

    corpus = _blob_and_cold(spark)
    path = str(tmp_path / "ivf_reland")
    build_ann_ivf_index(corpus, path, nlist=3)
    append_to_ann_ivf_index(
        _blob_and_cold(spark, n_blob=10, id0=100), path, batch_id=5
    )
    stats = _load_occ_counts(spark, path, "cell")
    assert stats is not None
    assert stats.agg(F.sum("occ_n")).head()[0] == 33 + 13

    # re-land batch 5 with a DIFFERENT (smaller) row set
    append_to_ann_ivf_index(
        _blob_and_cold(spark, n_blob=2, id0=300), path, batch_id=5
    )
    stats = _load_occ_counts(spark, path, "cell")
    assert stats is not None
    assert stats.agg(F.sum("occ_n")).head()[0] == 33 + 5

    # the crash-window primitive a re-land runs BEFORE touching data:
    # dropping the batch's stats partition makes the listing mismatch,
    # so the side table is refused until the stats rewrite lands
    _invalidate_occ_counts(spark, path, 5)
    assert _load_occ_counts(spark, path, "cell") is None
