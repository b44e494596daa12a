"""Deterministic sampling for training-data pipelines.

``DataFrame.sample``/``sampleBy`` are Bernoulli draws from a seeded
RNG — reproducible within one Spark version but opaque to any other
engine and unstable under repartitioning. Pretraining mixes want
*content-deterministic* sampling: whether a row is kept depends only
on its id, so reruns, backfills, and other engines agree row-for-row.

``hash_sample`` keeps a row iff ``md5(id) mod den < num`` — an
engine-portable coin flip (DuckDB oracle computes the identical md5
prefix). ``stratified_hash_sample`` applies a per-stratum rate: the
downsample-the-boilerplate / upweight-the-rare-language step of a
corpus mix, exactly reproducible.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_sample",
    "stratified_hash_sample",
    "hash_split",
    "negative_pairs",
]


def _hash_bucket(id_col: Column, den: int) -> Column:
    # first 8 hex chars of md5 -> int32-range value, mod den; same
    # expression is expressible verbatim in DuckDB
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
    return F.pmod(h.cast("bigint"), F.lit(den))


def hash_sample(
    df: DataFrame, id_col: str, num: int, den: int = 100
) -> DataFrame:
    """Keep ~num/den of rows, chosen by content hash of ``id_col`` —
    deterministic across runs, engines, and partitionings."""
    return df.filter(_hash_bucket(F.col(id_col), den) < num)


def stratified_hash_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: Mapping[str, tuple[int, int]],
    default: tuple[int, int] = (1, 1),
) -> DataFrame:
    """Per-stratum deterministic sampling: ``rates[stratum] = (num,
    den)`` keeps ~num/den of that stratum's rows. Strata not listed
    use ``default`` (keep-all by default). One narrow filter — no
    shuffle, no RNG state."""
    num, den = default
    keep: Column = _hash_bucket(F.col(id_col), den) < num
    expr = keep
    for stratum, (n, d) in rates.items():
        cond = F.col(strata_col) == stratum
        expr = F.when(cond, _hash_bucket(F.col(id_col), d) < n).otherwise(expr)
    return df.filter(expr)


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: Mapping[str, int],
    split_col: str = "split",
) -> DataFrame:
    """Deterministic disjoint train/val/test splitting: assign every
    row exactly one label from ``weights`` (e.g. ``{"train": 98,
    "val": 1, "test": 1}``) by content hash of ``id_col``. The same
    row lands in the same split on every rerun, engine, and partition
    layout — and splits are disjoint BY CONSTRUCTION (one bucket
    draw, consecutive ranges), unlike three independent samples.
    One narrow projection; no shuffle, no RNG."""
    if not weights:
        raise ValueError("hash_split requires at least one split weight")
    bad = {k: w for k, w in weights.items() if w <= 0}
    if bad:
        raise ValueError(f"split weights must be positive: {bad}")
    den = sum(weights.values())
    bucket = _hash_bucket(F.col(id_col), den)
    expr = None
    hi = 0
    for name, w in weights.items():
        hi += w
        branch_args = (bucket < F.lit(hi), F.lit(name))
        expr = F.when(*branch_args) if expr is None else expr.when(*branch_args)
    return df.withColumn(split_col, expr)


def negative_pairs(
    df: DataFrame,
    m: int,
    id_col: str = "doc_id",
    n_buckets: int = 64,
) -> DataFrame:
    """Deterministic pseudo-random negative sampling for contrastive
    training: each anchor row is paired with ``m`` negatives drawn
    from its hash bucket's md5-ordered ring (the next ``m`` rows
    cyclically). md5 order is a fixed pseudo-random permutation of
    the corpus, so the pairing depends only on content ids — reruns,
    backfills, and other engines produce the identical pair set
    (unlike seeded RNG sampling; same argument as ``hash_sample``).

    Output: ``(id_col, neg_<id_col>, j)`` with ``j`` in
    ``1..min(m, bucket_size - 1)`` — the ring guarantees distinct
    negatives and never pairs an anchor with itself; anchors in
    buckets smaller than ``m + 1`` get every other bucket member
    once.

    Scale shape (100 TB): one hash shuffle into ``n_buckets``-keyed
    windows (rank + bucket size are window functions over the SAME
    partitioning — one Exchange), an m-way explode of (bucket, rank)
    keys, and an equi-join back on (bucket, rank). No global sort,
    no cartesian; ``n_buckets`` bounds window partition size the way
    it bounds any per-key state.
    """
    from pyspark.sql import Window

    if m <= 0:
        raise ValueError(f"m must be positive, got {m}")
    if n_buckets <= 0:
        raise ValueError(f"n_buckets must be positive, got {n_buckets}")
    idc = F.col(id_col)
    h = F.conv(F.substring(F.md5(idc.cast("string")), 1, 8), 16, 10).cast(
        "bigint"
    )
    w = Window.partitionBy("__b").orderBy("__h", id_col)
    ring = df.select(
        idc, h.alias("__h"), F.pmod(h, F.lit(n_buckets)).alias("__b")
    ).select(
        id_col,
        "__b",
        F.row_number().over(w).alias("__r"),
        F.count(F.lit(1)).over(Window.partitionBy("__b")).alias("__n"),
    )
    anchors = ring.select(
        id_col,
        "__b",
        "__n",
        # sequence(1, 0) would generate a DESCENDING [1, 0] — a
        # single-member bucket must yield no negatives, not bogus ones
        F.explode(
            F.when(
                F.col("__n") > 1,
                F.sequence(
                    F.lit(1).cast("bigint"),
                    F.least(F.lit(m).cast("bigint"), F.col("__n") - 1),
                ),
            ).otherwise(F.array().cast("array<bigint>"))
        ).alias("j"),
        F.col("__r").alias("__ar"),
    ).withColumn(
        "__nr", F.pmod(F.col("__ar") - 1 + F.col("j"), F.col("__n")) + 1
    )
    negs = ring.select(
        F.col(id_col).alias(f"neg_{id_col}"),
        F.col("__b"),
        F.col("__r").alias("__nr"),
    )
    return anchors.join(negs, on=["__b", "__nr"]).select(
        id_col, f"neg_{id_col}", "j"
    )
