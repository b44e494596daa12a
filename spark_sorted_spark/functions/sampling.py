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

__all__ = ["hash_sample", "stratified_hash_sample", "hash_split"]


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
