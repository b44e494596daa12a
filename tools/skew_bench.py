"""Skew benchmark: pin the never-materialize claim with numbers.

Builds a 10x replica of sf0.1 `events` (~1M rows) where ONE user owns
~10% of all rows (the "one user with 10^9 events" shape that turns a
single reducer into the critical path at 100 TB), then measures:

1. `fold_left_by_key` (order-sensitive EMA) across tiers on the skewed
   vs a uniform table. The stream/arrow tiers iterate Arrow chunk runs
   and keep O(batch) state — the hot group never materializes; the
   native tier's `collect_list` holds the hot group's full value array
   in one aggregation buffer (fine at 100k values, the at-scale risk).
2. `salted_agg` vs plain `groupBy().agg()` for associative aggregates
   on the same skewed key (two-stage salt spray vs single shuffle).

Writes nothing outside /tmp. Usage: python tools/skew_bench.py
Prints one JSON line; paste the table into BASELINE.md §5.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from spark_sorted_spark import group_sort
from spark_sorted_spark.operators.skew import salted_agg
from spark_sorted_spark.session import get_spark
from spark_sorted_spark.sources.tpch import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = 10
HOT_FRACTION = 10  # 1/HOT_FRACTION of all rows land on the hot key
SKEW_DIR = "/tmp/skew_events_10x"
UNIF_DIR = "/tmp/unif_events_10x"


def _complete(d: str) -> bool:
    """A scratch table is reusable only if Spark finished writing it
    (_SUCCESS marker) — a crashed prior run leaves a partial directory
    that `isdir` alone would happily benchmark."""
    return os.path.isfile(os.path.join(d, "_SUCCESS"))


def build_tables(spark):
    """10x replicas with disjoint user_ids; skewed variant reassigns
    every HOT_FRACTION-th row to user -1 (deterministic, ~10%)."""
    ev = load_table(spark, "events", SF_DIR)
    replicas = ev.select(
        F.explode(F.array(*[F.lit(i) for i in range(REPLICAS)])).alias("__r"),
        "event_id",
        "ts",
        "user_id",
        "value",
    ).select(
        (F.col("event_id") * REPLICAS + F.col("__r")).alias("event_id"),
        "ts",
        (F.col("user_id") * REPLICAS + F.col("__r")).alias("user_id"),
        "value",
    )
    if not _complete(UNIF_DIR):
        replicas.write.mode("overwrite").parquet(UNIF_DIR)
    if not _complete(SKEW_DIR):
        replicas.withColumn(
            "user_id",
            F.when(F.col("event_id") % HOT_FRACTION == 0, F.lit(-1)).otherwise(
                F.col("user_id")
            ),
        ).write.mode("overwrite").parquet(SKEW_DIR)
    return spark.read.parquet(SKEW_DIR), spark.read.parquet(UNIF_DIR)


def timed(fn, warmup=True):
    if warmup:
        fn()
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def force(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    spark = get_spark("skew-bench")
    skew, unif = build_tables(spark)
    n = skew.count()
    hot = skew.filter(F.col("user_id") == -1).count()
    print(
        f"# rows={n}, hot-key rows={hot} ({100.0 * hot / n:.1f}%), "
        f"distinct users={skew.select('user_id').distinct().count()}",
        file=sys.stderr,
    )

    results = {}

    def ema(df, tier):
        gs = group_sort(
            df.select("user_id", "ts", "event_id", "value"),
            "user_id",
            order_by=["ts", "event_id"],
        )
        # one lambda serves every tier: on Columns the float literals
        # promote to lit() and build the same native expression
        return gs.fold_left_by_key(
            0.0,
            lambda acc, v: acc * 0.8 + 0.2 * v,
            value_col="value",
            alias="ema",
            tier=tier,
            result_type="double",
        )

    for tier in ("native", "stream", "arrow"):
        results[f"ema_{tier}_uniform"] = timed(lambda: force(ema(unif, tier)))
        results[f"ema_{tier}_skewed"] = timed(lambda: force(ema(skew, tier)))

    aggs = {
        "s": ("sum", "value"),
        "c": ("count", "value"),
        "mn": ("min", "value"),
        "mx": ("max", "value"),
    }

    def plain(df):
        return df.groupBy("user_id").agg(
            F.sum("value").alias("s"),
            F.count("value").alias("c"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )

    results["agg_plain_skewed"] = timed(lambda: force(plain(skew)))
    results["agg_salted_skewed"] = timed(lambda: force(salted_agg(skew, "user_id", aggs)))
    # the high-cardinality-accumulator case salting exists for:
    # collect_set-style state that partial agg can NOT collapse map-side
    results["distinct_plain_skewed"] = timed(
        lambda: force(
            skew.groupBy("user_id").agg(
                F.size(F.collect_set(F.col("event_id") % 50021)).alias("d")
            )
        )
    )
    from spark_sorted_spark.operators.skew import SaltedAgg

    def _set_salted(df):
        return salted_agg(
            df,
            "user_id",
            {
                "d": SaltedAgg(
                    F.collect_set("m"),
                    lambda c: F.size(
                        F.array_distinct(F.flatten(F.collect_list(c)))
                    ),
                )
            },
        )

    results["distinct_salted_skewed"] = timed(
        lambda: force(_set_salted(skew.withColumn("m", F.col("event_id") % 50021)))
    )

    # Where salting actually wins: scale the hot key another 10x (10M
    # rows, 1M-row hot key) with a fully-distinct accumulator, so the
    # hot reducer's collect_set state is 1M elements and map-side
    # partials cannot collapse anything. Below that, Spark's own
    # partial aggregation makes salting pure overhead — measured and
    # reported as such above.
    big_dir = "/tmp/skew_events_100x"
    if not _complete(big_dir):
        skew.select(
            F.explode(F.array(*[F.lit(i) for i in range(10)])).alias("__r"),
            "event_id",
            "user_id",
        ).select(
            (F.col("event_id") * 10 + F.col("__r")).alias("m"),
            F.when(F.col("user_id") == -1, -1)
            .otherwise(F.col("user_id") * 10 + F.col("__r"))
            .alias("user_id"),
        ).write.mode("overwrite").parquet(big_dir)
    big = spark.read.parquet(big_dir)
    results["distinct_plain_10m"] = timed(
        lambda: force(
            big.groupBy("user_id").agg(F.size(F.collect_set("m")).alias("d"))
        )
    )
    results["distinct_salted_10m"] = timed(lambda: force(_set_salted(big)))
    print(json.dumps({"rows": n, "hot_rows": hot, "times": results}))


if __name__ == "__main__":
    main()
