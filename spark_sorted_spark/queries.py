"""Query catalog: every implemented operator as a named (spark_fn,
oracle_sql) pair for the driver's DuckDB correctness gate.

Each spark_fn takes ``(spark, sf_dir)`` and returns a DataFrame; the
oracle is equivalent ANSI SQL DuckDB runs on the same parquet views.
Column names/aliases MUST match between the two (the driver sorts
columns by name before hashing).

Float-valued queries are written so both sides perform the SAME
sequence of IEEE-double operations (e.g. a strict left fold in both
Spark's ``F.aggregate`` and DuckDB's ``list_reduce``), making the
value hashes bitwise-comparable without rounding.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .core import group_sort
from .sources.tpch import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# C1/C2 — group_sort layout build (shuffle + secondary sort).
# The layout itself is order-invisible to a relational compare; the
# oracle checks the relation is preserved bit-for-bit.
# ---------------------------------------------------------------------------
@query(
    "groupsort_layout",
    # DuckDB truncates parquet ns-timestamps to us; compare at us.
    oracle="SELECT user_id, epoch_us(ts) AS ts_us, event_id, value FROM events",
)
def groupsort_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    gs = group_sort(
        events.select("user_id", "ts", "event_id", "value"),
        "user_id",
        order_by=["ts", "event_id"],
    )
    return gs.map_values(ts_us=F.expr("ts div 1000")).select_values(
        "ts_us", "event_id", "value"
    ).to_df()


# ---------------------------------------------------------------------------
# A3 — fold_left_by_key: the flagship EMA per user (README.md:18-28
# analogue; golden semantics pinned by GroupSortedSpec.scala:103-115).
# Both sides: strict left fold of acc*0.8 + 0.2*v in (ts, event_id)
# order, zero = 0.0 → bitwise-identical doubles.
# ---------------------------------------------------------------------------
@query(
    "ema_fold",
    oracle="""
    SELECT user_id,
           list_reduce(list_prepend(0.0, list(value ORDER BY ts, event_id)),
                       (acc, x) -> acc * 0.8 + 0.2 * x) AS ema
    FROM events GROUP BY user_id
    """,
)
def ema_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    gs = group_sort(
        events.select("user_id", "ts", "event_id", "value"),
        "user_id",
        order_by=["ts", "event_id"],
    )
    return gs.fold_left_by_key(
        0.0,
        lambda acc, v: acc * F.lit(0.8) + F.lit(0.2) * v,
        value_col="value",
        alias="ema",
        tier="native",
    )


# ---------------------------------------------------------------------------
# A4 — reduce_left_by_key: order-sensitive string concat per key
# (GroupSortedSpec.scala:127-135 analogue on events.event_type).
# ---------------------------------------------------------------------------
@query(
    "reduce_concat",
    oracle="""
    SELECT user_id, string_agg(event_type, '' ORDER BY ts, event_id) AS cat
    FROM events GROUP BY user_id
    """,
)
def reduce_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir)
    gs = group_sort(
        events.select("user_id", "ts", "event_id", "event_type"),
        "user_id",
        order_by=["ts", "event_id"],
    )
    return gs.reduce_left_by_key(
        lambda acc, v: F.concat(acc, v),
        value_col="event_type",
        alias="cat",
        tier="native",
    )


# ---------------------------------------------------------------------------
# C3/C4 — combiner path: native groupBy aggregation with map-side
# partial aggregation (= setMapSideCombine(true), GroupSorted.scala:140-144).
# ---------------------------------------------------------------------------
@query(
    "combiner_agg",
    oracle="""
    SELECT l_orderkey,
           sum(l_quantity) AS sum_qty,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price,
           count(*) AS n
    FROM lineitem GROUP BY l_orderkey
    """,
)
def combiner_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_orderkey").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.count(F.lit(1)).alias("n"),
    )


# ---------------------------------------------------------------------------
# A1 — map_stream_by_key, native expression: top-3 events per user by
# value (take-n-per-key, GroupSortedSpec.scala:188-204; bench B3).
# ---------------------------------------------------------------------------
@query(
    "top3_per_user",
    oracle="""
    SELECT user_id, event_id, value FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY value DESC, event_id) AS rn
        FROM events) t
    WHERE rn <= 3
    """,
)
def top3_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .operators.map_stream import take_by_key

    events = load_table(spark, "events", sf_dir)
    gs = group_sort(
        events.select("user_id", "event_id", "value"),
        "user_id",
        order_by=[("value", False), ("event_id", True)],
    )
    return take_by_key(gs, 3, tier="native")


# ---------------------------------------------------------------------------
# A1/A2 — map_stream_by_key streaming tier: sessionize each user's
# event stream (30-minute inactivity gap) and count sessions. The
# per-key state (prev ts, session count) crosses Arrow chunk
# boundaries — exercises the never-materialize engine end to end.
# ---------------------------------------------------------------------------
_SESSION_GAP_NS = 30 * 60 * 1_000_000_000


@query(
    "sessionize_stream",
    oracle=f"""
    SELECT user_id,
           (1 + sum(CASE WHEN gap > {_SESSION_GAP_NS} THEN 1 ELSE 0 END))::BIGINT
               AS n_sessions
    FROM (
        SELECT user_id,
               epoch_ns(ts) - lag(epoch_ns(ts))
                   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events) t
    GROUP BY user_id
    """,
)
def sessionize_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    from .operators.map_stream import map_stream_by_key

    events = load_table(spark, "events", sf_dir)
    gs = group_sort(
        events.select("user_id", "ts", "event_id"),
        "user_id",
        order_by=["ts", "event_id"],
    )

    def fn(key, chunks):
        prev = None
        sessions = 0
        for c in chunks:
            for ts in c["ts"]:
                if prev is None or ts - prev > _SESSION_GAP_NS:
                    sessions += 1
                prev = ts
        yield pd.DataFrame({"user_id": [key[0]], "n_sessions": [sessions]})

    return map_stream_by_key(gs, fn, "user_id bigint, n_sessions bigint", tier="stream")


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    return ema_fold(spark, sf_dir)
