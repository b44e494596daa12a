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


# ---------------------------------------------------------------------------
# J2-J5 — merge joins (orders/lineitem on orderkey, customer/orders on
# custkey for the outer flavors where one side has true misses).
# Native SortMergeJoin / broadcast per Catalyst+AQE.
# ---------------------------------------------------------------------------
def _orders_li(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    lgs = group_sort(orders.withColumnRenamed("o_orderkey", "orderkey"), "orderkey")
    rgs = group_sort(li.withColumnRenamed("l_orderkey", "orderkey"), "orderkey")
    return lgs, rgs


@query(
    "merge_join_inner",
    oracle="""
    SELECT o_orderkey AS orderkey, o_totalprice, l_linenumber, l_extendedprice
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    """,
)
def merge_join_inner_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    lgs, rgs = _orders_li(spark, sf_dir)
    return lgs.merge_join_inner(rgs).to_df()


@query(
    "merge_join_full",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_acctbal, o.o_orderkey, o.o_totalprice
    FROM customer c FULL OUTER JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def merge_join_full_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, "customer", sf_dir)
        .select("c_custkey", "c_acctbal")
        .withColumnRenamed("c_custkey", "custkey")
    )
    orders = (
        load_table(spark, "orders", sf_dir)
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumnRenamed("o_custkey", "custkey")
    )
    return (
        group_sort(cust, "custkey").merge_join(group_sort(orders, "custkey")).to_df()
    )


@query(
    "merge_join_left",
    oracle="""
    SELECT c.c_custkey AS custkey, c.c_acctbal, o.o_orderkey
    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    """,
)
def merge_join_left_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, "customer", sf_dir)
        .select("c_custkey", "c_acctbal")
        .withColumnRenamed("c_custkey", "custkey")
    )
    orders = (
        load_table(spark, "orders", sf_dir)
        .select("o_custkey", "o_orderkey")
        .withColumnRenamed("o_custkey", "custkey")
    )
    return (
        group_sort(cust, "custkey")
        .merge_join_left_outer(group_sort(orders, "custkey"))
        .to_df()
    )


@query(
    "merge_join_semi_anti",
    # semi ∪ anti partition the left side; emit a flag to check both
    oracle="""
    SELECT c_custkey AS custkey,
           (c_custkey IN (SELECT o_custkey FROM orders)) AS has_orders
    FROM customer
    """,
)
def merge_join_semi_anti_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, "customer", sf_dir)
        .select("c_custkey")
        .withColumnRenamed("c_custkey", "custkey")
    )
    orders = (
        load_table(spark, "orders", sf_dir)
        .select("o_custkey")
        .withColumnRenamed("o_custkey", "custkey")
    )
    cgs, ogs = group_sort(cust, "custkey"), group_sort(orders, "custkey")
    semi = cgs.merge_join_semi(ogs).to_df().withColumn("has_orders", F.lit(True))
    anti = cgs.merge_join_anti(ogs).to_df().withColumn("has_orders", F.lit(False))
    return semi.unionByName(anti)


# ---------------------------------------------------------------------------
# J1 — custom per-key co-processing via cogroup().applyInPandas:
# per order, count of lineitems and sum of their linenumbers (kept
# integral so the oracle compares exactly).
# ---------------------------------------------------------------------------
@query(
    "merge_join_custom",
    oracle="""
    SELECT o.o_orderkey AS orderkey,
           count(l.l_orderkey)::BIGINT AS n_items,
           coalesce(sum(l.l_linenumber), 0)::BIGINT AS sum_linenumber
    FROM orders o LEFT JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY o.o_orderkey
    """,
)
def merge_join_custom_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    lgs, rgs = _orders_li(spark, sf_dir)

    def fn(key, lpdf, rpdf):
        if not len(lpdf):  # lineitems whose order is missing: not in oracle
            return None
        return pd.DataFrame(
            {
                "orderkey": [key[0]],
                "n_items": [len(rpdf)],
                "sum_linenumber": [int(rpdf["l_linenumber"].sum())],
            }
        )

    return lgs.merge_join_custom(
        rgs, fn, "orderkey bigint, n_items bigint, sum_linenumber bigint"
    )


# ---------------------------------------------------------------------------
# S1 — merge_union: bag union (duplicates preserved) of two overlapping
# event slices, result re-laid-out group-sorted.
# ---------------------------------------------------------------------------
@query(
    "merge_union",
    oracle="""
    SELECT user_id, event_id, value FROM events WHERE value > 50
    UNION ALL
    SELECT user_id, event_id, value FROM events WHERE value < 100
    """,
)
def merge_union_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, "events", sf_dir).select(
        "user_id", "event_id", "value"
    )
    a = group_sort(events.filter(F.col("value") > 50), "user_id", order_by="event_id")
    b = group_sort(events.filter(F.col("value") < 100), "user_id", order_by="event_id")
    return a.merge_union(b).to_df()


def flagship(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> DataFrame:
    return ema_fold(spark, sf_dir)
