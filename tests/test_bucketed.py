"""Bucketed sink/source: the persisted layout must elide shuffles in
later jobs (zero Exchanges for a join on the bucket keys)."""

import pytest
from pyspark.sql import functions as F

from spark_sorted_spark.sources.bucketed import read_bucketed, write_bucketed
from spark_sorted_spark.sources.tpch import load_table

from conftest import plan_of


def _plan(df) -> str:
    return plan_of(df, "simple")


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    write_bucketed(
        orders.withColumnRenamed("o_orderkey", "k"), "t_orders_b", "k", 4
    )
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "k"),
        "t_lineitem_b",
        "k",
        4,
        sort_by=["k", "l_linenumber"],
    )
    yield "t_orders_b", "t_lineitem_b"
    spark.sql("DROP TABLE IF EXISTS t_orders_b")
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")


def test_bucketed_join_plans_no_exchange(spark, bucketed_tables):
    t1, t2 = bucketed_tables
    a, b = read_bucketed(spark, t1), read_bucketed(spark, t2)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = a.join(b, on="k", how="inner")
        plan = _plan(j)
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange") == 0, plan


def test_bucketed_agg_plans_no_exchange(spark, bucketed_tables):
    _, t2 = bucketed_tables
    b = read_bucketed(spark, t2)
    agg = b.groupBy("k").agg(F.sum("l_quantity").alias("s"))
    plan = _plan(agg)
    assert plan.count("Exchange") == 0, plan


def test_bucketed_round_trip_preserves_rows(spark, sf_dir, bucketed_tables):
    _, t2 = bucketed_tables
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )
    assert read_bucketed(spark, t2).count() == li.count()


def test_partitioned_write_prunes_at_scan(spark, sf_dir, tmp_path):
    from spark_sorted_spark.sources.bucketed import write_partitioned
    from spark_sorted_spark.sources.tpch import load_table

    ev = load_table(spark, "events", sf_dir).select("user_id", "event_type", "value")
    path = str(tmp_path / "ev_part")
    write_partitioned(ev, path, "event_type")
    back = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = plan_of(back, "formatted")
    assert "PartitionFilters: [isnotnull(event_type" in plan, plan
    exp = ev.filter(F.col("event_type") == "click").count()
    assert back.count() == exp
