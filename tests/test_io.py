"""Format-agnostic sources: CSV/JSON/ORC round-trips must reproduce
the parquet relation bit-for-bit under the declared schema, and then
feed the engine identically (same group_sort results)."""

import pytest

from spark_sorted_spark import group_sort
from spark_sorted_spark.sources.io import read_source, write_sink
from spark_sorted_spark.sources.tpch import load_table

from conftest import plan_of


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize("fmt", ["csv", "json", "orc"])
def test_roundtrip_matches_parquet(spark, sf_dir, tmp_path, fmt):
    # events covers the tricky types: timestamp_ntz, double, string
    ev = load_table(spark, "events", sf_dir).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    path = str(tmp_path / f"events_{fmt}")
    write_sink(ev, path, format=fmt)
    schema = ev.schema if fmt in ("csv", "json") else None
    back = read_source(spark, path, format=fmt, schema=schema)
    assert back.schema == ev.schema
    assert _rows(back) == _rows(ev)


def test_engine_results_identical_across_formats(spark, sf_dir, tmp_path):
    ev = load_table(spark, "events", sf_dir).select("user_id", "ts", "event_id", "value")
    path = str(tmp_path / "events_csv")
    write_sink(ev, path, format="csv")
    back = read_source(spark, path, format="csv", schema=ev.schema)

    def ema(df):
        import pyspark.sql.functions as F

        gs = group_sort(df, "user_id", order_by=["ts", "event_id"])
        return gs.fold_left_by_key(
            0.0,
            lambda acc, v: acc * F.lit(0.8) + F.lit(0.2) * v,
            value_col="value",
            alias="ema",
            tier="native",
        )

    assert _rows(ema(back)) == _rows(ema(ev))


def test_partitioned_sink_prunes(spark, sf_dir, tmp_path):
    import pyspark.sql.functions as F

    ev = load_table(spark, "events", sf_dir).select("event_id", "event_type", "value")
    path = str(tmp_path / "by_type")
    write_sink(ev, path, partition_by="event_type")
    back = read_source(spark, path).filter(F.col("event_type") == "click")
    plan = plan_of(back, "formatted")
    assert "PartitionFilters" in plan and "event_type" in plan.split("PartitionFilters")[1][:200]
    # partition columns are appended on read — compare in fixed order
    cols = ["event_id", "event_type", "value"]
    assert _rows(back.select(*cols)) == _rows(
        ev.filter(F.col("event_type") == "click").select(*cols)
    )


def test_schema_required_for_text_formats(spark, tmp_path):
    with pytest.raises(ValueError, match="schema"):
        read_source(spark, str(tmp_path), format="csv")
    with pytest.raises(ValueError, match="schema"):
        read_source(spark, str(tmp_path), format="json")


def test_text_roundtrip_extreme_timestamps(spark, tmp_path):
    # pre-1970, year-1900 microsecond, near-datetime64-max, and null —
    # the pinned SSSSSS patterns must hold across the full range
    import datetime

    rows = [
        (1, datetime.datetime(1969, 12, 31, 23, 59, 59, 999999)),
        (2, datetime.datetime(1900, 1, 1, 0, 0, 0, 1)),
        (3, datetime.datetime(2262, 4, 11, 23, 47, 16, 854775)),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "id bigint, ts timestamp_ntz")
    for fmt in ("csv", "json"):
        path = str(tmp_path / f"edge_{fmt}")
        write_sink(df, path, format=fmt)
        back = read_source(spark, path, format=fmt, schema=df.schema)
        assert _rows(back) == _rows(df), fmt
