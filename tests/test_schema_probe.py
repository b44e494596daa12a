"""Loud early-warning probe for driver testdata schema drift.

Round 4 regressed silently because the driver regenerated
``events.parquet`` with ``ts`` as timestamp[us] where previous rounds
surfaced epoch-nanos int64 — and nothing in-repo noticed for a full
round. This test reads the actual parquet schemas (no Spark session
needed) and asserts the type contracts each query family assumes. If
it fails, the fix is almost always to extend the type dispatch in
``spark_sorted_spark.sources.tpch.event_ts_us`` / ``event_ts`` — not
to touch the 50 queries that consume them.
"""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.isdir(d)
]

# Event-time types the helpers in sources/tpch.py know how to handle.
_EVENT_TS_OK = (
    pa.types.is_timestamp,  # timestamp[us]/[ns] → TIMESTAMP(_NTZ) in Spark
    pa.types.is_int64,  # historical epoch-nanos layout (nanosAsLong)
)


def _schema(sf_dir, table):
    return pq.read_schema(f"{sf_dir}/{table}.parquet")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_is_a_type_we_dispatch_on(sf_dir):
    t = _schema(sf_dir, "events").field("ts").type
    assert any(ok(t) for ok in _EVENT_TS_OK), (
        f"events.ts is {t!r} in {sf_dir} — not a type "
        "sources.tpch.event_ts_us/event_ts handles. Extend the dispatch "
        "there (and streaming/source.py inherits it); do NOT patch "
        "individual queries."
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_core_column_contracts(sf_dir):
    """Columns + coarse types each query family reads. A failure here
    means the driver's generator changed shape — update the named
    consumer, not the 50 call sites."""
    checks = {
        # table: {col: (predicate, consumer-to-update)}
        "events": {
            "event_id": (pa.types.is_integer, "group_sort order_by tie-break"),
            "user_id": (pa.types.is_integer, "every per-key events query"),
            "event_type": (pa.types.is_string, "pivot/sessionize/asof filters"),
            "value": (pa.types.is_floating, "ema_fold strict double fold"),
            "props": (pa.types.is_string, "json_extract"),
        },
        "documents": {
            "doc_id": (pa.types.is_integer, "dedup winner = min(doc_id)"),
            "text": (pa.types.is_string, "text/dedup/multimodal family"),
            "lang": (pa.types.is_string, "stratified_sample/corpus_mix"),
        },
        "embeddings": {
            "vec_id": (pa.types.is_integer, "similarity family"),
            "embedding": (
                lambda t: pa.types.is_list(t) or pa.types.is_fixed_size_list(t),
                "similarity dot products (F.aggregate fold)",
            ),
        },
        "lineitem": {
            "l_orderkey": (pa.types.is_integer, "merge joins / TPC-H"),
            "l_quantity": (
                lambda t: pa.types.is_integer(t) or pa.types.is_floating(t)
                or pa.types.is_decimal(t),
                "tpch_q1 exact sums",
            ),
            "l_shipdate": (
                lambda t: pa.types.is_timestamp(t) or pa.types.is_date(t),
                "tpch_q1 shipdate predicate (both engines compare "
                "date-literals fine against either type)",
            ),
        },
        "orders": {
            "o_orderkey": (pa.types.is_integer, "merge joins"),
            "o_custkey": (pa.types.is_integer, "outer joins / TPC-H"),
            "o_orderdate": (
                lambda t: pa.types.is_timestamp(t) or pa.types.is_date(t),
                "tpch_q3/q5 date-range predicates",
            ),
        },
    }
    for table, cols in checks.items():
        schema = _schema(sf_dir, table)
        names = set(schema.names)
        for col, (pred, consumer) in cols.items():
            assert col in names, (
                f"{table}.{col} missing in {sf_dir} (consumer: {consumer}); "
                f"present: {sorted(names)}"
            )
            t = schema.field(col).type
            assert pred(t), (
                f"{table}.{col} is {t!r} in {sf_dir} — violates the type "
                f"contract assumed by: {consumer}"
            )


def test_event_ts_helpers_dispatch_both_layouts(tmp_path):
    """event_ts_us/event_ts must agree with epoch-micros ground truth
    for BOTH physical layouts the driver has shipped: timestamp[us]
    (current) and epoch-nanos int64 (historical), and refuse others."""
    import pyarrow.parquet as pq_mod

    from spark_sorted_spark.session import get_spark
    from spark_sorted_spark.sources.tpch import event_ts, event_ts_us

    spark = get_spark("schema-probe-test", master="local[2]", shuffle_partitions=2)
    micros = [0, 1, 999, 1_000_000, 1_723_500_000_123_456]

    ts_us = pa.table({"ts": pa.array(micros, pa.timestamp("us"))})
    ts_ns = pa.table({"ts": pa.array([m * 1000 for m in micros], pa.int64())})
    p_us, p_ns = str(tmp_path / "us.parquet"), str(tmp_path / "ns.parquet")
    pq_mod.write_table(ts_us, p_us)
    pq_mod.write_table(ts_ns, p_ns)

    for path in (p_us, p_ns):
        df = spark.read.parquet(path)
        got = [
            r[0]
            for r in df.select(event_ts_us(df, "ts")).orderBy("ts").collect()
        ]
        assert got == micros, (path, got)
        # event_ts: proper TIMESTAMP, value-preserving (tz pinned UTC
        # by load_table; pin it here since this test skips load_table)
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        import pyspark.sql.functions as SF

        got_ts = [
            r[0]
            for r in df.select(SF.unix_micros(event_ts(df, "ts"))).orderBy(
                "ts"
            ).collect()
        ]
        assert got_ts == micros, (path, got_ts)

    bad = spark.createDataFrame([("x",)], ["ts"])
    for helper in (event_ts_us, event_ts):
        with pytest.raises(TypeError, match="sources.tpch"):
            helper(bad, "ts")
