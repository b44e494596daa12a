"""Structured Streaming tier: batch/stream parity over bounded
streams (availableNow), state carry-over across micro-batches."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from spark_sorted_spark.sources.tpch import event_ts, load_table
from spark_sorted_spark.streaming import (
    run_available_now,
    sessionize,
    stream_dedup,
    stream_fold_by_key,
    stream_table,
    windowed_agg,
)


def _events_ts(spark, sf_dir):
    ev = load_table(spark, "events", sf_dir)
    return ev.withColumn("ts", event_ts(ev, "ts"))


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_windowed_agg_matches_batch(spark, sf_dir):
    sdf = stream_table(spark, "events", sf_dir, event_time="ts")
    agg = {"n": F.count(F.lit(1)), "max_v": F.max("value")}
    out = run_available_now(
        windowed_agg(sdf, "ts", "1 hour", agg, keys=["user_id"], watermark="30 minutes"),
        output_mode="complete",
    )
    batch = (
        _events_ts(spark, sf_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("max_v"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "user_id",
            "n",
            "max_v",
        )
    )
    assert _rows(out) == _rows(batch)


def test_sessionize_matches_batch_lag_cumsum(spark, sf_dir):
    sdf = stream_table(spark, "events", sf_dir, event_time="ts")
    out = run_available_now(
        sessionize(
            sdf, "ts", "30 minutes", {"n": F.count(F.lit(1))}, keys=["user_id"]
        ),
        output_mode="complete",
    )
    # batch oracle: gap-based session ids via lag + cumsum
    ev = _events_ts(spark, sf_dir)
    w = F.expr(
        "sum(case when prev_ts is null or ts - prev_ts > interval 30 minutes "
        "then 1 else 0 end) over (partition by user_id order by ts, event_id "
        "rows unbounded preceding)"
    )
    from pyspark.sql.window import Window

    lag_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    batch = (
        ev.withColumn("prev_ts", F.lag("ts").over(lag_w))
        .withColumn("sid", w)
        .groupBy("user_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            (F.max("ts") + F.expr("interval 30 minutes")).alias("session_end"),
            F.count(F.lit(1)).alias("n"),
        )
        .select("session_start", "session_end", "user_id", "n")
    )
    assert _rows(out) == _rows(batch)


def test_stream_dedup_matches_distinct(spark, sf_dir):
    sdf = stream_table(spark, "events", sf_dir, event_time="ts")
    out = run_available_now(
        stream_dedup(sdf.select("user_id", "event_type"), ["user_id", "event_type"])
    )
    batch = (
        load_table(spark, "events", sf_dir)
        .select("user_id", "event_type")
        .distinct()
    )
    assert _rows(out) == _rows(batch)


def test_stream_fold_single_batch_equals_batch_fold(spark, sf_dir):
    sdf = stream_table(spark, "events", sf_dir)
    out = run_available_now(
        stream_fold_by_key(
            sdf,
            "user_id",
            0.0,
            lambda acc, v: acc * 0.8 + 0.2 * v,
            value_col="value",
            alias="ema",
            order_by=["ts", "event_id"],
        ),
        output_mode="update",
    )
    pdf = (
        load_table(spark, "events", sf_dir)
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    expected = {}
    for uid, grp in pdf.groupby("user_id"):
        acc = 0.0
        for v in grp["value"]:
            acc = acc * 0.8 + 0.2 * v
        expected[uid] = acc
    got = {r["user_id"]: r["ema"] for r in out.collect()}
    assert got == pytest.approx(expected)


def test_stream_fold_state_carries_across_microbatches(spark, tmp_path):
    # 3 files -> 3 micro-batches with maxFilesPerTrigger=1; a
    # commutative fold (count) is exact regardless of file order, so
    # this isolates the state carry-over.
    df = spark.createDataFrame(
        [(k, i) for k in ("a", "b") for i in range(30)], ["k", "v"]
    )
    path = str(tmp_path / "multi")
    df.repartition(3).write.parquet(path)
    schema = spark.read.parquet(path).schema
    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = run_available_now(
        stream_fold_by_key(
            sdf,
            "k",
            0,
            lambda acc, v: acc + 1,
            value_col="v",
            alias="n",
            step_vec=lambda acc, s: acc + len(s),
        ),
        output_mode="update",
    )
    pdf = out.toPandas()
    # >=2 progress rows per key proves multiple micro-batches ran
    assert pdf.groupby("k").size().min() >= 2
    final = pdf.groupby("k")["n"].max().to_dict()
    assert final == {"a": 30, "b": 30}


def test_stream_fold_pickled_state(spark, tmp_path):
    # non-scalar accumulator (set) round-trips through binary state
    import pickle

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("a", 1), ("b", 7)], ["k", "v"]
    )
    path = str(tmp_path / "pick")
    df.write.parquet(path)
    sdf = spark.readStream.schema(df.schema).parquet(path)
    out = run_available_now(
        stream_fold_by_key(
            sdf,
            "k",
            set(),
            lambda acc, v: acc | {int(v)},
            value_col="v",
            alias="seen",
        ),
        output_mode="update",
    )
    # non-scalar acc without state_ddl → column renamed to seen_pickled
    # so the binary payload is unmistakable
    assert "seen_pickled" in out.columns
    got = {r["k"]: pickle.loads(bytes(r["seen_pickled"])) for r in out.collect()}
    assert got == {"a": {1, 2}, "b": {7}}


def test_stream_fold_typed_state_ddl(spark, tmp_path):
    # state_ddl keeps a typed accumulator column end-to-end (no pickle,
    # no binary): min/max pair as array<bigint>
    df = spark.createDataFrame(
        [("a", 3), ("a", 9), ("a", 1), ("b", 7)], ["k", "v"]
    )
    path = str(tmp_path / "typed")
    df.write.parquet(path)
    sdf = spark.readStream.schema(df.schema).parquet(path)
    out = run_available_now(
        stream_fold_by_key(
            sdf,
            "k",
            [None, None],
            lambda acc, v: [
                int(v) if acc[0] is None else min(acc[0], int(v)),
                int(v) if acc[1] is None else max(acc[1], int(v)),
            ],
            value_col="v",
            alias="minmax",
            state_ddl="array<bigint>",
        ),
        output_mode="update",
    )
    assert "minmax" in out.columns
    assert out.schema["minmax"].dataType.simpleString() == "array<bigint>"
    got = {r["k"]: list(r["minmax"]) for r in out.collect()}
    assert got == {"a": [1, 9], "b": [7, 7]}


def test_stream_fold_checkpoint_resume_across_runs(spark, tmp_path):
    # the incremental-backfill pattern: drain, stop, add data, drain
    # again with the SAME checkpoint — the second run must process only
    # the new file and the state-store accumulator must carry over
    df1 = spark.createDataFrame([("a", 1), ("a", 2), ("b", 5)], ["k", "v"])
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    df1.coalesce(1).write.parquet(src)
    schema = spark.read.parquet(src).schema

    def drain():
        # memory sink refuses checkpoint recovery; foreachBatch is the
        # resumable collection path
        rows = []
        sdf = spark.readStream.schema(schema).parquet(src)
        out = stream_fold_by_key(
            sdf,
            "k",
            0,
            lambda acc, v: acc + 1,
            value_col="v",
            alias="n",
            step_vec=lambda acc, s: acc + len(s),
        )
        q = (
            out.writeStream.foreachBatch(
                lambda batch, _id: rows.extend(batch.collect())
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            assert q.awaitTermination(300)
        finally:
            q.stop()
        return rows

    first = {r.k: r.n for r in drain()}
    assert first == {"a": 2, "b": 1}
    # second batch of files arrives after the first drain stopped
    spark.createDataFrame([("a", 9), ("c", 0)], ["k", "v"]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    got = {r.k: r.n for r in drain()}
    # a: 2 (checkpointed) + 1 new = 3; c starts fresh at 1; b saw no
    # new rows -> no update-mode row in the second drain
    assert got == {"a": 3, "c": 1}


def test_stream_dir_shim_reused_not_leaked(spark, sf_dir):
    # repeated stream construction reuses one scratch dir per
    # (table, sf) instead of leaking a tempdir+symlink each time
    from spark_sorted_spark.streaming.source import _as_stream_dir

    d1 = _as_stream_dir("events", sf_dir)
    d2 = _as_stream_dir("events", sf_dir)
    assert d1 == d2


def test_stream_stream_join_matches_batch_range_join(spark, sf_dir):
    from spark_sorted_spark.streaming import stream_stream_join

    purchases = stream_table(spark, "events", sf_dir, event_time="ts").filter(
        F.col("event_type") == "purchase"
    ).select("user_id", "ts", "event_id")
    clicks = stream_table(spark, "events", sf_dir, event_time="ts").filter(
        F.col("event_type") == "click"
    ).select("user_id", "ts", "event_id")
    out = run_available_now(
        stream_stream_join(
            purchases,
            clicks,
            ["user_id"],
            time_col="ts",
            watermark="1 hour",
            within="1 hour",
        ).select("user_id", "event_id", "event_id_r")
    )
    ev = _events_ts(spark, sf_dir)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("user_id_r"),
        F.col("ts").alias("ts_r"),
        F.col("event_id").alias("event_id_r"),
    )
    batch = p.join(
        c,
        (F.col("user_id") == F.col("user_id_r"))
        & (F.col("ts_r") <= F.col("ts"))
        & (F.col("ts_r") >= F.col("ts") - F.expr("INTERVAL 1 hour")),
    ).select("user_id", "event_id", "event_id_r")
    assert _rows(out) == _rows(batch)


def test_watermark_drops_late_rows_in_append_mode(spark, tmp_path):
    # Run 1 establishes watermark = max(ts)-2h in the checkpoint; run 2
    # (same checkpoint) delivers an event 10h older than the watermark —
    # its window is closed and the row must be dropped, never emitted.
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0)
    on_time = [(1, base + dt.timedelta(hours=h)) for h in range(6)]
    late = [(1, base - dt.timedelta(hours=10))]
    d1 = spark.createDataFrame(on_time, ["k", "ts"])
    d2 = spark.createDataFrame(late, ["k", "ts"])
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")

    def q():
        sdf = spark.readStream.schema(d1.schema).parquet(src)
        return windowed_agg(
            sdf, "ts", "1 hour", {"n": F.count(F.lit(1))}, keys=["k"],
            watermark="2 hours",
        )

    sink = str(tmp_path / "sink")

    def drain():
        # memory sink can't recover a checkpoint; the durable parquet
        # sink can — that's what production backfills use anyway
        sq = (
            q()
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        assert sq.awaitTermination(120)

    d1.coalesce(1).write.parquet(src)
    drain()
    d2.coalesce(1).write.mode("append").parquet(src)
    drain()
    out = spark.read.parquet(sink)
    starts = sorted(r["window_start"] for r in out.collect())
    # run 1 finalized windows below watermark base+3h; the late row's
    # window (base-10h) must never appear
    assert all(s >= base for s in starts), starts
    assert starts, "no windows finalized at all"


def test_stream_to_files_exactly_once_and_incremental(spark, sf_dir, tmp_path):
    """File sink + checkpoint = exactly-once across re-drains, and a
    re-drain picks up exactly the files that arrived in between."""
    import pyspark.sql.functions as F

    from spark_sorted_spark.streaming import stream_table, stream_to_files

    src = tmp_path / "incoming"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    ev = load_table(spark, "events", sf_dir).select("event_id", "user_id", "value")
    first = ev.filter(F.col("event_id") % 2 == 0)
    second = ev.filter(F.col("event_id") % 2 == 1)
    first.coalesce(1).write.mode("overwrite").parquet(str(src / "batch1"))

    def drain():
        sdf = stream_table(spark, "events", sf_dir, path=str(src / "batch1"))
        stream_to_files(sdf.select("event_id", "user_id", "value"), out, ckpt)

    drain()
    n1 = spark.read.parquet(out).count()
    assert n1 == first.count()

    # re-drain with nothing new: checkpoint prevents duplicates
    drain()
    assert spark.read.parquet(out).count() == n1

    # new file arrives; same checkpoint picks up exactly the delta
    second.coalesce(1).write.mode("overwrite").parquet(str(src / "batch1") + "/../batch2")
    # move batch2's files into the watched dir
    import shutil

    b2 = src / "batch2"
    for f in b2.glob("*.parquet"):
        shutil.move(str(f), str(src / "batch1" / f.name))
    drain()
    got = spark.read.parquet(out)
    assert got.count() == ev.count()
    assert got.select("event_id").distinct().count() == ev.count()


def test_stream_late_drop_query_matches_batch_replay(spark, sf_dir):
    """The gated-catalog late-drop query: run 2 delivers ONLY
    guaranteed-late rows; were they admitted they would re-emit
    already-finalized windows into the append sink (extra + duplicate
    rows). The end state must equal the relational replay of the drop
    rule: windows finalized by the run-1 watermark, on-time rows only."""
    import datetime as dt

    from spark_sorted_spark.queries import QUERIES
    from spark_sorted_spark.sources.tpch import load_table

    out = QUERIES["stream_late_drop"](spark, sf_dir)
    got = sorted(map(tuple, out.collect()))
    assert got, "no windows finalized"
    # duplicate (ws_us, user_id) rows are exactly what a failed drop
    # would produce (the same window emitted by both drains)
    keys = [(r[0], r[1]) for r in got]
    assert len(keys) == len(set(keys)), "windows emitted twice"

    ev = load_table(spark, "events", sf_dir)
    mx = ev.agg(F.max("ts")).collect()[0][0]
    on_time = ev.filter(
        ~(
            (F.col("event_id") % 7 == 0)
            & (F.col("ts") <= F.lit(mx - dt.timedelta(hours=3)))
        )
    )
    wm = on_time.agg(F.max("ts")).collect()[0][0] - dt.timedelta(minutes=30)
    replay = (
        on_time.groupBy(F.window("ts", "1 hour").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.max("value").alias("max_v"))
        .filter(F.col("w.end") <= F.lit(wm))
        .select(
            # raw ts is TIMESTAMP_NTZ here (no stream_table dispatch);
            # session tz is pinned UTC so the cast keeps the instant
            F.unix_micros(F.col("w.start").cast("timestamp")).alias("ws_us"),
            "user_id",
            "n",
            "max_v",
        )
    )
    assert got == sorted(map(tuple, replay.collect()))


def test_stream_ingest_dedup_two_drain_lifecycle(spark, sf_dir, tmp_path):
    """The production ingest loop: two drains (two arriving batches)
    through foreachBatch must leave EXACTLY the corpus a sequential
    batch pipeline computes — within-batch self-dedup, cross-batch
    store check (earlier batch wins), store appended as it grows."""
    import shutil

    from spark_sorted_spark.functions.dedup import (
        build_minhash_band_store,
        minhash_lsh_pairs,
    )
    from spark_sorted_spark.streaming import stream_table
    from spark_sorted_spark.streaming.ingest import stream_ingest_dedup

    docs = load_table(spark, "documents", sf_dir)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    b2 = docs.filter(F.col("doc_id") % 2 == 0)

    watch = tmp_path / "incoming"
    watch.mkdir()
    store = str(tmp_path / "store")
    corpus = str(tmp_path / "corpus")
    audit = str(tmp_path / "audit")
    ckpt = str(tmp_path / "ckpt")
    build_minhash_band_store(spark.createDataFrame([], docs.schema), store)

    def arrive(batch, name):
        staged = tmp_path / f"stage_{name}"
        batch.coalesce(1).write.mode("overwrite").parquet(str(staged))
        for f in staged.glob("*.parquet"):
            shutil.move(str(f), str(watch / f"{name}_{f.name}"))

    def drain():
        sdf = stream_table(spark, "documents", sf_dir, path=str(watch))
        stream_ingest_dedup(sdf, store, corpus, audit, ckpt, timeout_sec=180)

    def expected_survivors(batch, prior_survivors):
        self_drop = {
            r.doc_b for r in minhash_lsh_pairs(batch).collect()
        }
        b = batch.filter(~F.col("doc_id").isin(list(self_drop) or [-1]))
        if prior_survivors is None:
            return b
        union = prior_survivors.unionByName(b)
        prior_ids = {r.doc_id for r in prior_survivors.select("doc_id").collect()}
        cross_drop = set()
        for r in minhash_lsh_pairs(union).collect():
            a_old, b_old = r.doc_a in prior_ids, r.doc_b in prior_ids
            if a_old != b_old:
                cross_drop.add(r.doc_b if b_old is False else r.doc_a)
        return b.filter(~F.col("doc_id").isin(list(cross_drop) or [-1]))

    arrive(b1, "b1")
    drain()
    s1 = expected_survivors(b1, None)
    got1 = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert got1 == {r.doc_id for r in s1.collect()}

    arrive(b2, "b2")
    drain()
    s2 = expected_survivors(b2, s1)
    expect = got1 | {r.doc_id for r in s2.collect()}
    got2 = {r.doc_id for r in spark.read.parquet(corpus).collect()}
    assert got2 == expect
    # audit log recorded the cross-batch drops with their batch id
    dropped = (
        {r.doc_id for r in b2.collect()}
        - {r.doc_id for r in s2.collect()}
        - {r.doc_b for r in minhash_lsh_pairs(b2).collect()}
    )
    audit_new = {r.doc_new for r in spark.read.parquet(audit).collect()}
    assert dropped <= audit_new


def test_stream_ingest_dedup_replay_is_exactly_once(spark, sf_dir, tmp_path):
    """A crash between the staging write and the rename-publish of a
    batch's corpus partition must (a) leave a RAW corpus reader — no
    before_batch fencing — seeing exactly the pre-batch rows (never a
    torn batch: the staging dir is dot-prefixed and invisible), and
    (b) heal to the clean two-batch state when the engine replays the
    batch from the SAME checkpoint."""
    import shutil

    import pytest

    from spark_sorted_spark.functions.dedup import build_minhash_band_store
    from spark_sorted_spark.streaming import ingest as ing
    from spark_sorted_spark.streaming import stream_table
    from spark_sorted_spark.streaming.ingest import stream_ingest_dedup

    docs = load_table(spark, "documents", sf_dir)
    b1 = docs.filter(F.col("doc_id") % 3 == 0)
    b2 = docs.filter(F.col("doc_id") % 3 == 1)

    def setup(root):
        watch = root / "incoming"
        watch.mkdir(parents=True)
        store = str(root / "store")
        build_minhash_band_store(spark.createDataFrame([], docs.schema), store)
        return watch, store, str(root / "corpus"), str(root / "audit"), str(
            root / "ckpt"
        )

    def arrive(watch, batch, name):
        staged = watch.parent / f"stage_{name}"
        batch.coalesce(1).write.mode("overwrite").parquet(str(staged))
        for f in staged.glob("*.parquet"):
            shutil.move(str(f), str(watch / f"{name}_{f.name}"))

    def drain(watch, store, corpus, audit, ckpt):
        sdf = stream_table(spark, "documents", sf_dir, path=str(watch))
        stream_ingest_dedup(sdf, store, corpus, audit, ckpt, timeout_sec=180)

    def corpus_rows(corpus):
        return sorted(
            (r.doc_id, r.ingest_batch_id)
            for r in spark.read.parquet(corpus).collect()
        )

    # clean run (both batches, two drains, one checkpoint) -> truth
    cw, cs, cc, ca, cck = setup(tmp_path / "clean")
    arrive(cw, b1, "b1")
    drain(cw, cs, cc, ca, cck)
    arrive(cw, b2, "b2")
    drain(cw, cs, cc, ca, cck)
    truth = corpus_rows(cc)
    truth_audit = sorted(map(tuple, spark.read.parquet(ca).collect()))

    # crash run: batch 0 lands clean, batch 1 crashes before publish
    xw, xs, xc, xa, xck = setup(tmp_path / "crash")
    arrive(xw, b1, "b1")
    drain(xw, xs, xc, xa, xck)
    pre_batch = corpus_rows(xc)
    assert len(pre_batch) > 0

    def boom(final, staging):
        if "/ingest_batch_id=1" in final:
            raise RuntimeError("injected crash before publish")

    arrive(xw, b2, "b2")
    ing._crash_before_publish = boom
    try:
        with pytest.raises(Exception):
            drain(xw, xs, xc, xa, xck)
    finally:
        ing._crash_before_publish = None
    # RAW read, no fencing: exactly the pre-batch rows — the staged
    # batch-1 data is invisible, nothing torn
    assert corpus_rows(xc) == pre_batch
    # engine replay from the SAME checkpoint heals to the clean state
    drain(xw, xs, xc, xa, xck)
    assert corpus_rows(xc) == truth
    assert sorted(map(tuple, spark.read.parquet(xa).collect())) == truth_audit


def test_stream_ingest_fresh_checkpoint_restart_guard(spark, sf_dir, tmp_path):
    """A NEW stream (fresh checkpoint) pointed at a populated corpus
    is NOT a replay: batch ids restart at 0 and would clobber the
    prior run's partitions and skip dedup against the existing corpus.
    The identity marker must fail this loudly; with allow_restart=True
    the new run's batches are offset past the existing partitions and
    dedup against the full existing corpus."""
    import shutil

    import pytest

    from spark_sorted_spark.functions.dedup import build_minhash_band_store
    from spark_sorted_spark.streaming import stream_table
    from spark_sorted_spark.streaming.ingest import stream_ingest_dedup

    docs = load_table(spark, "documents", sf_dir)
    b1 = docs.filter(F.col("doc_id") % 3 == 0)
    b2 = docs.filter(F.col("doc_id") % 3 == 1)

    watch = tmp_path / "incoming"
    watch.mkdir()
    store = str(tmp_path / "store")
    corpus = str(tmp_path / "corpus")
    audit = str(tmp_path / "audit")
    build_minhash_band_store(spark.createDataFrame([], docs.schema), store)

    def arrive(batch, name):
        staged = tmp_path / f"stage_{name}"
        batch.coalesce(1).write.mode("overwrite").parquet(str(staged))
        for f in staged.glob("*.parquet"):
            shutil.move(str(f), str(watch / f"{name}_{f.name}"))

    def drain(ckpt_name, **kw):
        sdf = stream_table(spark, "documents", sf_dir, path=str(watch))
        stream_ingest_dedup(
            sdf, store, corpus, audit, str(tmp_path / ckpt_name),
            timeout_sec=180, **kw,
        )

    arrive(b1, "b1")
    drain("ckptA")
    first = sorted(
        (r.doc_id, r.ingest_batch_id)
        for r in spark.read.parquet(corpus).collect()
    )
    assert first and all(p == 0 for _, p in first)

    # fresh checkpoint, populated corpus -> loud failure, corpus intact
    arrive(b2, "b2")
    with pytest.raises(ValueError, match="different ingest stream"):
        drain("ckptB")
    assert sorted(
        (r.doc_id, r.ingest_batch_id)
        for r in spark.read.parquet(corpus).collect()
    ) == first

    # explicit opt-in: the restarted stream re-reads ALL files as its
    # batch 0 but lands in partition base+0=1, deduping the b1 re-reads
    # against the existing corpus instead of clobbering partition 0
    drain("ckptB", allow_restart=True)
    rows = [
        (r.doc_id, r.ingest_batch_id)
        for r in spark.read.parquet(corpus).collect()
    ]
    ids = [d for d, _ in rows]
    assert len(ids) == len(set(ids)), "restart duplicated documents"
    assert sorted(r for r in rows if r[1] == 0) == first, (
        "restart clobbered the prior run's partition"
    )
    new_parts = {p for _, p in rows if p != 0}
    assert new_parts == {1}, new_parts
    # every b1 doc the prior run accepted was deduped, not re-ingested
    b1_ids = {r.doc_id for r in b1.collect()}
    assert not (b1_ids & {d for d, p in rows if p == 1})

    # restart OF a restart (third checkpoint): the marker now carries
    # ckptB's identity, so ckptC must hit the guard again; with the
    # flag, everything re-read near-dups the existing corpus -> no new
    # rows, nothing clobbered (base advances past partition 1)
    with pytest.raises(ValueError, match="different ingest stream"):
        drain("ckptC")
    drain("ckptC", allow_restart=True)
    rows2 = sorted(
        (r.doc_id, r.ingest_batch_id)
        for r in spark.read.parquet(corpus).collect()
    )
    assert rows2 == sorted(rows), "second restart changed the corpus"


def test_append_to_band_store_with_batch_id_is_idempotent(spark, sf_dir, tmp_path):
    from spark_sorted_spark.functions.dedup import (
        append_to_minhash_band_store,
        build_minhash_band_store,
        dedup_against_store,
    )

    docs = load_table(spark, "documents", sf_dir).limit(40).cache()
    base = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    store = str(tmp_path / "store")
    build_minhash_band_store(base, store)

    append_to_minhash_band_store(batch, store, batch_id=3)
    once = sorted(map(tuple, spark.read.parquet(f"{store}/bands").collect()))
    append_to_minhash_band_store(batch, store, batch_id=3)
    twice = sorted(map(tuple, spark.read.parquet(f"{store}/bands").collect()))
    assert once == twice  # replayed append replaced, not duplicated

    # the replay fence: with before_batch the batch's own appended
    # bands (partition 3) are invisible, so its docs do NOT match
    # themselves even though they sit in the store
    fenced = dedup_against_store(
        batch, store, base, before_batch=3
    ).collect()
    assert all(r.doc_old != r.doc_new for r in fenced)
    # without the fence the batch collides with its own append
    unfenced = dedup_against_store(batch, store, docs).collect()
    assert any(r.doc_old == r.doc_new for r in unfenced)

    # without batch_id the same double-write DOES duplicate (plain
    # append into the base partition): the idempotency is the batch
    # partition, not magic
    append_to_minhash_band_store(batch, store)
    append_to_minhash_band_store(batch, store)
    n_bands = spark.read.parquet(f"{store}/bands").count()
    assert n_bands > len(once)

    with pytest.raises(ValueError, match="path store"):
        dedup_against_store(
            batch, spark.read.parquet(f"{store}/bands"), base, before_batch=3
        )


def test_compact_minhash_band_store_preserves_dedup(spark, sf_dir, tmp_path):
    """Compaction rewrites a long-appended store into the base layout
    (single partition, one count row per key) WITHOUT touching corpus
    text; dedup results against the store must be identical before
    and after."""
    from spark_sorted_spark.functions.dedup import (
        append_to_minhash_band_store,
        build_minhash_band_store,
        compact_minhash_band_store,
        dedup_against_store,
    )

    docs = load_table(spark, "documents", sf_dir).limit(60).cache()
    base = docs.filter(F.col("doc_id") % 3 == 0)
    add1 = docs.filter(F.col("doc_id") % 3 == 1)
    probe = docs.filter(F.col("doc_id") % 3 == 2)
    store = str(tmp_path / "store")
    build_minhash_band_store(base, store)
    append_to_minhash_band_store(add1, store, batch_id=7)
    append_to_minhash_band_store(add1.limit(5), store)  # base-partition append
    corpus = base.unionByName(add1).unionByName(add1.limit(5))

    before = sorted(
        map(tuple, dedup_against_store(probe, store, corpus).collect())
    )
    n_count_rows_before = spark.read.parquet(f"{store}/counts").count()

    compact_minhash_band_store(spark, store)

    after = sorted(
        map(tuple, dedup_against_store(probe, store, corpus).collect())
    )
    assert after == before
    bands = spark.read.parquet(f"{store}/bands")
    assert set(r.ingest_batch_id for r in bands.select("ingest_batch_id").distinct().collect()) == {-1}
    counts = spark.read.parquet(f"{store}/counts")
    # one merged row per (band, band_key): delta rows collapsed
    assert counts.count() == counts.select("band", "band_key").distinct().count()
    assert counts.count() <= n_count_rows_before


def test_stream_ingest_dedup_heals_partial_crash_writes(spark, sf_dir, tmp_path):
    """Simulated mid-batch crash: a previous attempt left WRONG
    partial writes in batch 0's corpus partition and band-store
    partition before dying (the checkpoint never committed). The
    re-delivered batch must overwrite both with the correct full
    result — final state identical to a clean single run."""
    import shutil

    from spark_sorted_spark.functions.dedup import build_minhash_band_store
    from spark_sorted_spark.streaming import stream_table
    from spark_sorted_spark.streaming.ingest import stream_ingest_dedup

    docs = load_table(spark, "documents", sf_dir)
    batch = docs.filter(F.col("doc_id") % 3 == 0)

    def setup(root):
        watch = root / "incoming"
        watch.mkdir(parents=True)
        store = str(root / "store")
        build_minhash_band_store(spark.createDataFrame([], docs.schema), store)
        staged = root / "stage"
        batch.coalesce(1).write.mode("overwrite").parquet(str(staged))
        for f in staged.glob("*.parquet"):
            shutil.move(str(f), str(watch / f.name))
        return watch, store, str(root / "corpus"), str(root / "audit")

    def drain(watch, store, corpus, audit, ckpt):
        sdf = stream_table(spark, "documents", sf_dir, path=str(watch))
        stream_ingest_dedup(sdf, store, corpus, audit, ckpt, timeout_sec=180)

    # clean run -> ground truth
    w1, s1, c1, a1 = setup(tmp_path / "clean")
    drain(w1, s1, c1, a1, str(tmp_path / "ckpt_clean"))
    truth_corpus = sorted(
        (r.doc_id, r.ingest_batch_id)
        for r in spark.read.parquet(c1).collect()
    )
    truth_bands = sorted(map(tuple, spark.read.parquet(f"{s1}/bands").collect()))

    # crashed run: pollute batch 0's partitions with wrong partials
    w2, s2, c2, a2 = setup(tmp_path / "crash")
    batch.limit(3).withColumn("text", F.lit("WRONG PARTIAL")).write.mode(
        "overwrite"
    ).parquet(f"{c2}/ingest_batch_id=0")
    spark.createDataFrame(
        [(999999, 0, 12345)], "doc_id bigint, band int, band_key bigint"
    ).write.mode("overwrite").parquet(f"{s2}/bands/ingest_batch_id=0")
    # a real crashed run would have written its stream identity at
    # start; seed it so the replay is recognized as the SAME stream
    # (a fresh checkpoint against a populated corpus now fails loudly
    # by design — covered by the restart-guard test)
    import json as _json
    import os as _os

    _os.makedirs(str(tmp_path / "ckpt_crash"), exist_ok=True)
    (tmp_path / "ckpt_crash" / "__ingest_identity").write_text("crashed-run")
    with open(f"{c2}/_ingest_stream", "w") as fh:
        fh.write(_json.dumps({"id": "crashed-run", "base": 0}))
    drain(w2, s2, c2, a2, str(tmp_path / "ckpt_crash"))

    assert (
        sorted(
            (r.doc_id, r.ingest_batch_id)
            for r in spark.read.parquet(c2).collect()
        )
        == truth_corpus
    )
    healed_bands = sorted(map(tuple, spark.read.parquet(f"{s2}/bands").collect()))
    assert healed_bands == truth_bands
    assert not any(r[0] == 999999 for r in healed_bands)


def test_stream_hll_distinct_matches_batch_and_survives_replay(
    spark, sf_dir, tmp_path
):
    """Streaming HLL register store: after two drains the merged
    estimate must be BITWISE the batch sketch over all data; a full
    replay (fresh checkpoint, same files) changes nothing because
    register merge is an idempotent max."""
    import shutil

    from spark_sorted_spark.functions.sketches import (
        hll_estimate,
        hll_register_table,
    )
    from spark_sorted_spark.streaming import (
        read_hll_estimate,
        read_hll_registers,
        stream_hll_distinct,
        stream_table,
    )

    docs = load_table(spark, "documents", sf_dir)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    b2 = docs.filter(F.col("doc_id") % 2 == 0)

    watch = tmp_path / "incoming"
    watch.mkdir()
    store = str(tmp_path / "hll_store")

    def arrive(batch, name):
        staged = tmp_path / f"stage_{name}"
        batch.coalesce(1).write.mode("overwrite").parquet(str(staged))
        for f in staged.glob("*.parquet"):
            shutil.move(str(f), str(watch / f"{name}_{f.name}"))

    def drain(ckpt):
        sdf = stream_table(spark, "documents", sf_dir, path=str(watch))
        stream_hll_distinct(
            sdf, "text", store, str(tmp_path / ckpt),
            keys="source", timeout_sec=180,
        )

    arrive(b1, "b1")
    drain("ckpt")
    arrive(b2, "b2")
    drain("ckpt")

    batch_est = sorted(
        map(
            tuple,
            hll_estimate(
                hll_register_table(docs, "text", keys="source"),
                keys="source",
            ).collect(),
        )
    )
    stream_est = sorted(
        map(tuple, read_hll_estimate(spark, store, keys="source").collect())
    )
    assert stream_est == batch_est

    # full replay with a fresh checkpoint: same estimate, max is
    # idempotent — no fencing required for correctness
    drain("ckpt_replay")
    replay_est = sorted(
        map(tuple, read_hll_estimate(spark, store, keys="source").collect())
    )
    assert replay_est == batch_est
    regs = read_hll_registers(spark, store, keys="source")
    merged_batch = hll_register_table(docs, "text", keys="source")
    assert sorted(map(tuple, regs.collect())) == sorted(
        map(tuple, merged_batch.collect())
    )


def test_stream_cms_counts_matches_batch_and_replay_exactly_once(
    spark, sf_dir, tmp_path
):
    """Streaming CMS store: after two drains the summed cells must
    equal the batch sketch over all data; a replay must NOT double
    the counters (additive merge — the batch-partition overwrite is
    what carries exactly-once here, unlike the HLL store's
    idempotent max)."""
    import shutil

    from spark_sorted_spark.functions.sketches import cms_build, cms_estimate
    from spark_sorted_spark.streaming import (
        read_cms_cells,
        stream_cms_counts,
        stream_table,
    )

    docs = load_table(spark, "documents", sf_dir)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    b2 = docs.filter(F.col("doc_id") % 2 == 0)

    watch = tmp_path / "incoming"
    watch.mkdir()
    store = str(tmp_path / "cms_store")

    def arrive(batch, name):
        staged = tmp_path / f"stage_{name}"
        batch.coalesce(1).write.mode("overwrite").parquet(str(staged))
        for f in staged.glob("*.parquet"):
            shutil.move(str(f), str(watch / f"{name}_{f.name}"))

    def drain(ckpt):
        sdf = stream_table(spark, "documents", sf_dir, path=str(watch))
        stream_cms_counts(
            sdf, "source", store, str(tmp_path / ckpt), timeout_sec=180
        )

    arrive(b1, "b1")
    drain("ckpt")
    arrive(b2, "b2")
    drain("ckpt")

    batch_cells = sorted(
        map(tuple, cms_build(docs, "source").collect())
    )
    stream_cells = sorted(
        map(tuple, read_cms_cells(spark, store).collect())
    )
    assert stream_cells == batch_cells

    # crash replay at the sink level: a replayed batch re-runs with
    # the SAME batch id and file set (pinned in the checkpoint's
    # offsets log — the engine's contract), so re-executing batch
    # 1's write must leave the store unchanged: overwrite of its own
    # partition, never a second addition. (Driving the engine itself
    # through a deleted commit marker trips Spark 4's same-JVM
    # concurrent-checkpoint-use guard, so the sink mechanism is
    # pinned directly — engine-level replay delivery is covered by
    # the ingest-loop replay test.)
    cms_build(b2, "source").write.mode("overwrite").parquet(
        f"{store}/ingest_batch_id=1"
    )
    replay_cells = sorted(
        map(tuple, read_cms_cells(spark, store).collect())
    )
    assert replay_cells == batch_cells

    # the merged store answers estimates exactly like the batch sketch
    probe = docs.select("source").distinct()
    est_stream = sorted(
        map(
            tuple,
            cms_estimate(probe, "source", read_cms_cells(spark, store)).collect(),
        )
    )
    est_batch = sorted(
        map(tuple, cms_estimate(probe, "source", cms_build(docs, "source")).collect())
    )
    assert est_stream == est_batch


def test_stream_histogram_matches_batch_and_replay_exactly_once(
    spark, sf_dir, tmp_path
):
    """Streaming quantile-histogram store: after two drains the summed
    buckets must equal the batch sketch over all data, the merged
    store must answer the same quantiles, and a replayed batch write
    must not double-count (additive merge -> exactly-once rides the
    batch-partition overwrite, same contract as the CMS store)."""
    import shutil

    from spark_sorted_spark.functions.sketches import (
        histogram_quantiles,
        histogram_sketch,
    )
    from spark_sorted_spark.streaming import (
        read_histogram,
        stream_histogram,
        stream_table,
    )

    docs = load_table(spark, "documents", sf_dir)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    b2 = docs.filter(F.col("doc_id") % 2 == 0)

    watch = tmp_path / "incoming"
    watch.mkdir()
    store = str(tmp_path / "hist_store")

    def arrive(batch, name):
        staged = tmp_path / f"stage_{name}"
        batch.coalesce(1).write.mode("overwrite").parquet(str(staged))
        for f in staged.glob("*.parquet"):
            shutil.move(str(f), str(watch / f"{name}_{f.name}"))

    def drain():
        sdf = stream_table(spark, "documents", sf_dir, path=str(watch))
        stream_histogram(
            sdf,
            F.length("text"),
            store,
            str(tmp_path / "ckpt"),
            keys=["source"],
            timeout_sec=180,
        )

    arrive(b1, "b1")
    drain()
    arrive(b2, "b2")
    drain()

    batch_sketch = sorted(
        map(
            tuple,
            histogram_sketch(docs, F.length("text"), keys=["source"]).collect(),
        )
    )
    stream_sketch = sorted(
        map(tuple, read_histogram(spark, store, keys=["source"]).collect())
    )
    assert stream_sketch == batch_sketch

    # replayed batch 1 re-writes its own partition: store unchanged
    histogram_sketch(b2, F.length("text"), keys=["source"]).write.mode(
        "overwrite"
    ).parquet(f"{store}/ingest_batch_id=1")
    assert (
        sorted(
            map(tuple, read_histogram(spark, store, keys=["source"]).collect())
        )
        == batch_sketch
    )

    # merged store answers the same quantiles as the batch sketch
    qs = [(1, 2, "p50"), (99, 100, "p99")]
    got = sorted(
        map(
            tuple,
            histogram_quantiles(
                read_histogram(spark, store, keys=["source"]), qs, keys=["source"]
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            histogram_quantiles(
                histogram_sketch(docs, F.length("text"), keys=["source"]),
                qs,
                keys=["source"],
            ).collect(),
        )
    )
    assert got == want


def test_compact_sketch_store_all_kinds(spark, sf_dir, tmp_path):
    """Compacting a multi-partition sketch store to one partition must
    leave every read-side answer identical (max-merge for HLL, sum
    for CMS/histogram), keep the max batch id so a resumed stream
    appends beside it, and actually reduce to a single partition."""
    from spark_sorted_spark.functions.sketches import (
        cms_build,
        histogram_sketch,
        hll_register_table,
    )
    from spark_sorted_spark.streaming.sketches import (
        compact_sketch_store,
        read_cms_cells,
        read_histogram,
        read_hll_registers,
    )

    docs = load_table(spark, "documents", sf_dir)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    b2 = docs.filter(F.col("doc_id") % 2 == 0)

    def parts(path):
        import os

        return sorted(
            d for d in os.listdir(path) if d.startswith("ingest_batch_id=")
        )

    # HLL (grouped): max-merge
    hll = str(tmp_path / "hll")
    for i, b in enumerate((b1, b2)):
        hll_register_table(b, "text", keys=["source"]).write.parquet(
            f"{hll}/ingest_batch_id={i}"
        )
    before = sorted(map(tuple, read_hll_registers(spark, hll, ["source"]).collect()))
    compact_sketch_store(spark, hll, "hll", keys=["source"])
    assert parts(hll) == ["ingest_batch_id=1"]
    assert sorted(map(tuple, read_hll_registers(spark, hll, ["source"]).collect())) == before
    # a later batch appends beside the compacted partition and merges
    hll_register_table(b1, "text", keys=["source"]).write.parquet(
        f"{hll}/ingest_batch_id=2"
    )
    assert sorted(map(tuple, read_hll_registers(spark, hll, ["source"]).collect())) == before

    # CMS: additive
    cms = str(tmp_path / "cms")
    for i, b in enumerate((b1, b2)):
        cms_build(b, "source").write.parquet(f"{cms}/ingest_batch_id={i}")
    before = sorted(map(tuple, read_cms_cells(spark, cms).collect()))
    compact_sketch_store(spark, cms, "cms")
    assert parts(cms) == ["ingest_batch_id=1"]
    assert sorted(map(tuple, read_cms_cells(spark, cms).collect())) == before

    # histogram: additive
    hist = str(tmp_path / "hist")
    for i, b in enumerate((b1, b2)):
        histogram_sketch(b, F.length("text"), keys=["source"]).write.parquet(
            f"{hist}/ingest_batch_id={i}"
        )
    before = sorted(map(tuple, read_histogram(spark, hist, ["source"]).collect()))
    compact_sketch_store(spark, hist, "histogram", keys=["source"])
    assert parts(hist) == ["ingest_batch_id=1"]
    assert sorted(map(tuple, read_histogram(spark, hist, ["source"]).collect())) == before

    import pytest as _pytest

    with _pytest.raises(ValueError, match="unknown sketch store kind"):
        compact_sketch_store(spark, hist, "tdigest")
    with _pytest.raises(ValueError, match="no batch partitions"):
        empty = str(tmp_path / "none")
        import os

        os.makedirs(empty)
        compact_sketch_store(spark, empty, "cms")
    # an EMPTY meta-less KMV store must hit the same clean error, not
    # a schema-inference AnalysisException from the legacy maxlen
    # probe (ADVICE r13)
    with _pytest.raises(ValueError, match="no batch partitions"):
        empty_kmv = str(tmp_path / "none_kmv")
        os.makedirs(empty_kmv)
        compact_sketch_store(spark, empty_kmv, "kmv", k=16)
    # a MISSING store likewise (not a py4j FileNotFoundException from
    # the max-batch listStatus)
    with _pytest.raises(ValueError, match="no batch partitions"):
        compact_sketch_store(spark, str(tmp_path / "never_made"), "kmv", k=16)


def test_stream_bloom_matches_batch_idempotent_replay(spark, sf_dir, tmp_path):
    """Streaming Bloom store: two drains must leave the OR-merged
    filter word-identical to the batch filter over all data; because
    OR is idempotent, even a DOUBLE-counted batch (appended beside
    its own partition — worse than any real replay) changes nothing,
    and the merged filter answers membership like the batch one."""
    import shutil

    from spark_sorted_spark.functions.sketches import bloom_build, bloom_members
    from spark_sorted_spark.streaming import read_bloom, stream_bloom, stream_table

    docs = load_table(spark, "documents", sf_dir)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    b2 = docs.filter(F.col("doc_id") % 2 == 0)

    watch = tmp_path / "incoming"
    watch.mkdir()
    store = str(tmp_path / "bloom_store")

    def arrive(batch, name):
        staged = tmp_path / f"stage_{name}"
        batch.coalesce(1).write.mode("overwrite").parquet(str(staged))
        for f in staged.glob("*.parquet"):
            shutil.move(str(f), str(watch / f"{name}_{f.name}"))

    def drain():
        sdf = stream_table(spark, "documents", sf_dir, path=str(watch))
        stream_bloom(sdf, "source", store, str(tmp_path / "ckpt"), timeout_sec=180)

    arrive(b1, "b1")
    drain()
    arrive(b2, "b2")
    drain()

    batch_words = sorted(map(tuple, bloom_build(docs, "source").collect()))
    assert sorted(map(tuple, read_bloom(spark, store).collect())) == batch_words

    # idempotence: duplicate batch-1 words into an EXTRA partition
    bloom_build(b2, "source").write.parquet(f"{store}/ingest_batch_id=9")
    assert sorted(map(tuple, read_bloom(spark, store).collect())) == batch_words

    # membership parity + compaction keeps answers identical
    probe = docs.select("source").distinct()
    want = sorted(
        r.source
        for r in bloom_members(probe, "source", bloom_build(docs, "source")).collect()
    )
    got = sorted(
        r.source
        for r in bloom_members(probe, "source", read_bloom(spark, store)).collect()
    )
    assert got == want
    from spark_sorted_spark.streaming import compact_sketch_store

    compact_sketch_store(spark, store, "bloom")
    import os

    assert sorted(
        d for d in os.listdir(store) if d.startswith("ingest_batch_id=")
    ) == ["ingest_batch_id=9"]
    assert sorted(map(tuple, read_bloom(spark, store).collect())) == batch_words


def test_swap_in_crash_windows_are_recoverable(spark, tmp_path):
    """ADVICE r7: the compact swap must never delete the only readable
    copy before the replacement is in place. Pin the helper's three
    states: a leftover ``.old`` from a completed swap is swept; a
    crash between the renames leaves the full store in ``.old``
    (recover by renaming back); a completed swap leaves the merged
    partition live."""
    import os

    from spark_sorted_spark.functions.dedup import _rename, _swap_in

    def mk(path, tag):
        spark.createDataFrame([(tag,)], "v string").write.mode(
            "overwrite"
        ).parquet(path)

    # completed swap sweeps a leftover .old and lands the staged dir
    live = str(tmp_path / "store")
    mk(live, "live")
    mk(f"{live}.old", "stale")
    staged = str(tmp_path / "staged")
    mk(staged, "merged")
    _swap_in(spark, staged, live, f"{live}/ingest_batch_id=3")
    assert not os.path.exists(f"{live}.old")
    assert not os.path.exists(staged)
    got = spark.read.parquet(live).collect()
    assert [r.v for r in got] == ["merged"]
    assert os.path.isdir(f"{live}/ingest_batch_id=3")

    # mid-swap crash state (live renamed aside, staged not yet in):
    # the old store is intact in .old and a rename restores it
    live2 = str(tmp_path / "store2")
    mk(live2, "precious")
    _rename(spark, live2, f"{live2}.old")
    assert not os.path.exists(live2)
    _rename(spark, f"{live2}.old", live2)
    assert [r.v for r in spark.read.parquet(live2).collect()] == ["precious"]


def test_truncated_ingest_marker_fails_friendly_not_json_error(
    spark, sf_dir, tmp_path
):
    """ADVICE r7: a torn marker write used to wedge every start in
    json.loads. An unparseable marker must behave like NO marker: the
    friendly identity-mismatch guard with populated data, silent
    takeover with allow_restart."""
    import pytest as _pytest

    from spark_sorted_spark.streaming.ingest import _resolve_stream_base

    corpus = tmp_path / "corpus"
    part = corpus / "ingest_batch_id=0"
    part.mkdir(parents=True)
    load_table(spark, "documents", sf_dir).limit(5).write.mode(
        "overwrite"
    ).parquet(str(part))
    (corpus / "_ingest_stream").write_text('{"id": "abc", "ba')  # torn JSON

    ckpt = str(tmp_path / "ckpt")
    with _pytest.raises(ValueError, match="different ingest stream"):
        _resolve_stream_base(spark, str(corpus), ckpt, allow_restart=False)
    # allow_restart continues past the existing partition with offset ids
    base = _resolve_stream_base(spark, str(corpus), ckpt, allow_restart=True)
    assert base == 1
    # and the marker is rewritten atomically as valid JSON
    import json

    marker = json.loads((corpus / "_ingest_stream").read_text())
    assert marker["base"] == 1


def test_stream_index_embeddings_lifecycle(spark, sf_dir, tmp_path):
    """Streaming ANN index maintenance: two drains over a growing
    vector stream must leave an index whose bucket assignment (and
    probe answers) equal a one-shot batch build over the same
    vectors; a second drain of the same checkpoint with no new files
    must change nothing; a fresh checkpoint against the populated
    index fails loudly and allow_restart offsets past it."""
    import shutil

    import pytest as _pytest

    from spark_sorted_spark.functions.similarity import (
        ann_lsh_topk_indexed,
        build_ann_lsh_index,
    )
    from spark_sorted_spark.streaming import stream_index_embeddings, stream_table

    emb = load_table(spark, "embeddings", sf_dir)
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()[1]]
    corpus = emb.filter(F.col("vec_id") != 0)
    b1 = corpus.filter(F.col("vec_id") % 2 == 1)
    b2 = corpus.filter(F.col("vec_id") % 2 == 0)

    watch = tmp_path / "incoming"
    watch.mkdir()
    idx = str(tmp_path / "stream_idx")
    ckpt = str(tmp_path / "ckpt")

    def arrive(batch, name):
        staged = tmp_path / f"stage_{name}"
        batch.coalesce(1).write.mode("overwrite").parquet(str(staged))
        for f in staged.glob("*.parquet"):
            shutil.move(str(f), str(watch / f"{name}_{f.name}"))

    def drain(ckpt_dir, **kw):
        sdf = stream_table(spark, "embeddings", sf_dir, path=str(watch))
        stream_index_embeddings(sdf, idx, ckpt_dir, timeout_sec=180, **kw)

    arrive(b1, "b1")
    drain(ckpt)
    arrive(b2, "b2")
    drain(ckpt)

    built = str(tmp_path / "batch_idx")
    build_ann_lsh_index(corpus, built)
    got_assign = {
        (r.vec_id, r.bucket) for r in spark.read.parquet(idx).collect()
    }
    want_assign = {
        (r.vec_id, r.bucket) for r in spark.read.parquet(built).collect()
    }
    assert got_assign == want_assign
    got = ann_lsh_topk_indexed(spark, idx, qvec, k=5).collect()
    want = ann_lsh_topk_indexed(spark, built, qvec, k=5).collect()
    assert [(r.vec_id, r.rank) for r in got] == [(r.vec_id, r.rank) for r in want]

    # idle drain: no new files, nothing changes
    drain(ckpt)
    assert {
        (r.vec_id, r.bucket) for r in spark.read.parquet(idx).collect()
    } == want_assign

    # fresh checkpoint against the populated index: loud
    with _pytest.raises(ValueError, match="different ingest stream"):
        drain(str(tmp_path / "ckpt2"))
    # allow_restart: new batches offset past the existing partitions
    arrive(b1.limit(0), "b3")  # empty arrival just to run a batch
    drain(str(tmp_path / "ckpt2"), allow_restart=True)
    assert {
        (r.vec_id, r.bucket) for r in spark.read.parquet(idx).collect()
    } == want_assign


def test_compact_corpus_preserves_rows_marker_and_stream(spark, sf_dir, tmp_path):
    """Corpus compaction: after two drains, compact to one partition —
    identical rows, compacted into the RESERVED base id -1 (so a
    replayed crash batch can never overwrite the compacted corpus,
    ADVICE r8), identity marker preserved so the SAME stream continues
    (a third drain dedups against the compacted corpus and lands
    beside it)."""
    import os
    import shutil

    from spark_sorted_spark.functions.dedup import build_minhash_band_store
    from spark_sorted_spark.streaming import stream_table
    from spark_sorted_spark.streaming.ingest import (
        compact_corpus,
        stream_ingest_dedup,
    )

    docs = load_table(spark, "documents", sf_dir)
    b1 = docs.filter(F.col("doc_id") % 3 == 0)
    b2 = docs.filter(F.col("doc_id") % 3 == 1)
    b3 = docs.filter(F.col("doc_id") % 3 == 2)

    def setup(root):
        watch = root / "incoming"
        watch.mkdir(parents=True)
        store = str(root / "store")
        build_minhash_band_store(spark.createDataFrame([], docs.schema), store)
        return watch, store, str(root / "corpus"), str(root / "audit"), str(
            root / "ckpt"
        )

    def arrive(watch, batch, name):
        staged = watch.parent / f"stage_{name}"
        batch.coalesce(1).write.mode("overwrite").parquet(str(staged))
        for f in staged.glob("*.parquet"):
            shutil.move(str(f), str(watch / f"{name}_{f.name}"))

    def drain(watch, store, corpus, audit, ckpt):
        sdf = stream_table(spark, "documents", sf_dir, path=str(watch))
        stream_ingest_dedup(sdf, store, corpus, audit, ckpt, timeout_sec=180)

    # control: same three batches, never compacted -> the truth
    cw, cs, cc, ca, cck = setup(tmp_path / "control")
    arrive(cw, b1, "b1")
    drain(cw, cs, cc, ca, cck)
    arrive(cw, b2, "b2")
    drain(cw, cs, cc, ca, cck)
    arrive(cw, b3, "b3")
    drain(cw, cs, cc, ca, cck)
    truth = sorted(r.doc_id for r in spark.read.parquet(cc).collect())

    watch, store, corpus, audit, ckpt = setup(tmp_path / "compacted")
    arrive(watch, b1, "b1")
    drain(watch, store, corpus, audit, ckpt)
    arrive(watch, b2, "b2")
    drain(watch, store, corpus, audit, ckpt)
    before = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    marker_before = (tmp_path / "compacted" / "corpus" / "_ingest_stream").read_text()

    compact_corpus(spark, corpus)
    parts = [d for d in os.listdir(corpus) if d.startswith("ingest_batch_id=")]
    assert parts == ["ingest_batch_id=-1"]
    assert sorted(r.doc_id for r in spark.read.parquet(corpus).collect()) == before
    assert (tmp_path / "compacted" / "corpus" / "_ingest_stream").read_text() == marker_before
    assert not os.path.exists(f"{corpus}.old")
    assert not os.path.exists(f"{corpus}.compacting")

    # the SAME stream continues: the next batch lands beside the
    # compacted partition and dedups against it — final corpus equals
    # the never-compacted control run's
    arrive(watch, b3, "b3")
    drain(watch, store, corpus, audit, ckpt)
    after = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    assert after == truth

    # empty corpus: loud
    import pytest as _pytest

    empty = str(tmp_path / "none")
    os.makedirs(empty)
    with _pytest.raises(ValueError, match="no batch partitions"):
        compact_corpus(spark, empty)


def test_stream_fold_expression_order_by(spark, tmp_path):
    """order_by accepts Column expressions (matching group_sort):
    fold rows within each batch by a derived sort key; hidden columns
    never reach the output."""
    df = spark.createDataFrame(
        [("a", 3, "t1"), ("a", 1, "t0"), ("a", 2, "t2")], ["k", "v", "tag"]
    )
    path = str(tmp_path / "exprsrc")
    df.coalesce(1).write.parquet(path)
    sdf = spark.readStream.schema(df.schema).parquet(path)
    # fold concatenates v in order of tag DESC via an expression
    out = run_available_now(
        stream_fold_by_key(
            sdf,
            "k",
            "",
            lambda acc, v: acc + str(v),
            value_col="v",
            alias="seq",
            order_by=[(F.substring(F.col("tag"), 2, 1), False)],
            state_ddl="string",
        ),
        output_mode="update",
    )
    rows = out.collect()
    assert [r.k for r in rows] == ["a"]
    assert rows[0].seq == "231"  # tag t2, t1, t0 -> v 2, 3, 1
    assert "__gs_order_0" not in out.columns


def test_stream_maintain_gram_store_lifecycle(spark, sf_dir, tmp_path):
    """Streaming gram-store maintenance: two drains over a growing
    document stream must leave a store whose clean_against_gram_store
    answers equal a store built one-shot over the same corpus; an
    idle drain changes nothing; a fresh checkpoint against the
    populated store fails loudly; a fresh store requires an explicit
    min_len which is then recorded."""
    import shutil

    import pytest as _pytest

    from spark_sorted_spark.functions.dedup import (
        build_gram_store,
        clean_against_gram_store,
    )
    from spark_sorted_spark.streaming import (
        stream_maintain_gram_store,
        stream_table,
    )

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    b2 = docs.filter((F.col("doc_id") % 2 == 1) & (F.col("doc_id") < 400))
    probe = spark.createDataFrame(
        [(900001, docs.head().text), (900002, "u1 u2 u3 u4 u5 u6 u7 u8 u9")],
        ["doc_id", "text"],
    )

    watch = tmp_path / "incoming"
    watch.mkdir()
    store = str(tmp_path / "stream_gram_store")
    ckpt = str(tmp_path / "ckpt")

    def arrive(batch, name):
        staged = tmp_path / f"stage_{name}"
        batch.coalesce(1).write.mode("overwrite").parquet(str(staged))
        for f in staged.glob("*.parquet"):
            shutil.move(str(f), str(watch / f"{name}_{f.name}"))

    def drain(ckpt_dir, **kw):
        sdf = stream_table(
            spark, "documents", sf_dir, path=str(watch)
        ).select("doc_id", "text")
        stream_maintain_gram_store(
            sdf, store, ckpt_dir, timeout_sec=180, **kw
        )

    # fresh store: min_len is required on the first drain
    arrive(b1, "b1")
    with _pytest.raises(ValueError, match="min_len"):
        drain(ckpt)
    drain(ckpt, min_len=8)
    arrive(b2, "b2")
    drain(ckpt)  # width now adopted from _gram_meta

    built = str(tmp_path / "batch_store")
    build_gram_store(b1.unionByName(b2), built, min_len=8)

    def snap(path):
        return {
            r.doc_id: (r.n_tokens_kept, r.text_clean)
            for r in clean_against_gram_store(probe, path).collect()
        }

    want = snap(built)
    assert snap(store) == want
    assert want[900001][0] == 0  # corpus copy fully cut
    assert want[900002][1] == "u1 u2 u3 u4 u5 u6 u7 u8 u9"  # unique kept

    # idle drain: no new files, nothing changes
    drain(ckpt)
    assert snap(store) == want

    # fresh checkpoint against the populated store: loud
    with _pytest.raises(ValueError, match="different ingest stream"):
        drain(str(tmp_path / "ckpt2"))

    # an explicit min_len mismatching the recorded width fails EAGERLY
    # (a plain ValueError before any stream/checkpoint side effect, not
    # an opaque StreamingQueryException from inside foreachBatch) —
    # ADVICE r9
    with _pytest.raises(ValueError, match="min_len=8, got min_len=9"):
        drain(ckpt, min_len=9)
    assert snap(store) == want

    # compaction must preserve the _ingest_stream marker (it lives
    # inside {store}/grams, the dir the swap replaces — ADVICE r9):
    # the SAME checkpoint resumes cleanly afterwards and a post-compact
    # batch still dedups against the compacted base
    from spark_sorted_spark.functions.dedup import compact_gram_store

    compact_gram_store(spark, store)
    assert (tmp_path / "stream_gram_store" / "grams" / "_ingest_stream").exists()
    assert snap(store) == want
    b3 = docs.filter((F.col("doc_id") % 2 == 1) & (F.col("doc_id") >= 400))
    arrive(b3, "b3")
    drain(ckpt)  # no ValueError: marker survived the compact
    built_all = str(tmp_path / "batch_store_all")
    build_gram_store(
        b1.unionByName(b2).unionByName(b3), built_all, min_len=8
    )
    assert snap(store) == snap(built_all)


def test_stream_maintain_bm25_index_lifecycle(spark, sf_dir, tmp_path):
    """Streaming BM25 index maintenance: two drains over a growing
    document stream leave an index whose probes equal a text scan of
    the full corpus; an idle drain changes nothing; a fresh checkpoint
    against the populated index fails loudly; a missing index fails
    eagerly; compaction preserves the stream marker and the SAME
    checkpoint resumes after it."""
    import shutil

    import pytest as _pytest

    from spark_sorted_spark.functions.retrieval import (
        bm25_topk,
        bm25_topk_indexed,
        build_bm25_index,
        compact_bm25_index,
    )
    from spark_sorted_spark.streaming import (
        stream_maintain_bm25_index,
        stream_table,
    )

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 3 == 0)
    b1 = docs.filter(F.col("doc_id") % 3 == 1)
    b2 = docs.filter((F.col("doc_id") % 3 == 2) & (F.col("doc_id") < 300))
    q = "spark join window filter"

    watch = tmp_path / "incoming"
    watch.mkdir()
    idx = str(tmp_path / "stream_bm25_idx")
    ckpt = str(tmp_path / "ckpt")

    def arrive(batch, name):
        staged = tmp_path / f"stage_{name}"
        batch.coalesce(1).write.mode("overwrite").parquet(str(staged))
        for f in staged.glob("*.parquet"):
            shutil.move(str(f), str(watch / f"{name}_{f.name}"))

    def drain(ckpt_dir):
        sdf = stream_table(
            spark, "documents", sf_dir, path=str(watch)
        ).select("doc_id", "text")
        stream_maintain_bm25_index(sdf, idx, ckpt_dir, timeout_sec=180)

    def probe():
        return [
            (r.doc_id, r.score, r.n_terms_matched)
            for r in bm25_topk_indexed(spark, idx, q, k=25).collect()
        ]

    def scan(d):
        return [
            (r.doc_id, r.score, r.n_terms_matched)
            for r in bm25_topk(d, q, k=25).collect()
        ]

    # the stream cannot create the index (n_buckets is structural)
    arrive(b1, "b1")
    with _pytest.raises(ValueError, match="build_bm25_index"):
        drain(ckpt)
    build_bm25_index(base, idx, n_buckets=32)
    drain(ckpt)
    assert probe() == scan(base.unionByName(b1))

    arrive(b2, "b2")
    drain(ckpt)
    want = scan(base.unionByName(b1).unionByName(b2))
    assert probe() == want

    # idle drain: nothing changes
    drain(ckpt)
    assert probe() == want

    # fresh checkpoint against the populated index: loud
    with _pytest.raises(ValueError, match="different ingest stream"):
        drain(str(tmp_path / "ckpt2"))

    # compaction preserves the marker: same checkpoint resumes, and a
    # post-compact batch still lands correctly
    compact_bm25_index(spark, idx)
    assert probe() == want
    b3 = docs.filter((F.col("doc_id") % 3 == 2) & (F.col("doc_id") >= 300))
    arrive(b3, "b3")
    drain(ckpt)
    assert probe() == scan(docs)


def test_stream_maintain_ann_ivfpq_index_lifecycle(spark, sf_dir, tmp_path):
    """Streaming IVF-PQ maintenance: two drains over a growing
    embedding stream leave an index whose full probe + corpus-wide
    exact rerank equals brute-force cosine over everything that
    arrived; an idle drain changes nothing; a fresh checkpoint against
    the populated index fails loudly; a missing index fails eagerly
    (the stream cannot train quantizers)."""
    import shutil

    import pytest as _pytest

    from spark_sorted_spark.functions.similarity import (
        ANN_NLIST,
        ann_ivfpq_topk_indexed,
        build_ann_ivfpq_index,
        cosine_topk,
    )
    from spark_sorted_spark.streaming import (
        stream_maintain_ann_ivfpq_index,
        stream_table,
    )

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "embedding"
    )
    qvec = [
        float(x) for x in emb.filter(F.col("vec_id") == 0).head()[1]
    ]
    corpus = emb.filter(F.col("vec_id") != 0)
    base = corpus.filter(F.col("vec_id") % 3 == 0)
    b1 = corpus.filter(F.col("vec_id") % 3 == 1)
    b2 = corpus.filter(F.col("vec_id") % 3 == 2)

    watch = tmp_path / "incoming"
    watch.mkdir()
    idx = str(tmp_path / "stream_ivfpq_idx")
    ckpt = str(tmp_path / "ckpt")

    def arrive(batch, name):
        staged = tmp_path / f"stage_{name}"
        batch.coalesce(1).write.mode("overwrite").parquet(str(staged))
        for f in staged.glob("*.parquet"):
            shutil.move(str(f), str(watch / f"{name}_{f.name}"))

    def drain(ckpt_dir):
        sdf = stream_table(
            spark, "embeddings", sf_dir, path=str(watch)
        ).select("vec_id", "embedding")
        stream_maintain_ann_ivfpq_index(sdf, idx, ckpt_dir, timeout_sec=180)

    def probe():
        return [
            (r.vec_id, r.rank, r.cos)
            for r in ann_ivfpq_topk_indexed(
                spark, idx, qvec, k=5, nprobe=ANN_NLIST, rerank=10**6
            ).collect()
        ]

    def brute(d):
        return [
            (r.vec_id, r.rank, r.cos)
            for r in cosine_topk(d, qvec, k=5).collect()
        ]

    # the stream cannot create the index (quantizers are trained state)
    arrive(b1, "b1")
    with _pytest.raises(ValueError, match="build_ann_ivfpq_index"):
        drain(ckpt)
    build_ann_ivfpq_index(base, idx)
    drain(ckpt)
    assert probe() == brute(base.unionByName(b1))

    arrive(b2, "b2")
    drain(ckpt)
    want = brute(corpus)
    assert probe() == want

    # idle drain: nothing changes
    drain(ckpt)
    assert probe() == want

    # fresh checkpoint against the populated index: loud
    with _pytest.raises(ValueError, match="different ingest stream"):
        drain(str(tmp_path / "ckpt2"))


def test_stream_adopts_prebuilt_gram_store(spark, sf_dir, tmp_path):
    """A store holding ONLY the build's reserved base partition
    (ingest_batch_id=-1) carries no stream batches to clobber — a new
    stream must ADOPT it (the docstring's 'may hold a prior
    build_gram_store base' promise; pre-round-10 the no-marker guard
    refused — only the empty-store path worked). Data written by a
    STREAM (batch partitions >= 0) still guards loudly."""
    import shutil

    from spark_sorted_spark.functions.dedup import (
        build_gram_store,
        clean_against_gram_store,
    )
    from spark_sorted_spark.streaming import (
        stream_maintain_gram_store,
        stream_table,
    )

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)

    store = str(tmp_path / "prebuilt_store")
    build_gram_store(base, store, min_len=8)

    watch = tmp_path / "incoming"
    watch.mkdir()
    staged = tmp_path / "stage"
    b1.coalesce(1).write.mode("overwrite").parquet(str(staged))
    for f in staged.glob("*.parquet"):
        shutil.move(str(f), str(watch / f.name))

    sdf = stream_table(spark, "documents", sf_dir, path=str(watch)).select(
        "doc_id", "text"
    )
    # fresh checkpoint + marker-less prebuilt store: adopts, no raise
    stream_maintain_gram_store(
        sdf, store, str(tmp_path / "ckpt"), timeout_sec=180
    )
    probe = docs.filter(F.col("doc_id") % 7 == 3).limit(30)
    built_all = str(tmp_path / "batch_all")
    build_gram_store(docs, built_all, min_len=8)

    def snap(path):
        return sorted(
            (r.doc_id, r.n_tokens_kept)
            for r in clean_against_gram_store(probe, path).collect()
        )

    assert snap(store) == snap(built_all)


def test_compact_corpus_manifest_layout(spark, sf_dir, tmp_path):
    """PARITY open item #3: the ingest corpus supports the
    generation-pointer layout. compact_corpus(commit='manifest')
    converts a rename-layout corpus (pointer committed LAST, loose
    partitions swept after), reads resolve through the pointer with
    identical rows, the identity marker is carried so the SAME stream
    resumes against the new generation, a later compaction publishes
    the next generation, and commit='rename' on a manifest corpus
    refuses (readers may hold the pointer)."""
    import os
    import shutil

    import pytest as _pytest

    from spark_sorted_spark.functions.dedup import build_minhash_band_store
    from spark_sorted_spark.sources.manifest import resolve_root
    from spark_sorted_spark.streaming import stream_table
    from spark_sorted_spark.streaming.ingest import (
        compact_corpus,
        stream_ingest_dedup,
    )

    docs = load_table(spark, "documents", sf_dir)
    b1 = docs.filter(F.col("doc_id") % 3 == 0)
    b2 = docs.filter(F.col("doc_id") % 3 == 1)
    b3 = docs.filter(F.col("doc_id") % 3 == 2)

    watch = tmp_path / "incoming"
    watch.mkdir()
    store = str(tmp_path / "store")
    build_minhash_band_store(spark.createDataFrame([], docs.schema), store)
    corpus = str(tmp_path / "corpus")
    audit = str(tmp_path / "audit")
    ckpt = str(tmp_path / "ckpt")

    def arrive(batch, name):
        staged = tmp_path / f"stage_{name}"
        batch.coalesce(1).write.mode("overwrite").parquet(str(staged))
        for f in staged.glob("*.parquet"):
            shutil.move(str(f), str(watch / f"{name}_{f.name}"))

    def drain():
        sdf = stream_table(spark, "documents", sf_dir, path=str(watch))
        stream_ingest_dedup(sdf, store, corpus, audit, ckpt, timeout_sec=180)

    arrive(b1, "b1")
    drain()
    arrive(b2, "b2")
    drain()
    before = sorted(r.doc_id for r in spark.read.parquet(corpus).collect())
    marker = (tmp_path / "corpus" / "_ingest_stream").read_text()

    compact_corpus(spark, corpus, commit="manifest")
    assert os.path.exists(f"{corpus}/_current")
    cur = resolve_root(spark, corpus)
    assert cur == f"{corpus}/gen-0"
    assert sorted(r.doc_id for r in spark.read.parquet(cur).collect()) == before
    assert (
        [d for d in os.listdir(cur) if d.startswith("ingest_batch_id=")]
        == ["ingest_batch_id=-1"]
    )
    # marker carried into the generation; loose root partitions swept
    assert (tmp_path / "corpus" / "gen-0" / "_ingest_stream").read_text() == marker
    assert not [
        d for d in os.listdir(corpus) if d.startswith("ingest_batch_id=")
    ]
    assert not os.path.exists(f"{corpus}/_ingest_stream")

    # the SAME stream resumes against the new generation: the next
    # batch dedups against the compacted corpus and lands beside it
    arrive(b3, "b3")
    drain()
    after = sorted(r.doc_id for r in spark.read.parquet(cur).collect())
    assert len(after) > len(before)
    parts = {d for d in os.listdir(cur) if d.startswith("ingest_batch_id=")}
    assert "ingest_batch_id=-1" in parts and len(parts) == 2

    # a later compaction publishes the NEXT generation with the same
    # rows and carries the marker again
    compact_corpus(spark, corpus)
    cur2 = resolve_root(spark, corpus)
    assert cur2 == f"{corpus}/gen-1"
    assert sorted(r.doc_id for r in spark.read.parquet(cur2).collect()) == after
    assert (tmp_path / "corpus" / "gen-1" / "_ingest_stream").read_text() == marker

    # no down-migration: readers may hold the pointer
    with _pytest.raises(ValueError, match="manifest-layout"):
        compact_corpus(spark, corpus, commit="rename")
    with _pytest.raises(ValueError, match="commit must"):
        compact_corpus(spark, corpus, commit="copy")


def test_stream_maintain_ann_ivf_index_lifecycle(spark, sf_dir, tmp_path):
    """Streaming plain-IVF maintenance: two drains leave an index
    whose full probe equals brute-force cosine over everything that
    arrived; an idle drain changes nothing; a fresh checkpoint against
    the populated index fails loudly; a missing index fails eagerly;
    an IVF-PQ index at the path is rejected (codes, not embeddings)."""
    import shutil

    import pytest as _pytest

    from spark_sorted_spark.functions.similarity import (
        ANN_NLIST,
        ann_ivf_topk_indexed,
        build_ann_ivf_index,
        build_ann_ivfpq_index,
        cosine_topk,
    )
    from spark_sorted_spark.streaming import (
        stream_maintain_ann_ivf_index,
        stream_table,
    )

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "embedding"
    )
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()[1]]
    corpus = emb.filter(F.col("vec_id") != 0)
    base = corpus.filter(F.col("vec_id") % 3 == 0)
    b1 = corpus.filter(F.col("vec_id") % 3 == 1)
    b2 = corpus.filter(F.col("vec_id") % 3 == 2)

    watch = tmp_path / "incoming"
    watch.mkdir()
    idx = str(tmp_path / "stream_ivf_idx")
    ckpt = str(tmp_path / "ckpt")

    def arrive(batch, name):
        staged = tmp_path / f"stage_{name}"
        batch.coalesce(1).write.mode("overwrite").parquet(str(staged))
        for f in staged.glob("*.parquet"):
            shutil.move(str(f), str(watch / f"{name}_{f.name}"))

    def drain(ckpt_dir):
        sdf = stream_table(
            spark, "embeddings", sf_dir, path=str(watch)
        ).select("vec_id", "embedding")
        stream_maintain_ann_ivf_index(sdf, idx, ckpt_dir, timeout_sec=180)

    def probe():
        return [
            (r.vec_id, r.rank, r.cos)
            for r in ann_ivf_topk_indexed(
                spark, idx, qvec, k=5, nprobe=ANN_NLIST
            ).collect()
        ]

    def brute(d):
        return [
            (r.vec_id, r.rank, r.cos)
            for r in cosine_topk(d, qvec, k=5).collect()
        ]

    # the stream cannot create the index (centroids are trained state)
    arrive(b1, "b1")
    with _pytest.raises(ValueError, match="build_ann_ivf_index"):
        drain(ckpt)
    # an IVF-PQ index at the path is the WRONG layout for this stream
    pq_idx = str(tmp_path / "pq_idx")
    build_ann_ivfpq_index(base, pq_idx)
    with _pytest.raises(ValueError, match="_pq_meta"):
        stream_maintain_ann_ivf_index(
            stream_table(spark, "embeddings", sf_dir, path=str(watch))
            .select("vec_id", "embedding"),
            pq_idx,
            str(tmp_path / "ckpt_pq"),
        )
    build_ann_ivf_index(base, idx)
    drain(ckpt)
    assert probe() == brute(base.unionByName(b1))

    arrive(b2, "b2")
    drain(ckpt)
    want = brute(corpus)
    assert probe() == want

    # idle drain: nothing changes
    drain(ckpt)
    assert probe() == want

    # fresh checkpoint against the populated index: loud
    with _pytest.raises(ValueError, match="different ingest stream"):
        drain(str(tmp_path / "ckpt2"))


def test_stream_maintain_ann_ivfsq8_index_lifecycle(spark, sf_dir, tmp_path):
    """Streaming IVF-SQ8 maintenance: two drains leave an index whose
    full probe equals reconstructed-cosine brute force over everything
    that arrived (streamed batches quantize EXACTLY like the build —
    no codebook drift); an idle drain changes nothing; a fresh
    checkpoint fails loudly; a plain-IVF index at the path is
    rejected, as is the SQ8 index under the plain-IVF maintainer."""
    import shutil

    import pytest as _pytest

    from spark_sorted_spark.functions.similarity import (
        ANN_NLIST,
        ann_ivfsq8_topk_indexed,
        build_ann_ivf_index,
        build_ann_ivfsq8_index,
        cosine_topk,
        dequantize_embeddings,
        quantize_embeddings,
    )
    from spark_sorted_spark.streaming import (
        stream_maintain_ann_ivf_index,
        stream_maintain_ann_ivfsq8_index,
        stream_table,
    )

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "embedding"
    )
    qvec = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()[1]]
    corpus = emb.filter(F.col("vec_id") != 0)
    base = corpus.filter(F.col("vec_id") % 3 == 0)
    b1 = corpus.filter(F.col("vec_id") % 3 == 1)
    b2 = corpus.filter(F.col("vec_id") % 3 == 2)

    watch = tmp_path / "incoming"
    watch.mkdir()
    idx = str(tmp_path / "stream_sq8_idx")
    ckpt = str(tmp_path / "ckpt")

    def arrive(batch, name):
        staged = tmp_path / f"stage_{name}"
        batch.coalesce(1).write.mode("overwrite").parquet(str(staged))
        for f in staged.glob("*.parquet"):
            shutil.move(str(f), str(watch / f"{name}_{f.name}"))

    def drain(ckpt_dir):
        sdf = stream_table(
            spark, "embeddings", sf_dir, path=str(watch)
        ).select("vec_id", "embedding")
        stream_maintain_ann_ivfsq8_index(sdf, idx, ckpt_dir, timeout_sec=180)

    def probe():
        return [
            (r.vec_id, r.rank, r.acos)
            for r in ann_ivfsq8_topk_indexed(
                spark, idx, qvec, k=5, nprobe=ANN_NLIST
            ).collect()
        ]

    def brute(d):
        dec = dequantize_embeddings(quantize_embeddings(d))
        return [
            (r.vec_id, r.rank, r.cos)
            for r in cosine_topk(dec, qvec, k=5).collect()
        ]

    # the stream cannot create the index (centroids are trained state)
    arrive(b1, "b1")
    with _pytest.raises(ValueError, match="build_ann_ivfsq8_index"):
        drain(ckpt)
    # a plain-IVF index at the path is the WRONG layout for this
    # stream — and vice versa
    ivf_idx = str(tmp_path / "ivf_idx")
    build_ann_ivf_index(base, ivf_idx)
    with _pytest.raises(ValueError, match="_sq_meta"):
        stream_maintain_ann_ivfsq8_index(
            stream_table(spark, "embeddings", sf_dir, path=str(watch))
            .select("vec_id", "embedding"),
            ivf_idx,
            str(tmp_path / "ckpt_ivf"),
        )
    build_ann_ivfsq8_index(base, idx)
    with _pytest.raises(ValueError, match="stream_maintain_ann_ivfsq8"):
        stream_maintain_ann_ivf_index(
            stream_table(spark, "embeddings", sf_dir, path=str(watch))
            .select("vec_id", "embedding"),
            idx,
            str(tmp_path / "ckpt_x"),
        )

    drain(ckpt)
    assert probe() == brute(base.unionByName(b1))

    arrive(b2, "b2")
    drain(ckpt)
    want = brute(corpus)
    assert probe() == want

    # idle drain: nothing changes
    drain(ckpt)
    assert probe() == want

    # fresh checkpoint against the populated index: loud
    with _pytest.raises(ValueError, match="different ingest stream"):
        drain(str(tmp_path / "ckpt2"))


def test_stream_kmv_matches_batch_and_survives_replay(
    spark, sf_dir, tmp_path
):
    """Streaming KMV store: after two drains the merged sketch (and
    its estimate) must be ROW-IDENTICAL to the batch sketch over all
    data (bottom-k merge is exact); a full replay (fresh checkpoint,
    same files) changes nothing because the merge is an idempotent
    min-selection; compaction collapses the partitions and answers
    every read identically."""
    import shutil

    from spark_sorted_spark.functions.sketches import (
        kmv_estimate,
        kmv_sketch,
    )
    from spark_sorted_spark.streaming import (
        compact_sketch_store,
        read_kmv,
        read_kmv_estimate,
        stream_kmv,
        stream_table,
    )

    docs = load_table(spark, "documents", sf_dir)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)
    b2 = docs.filter(F.col("doc_id") % 2 == 0)

    watch = tmp_path / "incoming"
    watch.mkdir()
    store = str(tmp_path / "kmv_store")
    k = 32

    def arrive(batch, name):
        staged = tmp_path / f"stage_{name}"
        batch.coalesce(1).write.mode("overwrite").parquet(str(staged))
        for f in staged.glob("*.parquet"):
            shutil.move(str(f), str(watch / f"{name}_{f.name}"))

    def drain(ckpt):
        sdf = stream_table(spark, "documents", sf_dir, path=str(watch))
        stream_kmv(
            sdf, "text", store, str(tmp_path / ckpt),
            k=k, keys="source", timeout_sec=180,
        )

    arrive(b1, "b1")
    drain("ckpt")
    arrive(b2, "b2")
    drain("ckpt")

    want_sk = sorted(
        (r.source, list(r.kmv))
        for r in kmv_sketch(docs, "text", k=k, keys="source").collect()
    )
    got_sk = sorted(
        (r.source, list(r.kmv))
        for r in read_kmv(spark, store, k, keys="source").collect()
    )
    assert got_sk == want_sk
    want_est = sorted(
        map(
            tuple,
            kmv_estimate(
                kmv_sketch(docs, "text", k=k, keys="source"),
                k, keys="source",
            ).collect(),
        )
    )
    got_est = sorted(
        map(
            tuple,
            read_kmv_estimate(spark, store, k, keys="source").collect(),
        )
    )
    assert got_est == want_est

    # replay from a fresh checkpoint: idempotent — nothing changes
    drain("ckpt2")
    assert sorted(
        (r.source, list(r.kmv))
        for r in read_kmv(spark, store, k, keys="source").collect()
    ) == want_sk

    # ADVICE r12: the build k is persisted in _kmv_meta — reads and
    # compactions resolve it without the caller re-stating it, and a
    # k LARGER than the build k (which would flip the estimator into
    # its exact-count branch on a saturated sketch) is rejected
    assert sorted(
        (r.source, list(r.kmv))
        for r in read_kmv(spark, store, keys="source").collect()
    ) == want_sk

    import pytest as _pytest

    with _pytest.raises(ValueError, match="exceeds the store's build k"):
        read_kmv(spark, store, k * 2, keys="source")
    with _pytest.raises(ValueError, match="incompatible sketches"):
        drain_k = stream_table(spark, "documents", sf_dir, path=str(watch))
        stream_kmv(
            drain_k, "text", store, str(tmp_path / "ckpt3"),
            k=k * 2, keys="source", timeout_sec=180,
        )

    # compaction answers every read identically (k resolved from meta)
    compact_sketch_store(spark, store, "kmv", keys="source")
    assert sorted(
        (r.source, list(r.kmv))
        for r in read_kmv(spark, store, keys="source").collect()
    ) == want_sk
    # ... and the meta survives the compaction swap
    assert sorted(
        (r.source, list(r.kmv))
        for r in read_kmv(spark, store, k, keys="source").collect()
    ) == want_sk

    # legacy meta-less store: k is required again, loudly
    shutil.rmtree(f"{store}/_kmv_meta")
    with _pytest.raises(ValueError, match="legacy store"):
        read_kmv(spark, store, keys="source")
    assert sorted(
        (r.source, list(r.kmv))
        for r in read_kmv(spark, store, k, keys="source").collect()
    ) == want_sk
    # a resume into the legacy store refuses to stamp a guessed k
    # (the true build k is unknowable; compaction stamps a VALIDATED
    # one instead)
    with _pytest.raises(ValueError, match="legacy store"):
        drain_legacy = stream_table(
            spark, "documents", sf_dir, path=str(watch)
        )
        stream_kmv(
            drain_legacy, "text", store, str(tmp_path / "ckpt4"),
            k=k, keys="source", timeout_sec=180,
        )
    # legacy compact bounds k by the stored sketch lengths: these
    # sketches are UNSATURATED (longest < k), so even the true build
    # k is indistinguishable from a saturated smaller build and is
    # rejected — the guard must assume the worst...
    with _pytest.raises(ValueError, match="longest stored sketch"):
        compact_sketch_store(spark, store, "kmv", keys="source", k=k)
    # ...while any k <= the longest sketch is a provably valid
    # downsample: it compacts, re-stamps the meta, and the store then
    # answers reads exactly like batch-sketching all data at that k
    k2 = 8
    compact_sketch_store(spark, store, "kmv", keys="source", k=k2)
    want_k2 = sorted(
        (r.source, list(r.kmv))
        for r in kmv_sketch(docs, "text", k=k2, keys="source").collect()
    )
    assert sorted(
        (r.source, list(r.kmv))
        for r in read_kmv(spark, store, keys="source").collect()
    ) == want_k2
