"""Streaming sources over the driver's parquet tables.

``readStream`` needs an explicit schema; we take it from a batch read
of the same path so the stream sees exactly the batch types (including
whatever event-time type ``sources.tpch`` surfaces this round —
timestamp[us] → TIMESTAMP_NTZ today, epoch-nanos int64 historically).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.tpch import DEFAULT_SF_DIR, event_ts, load_table


# One scratch dir per (table, sf_dir) per process, removed at exit —
# repeated stream construction must not leak tempdirs/symlinks.
_STREAM_DIRS: dict[tuple[str, str], str] = {}


def _as_stream_dir(name: str, sf_dir: str | None) -> str:
    """Spark's file streaming source requires a *directory*; the driver
    lays each table out as a single parquet file. Expose it through a
    scratch directory holding a symlink (no data copy), memoized per
    (table, sf_dir) and cleaned up atexit. In production the source
    would already be a directory of files/partitions and this shim
    disappears."""
    import atexit
    import os
    import shutil
    import tempfile

    src = os.path.join((sf_dir or DEFAULT_SF_DIR).rstrip("/"), f"{name}.parquet")
    key = (name, src)
    d = _STREAM_DIRS.get(key)
    if d is not None and os.path.isdir(d):
        return d
    d = tempfile.mkdtemp(prefix=f"stream_{name}_")
    os.symlink(src, os.path.join(d, f"{name}-0.parquet"))
    if not _STREAM_DIRS:
        atexit.register(
            lambda: [
                shutil.rmtree(p, ignore_errors=True) for p in _STREAM_DIRS.values()
            ]
        )
    _STREAM_DIRS[key] = d
    return d


def stream_table(
    spark: SparkSession,
    name: str,
    sf_dir: str | None = None,
    *,
    max_files_per_trigger: int | None = None,
    path: str | None = None,
    event_time: str | None = None,
) -> DataFrame:
    """File-source stream over ``{sf_dir}/{name}.parquet`` (or an
    explicit multi-file ``path``). ``max_files_per_trigger`` bounds
    micro-batch size — on a real cluster this is the knob that keeps
    per-batch state updates memory-bounded while backfilling 100 TB of
    history through the same query that serves the live stream.

    ``event_time`` names the event-time column (the driver parquet's
    ``ts`` — timestamp[us] or, historically, epoch-nanos int64) to
    normalize to a proper ``timestamp`` so watermarks / ``F.window`` /
    ``F.session_window`` apply. Type dispatch lives in
    ``sources.tpch.event_ts``.
    """
    batch = load_table(spark, name, sf_dir)
    reader = spark.readStream.schema(batch.schema)
    if path is None:
        path = _as_stream_dir(name, sf_dir)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    sdf = reader.parquet(path)
    if event_time is not None:
        sdf = sdf.withColumn(event_time, event_ts(sdf, event_time))
    return sdf
