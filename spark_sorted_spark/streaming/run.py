"""Bounded-stream execution helper.

``trigger(availableNow=True)`` drains everything currently in the
source through the streaming engine's incremental operators and stops
— the canonical batch-parity harness, and in production the pattern
for catch-up/backfill runs of a streaming pipeline.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession


def run_available_now(
    sdf: DataFrame,
    *,
    output_mode: str = "append",
    query_name: str | None = None,
    timeout_sec: int = 300,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Run a (bounded) streaming DataFrame to completion into a memory
    sink; return the sink's contents as a batch DataFrame.

    ``checkpoint_dir`` makes the run resumable: watermark, source
    offsets, and operator state persist there, so a second call with
    the same dir continues where the first stopped — the
    incremental-backfill pattern (and how the watermark tests pin
    late-data semantics deterministically)."""
    name = query_name or f"q_{uuid.uuid4().hex[:12]}"
    writer = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
    )
    if checkpoint_dir is not None:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    q = writer.start()
    try:
        if not q.awaitTermination(timeout_sec):
            raise TimeoutError(f"streaming query {name} did not finish")
    finally:
        q.stop()
    spark: SparkSession = sdf.sparkSession
    return spark.table(name)
