"""Driver-side rows -> DataFrame without the per-core slice fan-out.

A bare ``spark.createDataFrame(list)`` parallelizes the rows into one
pickled slice PER CORE (``defaultParallelism``), so every tiny
workload-bounded relation in the engine — (query, term) pairs,
probe-cell tables, feedback weights, quota literals, one-row store
metadata — fanned out to 32 near-empty Python-worker tasks per
materialization on ``local[32]`` (round-15 profile: ~200-300 ms of
executor time EACH, several such relations per batch query; the
measured alternative, one-slice ``parallelize``, is a single
JVM-scheduled task).

``local_rows_df`` sizes the slice count from the ROW COUNT instead:
one slice per 50k rows, capped at ``defaultParallelism``. The usual
tens-of-rows relation becomes a single task; a genuinely large batch
still spreads (guide §2: partition counts derive from data size, not
from the local core count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def local_rows_df(spark, rows, schema) -> DataFrame:
    if not rows:
        return spark.createDataFrame([], schema)
    n_slices = min(
        len(rows) // 50_000 + 1, spark.sparkContext.defaultParallelism
    )
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n_slices), schema
    )
