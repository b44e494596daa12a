"""AQE skew-join adjudication probe (round 9; PARITY.md "Round 9
delta" item 4): does Spark's ``OptimizeSkewedJoin`` rescue a hot
prefix shingle in the lossless Jaccard joins?

Three measurements, all in one session with aggressive skew settings
(threshold 8k, advisory 4k, factor 2, broadcast disabled so the join
stays the SMJ it is at scale):

1. a minimal skewed SMJ (one 50k-row hot key vs a uniform build side)
   — CONTROL: the splitter works at all on this build;
2. ``jaccard_prefix_pairs`` over a corpus with an identical-document
   hot group — the SELF-join case: hot partitions are skewed on BOTH
   sides in the SAME partitions, a shape ``OptimizeSkewedJoin``
   structurally skips;
3. ``jaccard_prefix_join`` with a one-sided hot corpus bucket — the
   R-S case.

Round-9 result on this build: (1) splits (``skew=true`` in the final
plan), (2) and (3) do NOT — hence the explicit lossless block-salt in
``functions/dedup.py`` (self-join: sampled-probe-gated hot path; R-S:
always-on benchmark-side replication).

Usage: python tools/skew_probe.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def final_plan(df) -> str:
    df.collect()  # the SAME DataFrame's execution materializes AQE's final plan
    return df._jdf.queryExecution().executedPlan().toString()


def main():
    from spark_sorted_spark.functions.dedup import (
        jaccard_prefix_join,
        jaccard_prefix_pairs,
    )
    from spark_sorted_spark.session import get_spark

    spark = get_spark("skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    for k, v in {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8k",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
    }.items():
        spark.conf.set(k, v)

    rows = []

    # 1. control: minimal skewed SMJ
    left = spark.range(100_000).select(
        F.when(F.col("id") < 50_000, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(2_000).select(
        (F.col("id") % 1000).alias("k"), F.col("id").alias("w")
    )
    plan = final_plan(left.join(right, "k").select(F.sum("v").alias("s")))
    rows.append(("minimal skewed SMJ (control)", "skew=true" in plan))

    # 2. self-join: identical-document hot group (both-sides skew)
    hot = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [(i, hot) for i in range(600)]
        + [
            (10_000 + i, f"unique doc {i} says {i * 13} and {i * 7} plus {i * 3}")
            for i in range(800)
        ],
        ["doc_id", "text"],
    )
    # salt OFF so the probe measures what AQE does to the PLAIN join
    plan = final_plan(jaccard_prefix_pairs(docs, hot_shingle_rows=None))
    rows.append(("jaccard_prefix_pairs self-join (salt off)", "skew=true" in plan))

    # 3. R-S: one-sided hot corpus bucket
    lrows = [(i, hot) for i in range(3000)] + [
        (10_000 + i, f"left doc {i} says {i * 13} words {i * 7}") for i in range(500)
    ]
    rrows = [(100_000 + i, hot + f" tail {i}") for i in range(20)] + [
        (200_000 + i, f"right doc {i} has {i * 11} tokens {i * 5}")
        for i in range(300)
    ]
    plan = final_plan(
        jaccard_prefix_join(
            spark.createDataFrame(lrows, ["doc_id", "text"]),
            spark.createDataFrame(rrows, ["doc_id", "text"]),
            tau_num=1,
            tau_den=5,
            hot_salt=1,
        )
    )
    rows.append(("jaccard_prefix_join R-S (salt off)", "skew=true" in plan))

    print("| probe | AQE skew split engaged |")
    print("|---|---|")
    for name, engaged in rows:
        print(f"| {name} | {'YES' if engaged else 'no'} |")
    if rows[0][1] and not (rows[1][1] or rows[2][1]):
        print(
            "\nAdjudication: the splitter works in general but does NOT "
            "engage on the prefix candidate joins — the explicit "
            "block-salt in functions/dedup.py is required."
        )


if __name__ == "__main__":
    main()
