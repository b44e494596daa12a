"""Capture .explain("formatted") for the round-15 optimization
targets into plans/r15/<query>_<tag>.txt (tag = before/after).

Usage: python tools/capture_plans_r15.py <tag> [query ...]
Defaults to the declared queries the optimization round touches.
Plans are captured pre-execution (AQE initial plan) — the same form
tools/plan_audit.py audits, so before/after diffs are like-for-like.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "bm25_join",
    "bm25_join_rm3",
    "retrieval_rerank",
    "retrieval_rerank_mmr",
    "hybrid_join",
    "bm25_join_indexed",
    "bm25_join_rm3_indexed",
    "bm25_join_prf_indexed",
    "dedup_clusters",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    from spark_sorted_spark.queries import QUERIES
    from spark_sorted_spark.session import get_spark

    spark = get_spark("plans_r15")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r15",
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = QUERIES[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange mentions)")


if __name__ == "__main__":
    main()
