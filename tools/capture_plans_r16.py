"""Capture .explain("formatted") for the round-16 optimization
targets into plans/r16/<query>_<tag>.txt (tag = before/after).

Usage: python tools/capture_plans_r16.py <tag> [query ...]
Defaults to the declared queries this optimization round touches.
Plans are captured pre-execution (AQE initial plan) — the same form
tools/plan_audit.py audits, so before/after diffs are like-for-like.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    # driver-side idf (ln_libm ArrowEvalPython removal)
    "bm25_topk",
    "bm25_join",
    "bm25_topk_indexed",
    "bm25_join_indexed",
    "bm25_join_rm3",
    "bm25_join_rm3_indexed",
    "bm25_join_prf_indexed",
    "retrieval_eval",
    # verify_scope resolution from the base docs scan
    "pipeline_clean_corpus",
    # int64-hashed verify sets
    "dedup_minhash_lsh",
    "dedup_jaccard_prefix",
    "decontaminate_exact",
    # connected-components symmetrize-once (eagerly executed —
    # the static plan only shows the checkpoint tail; kept for the
    # record anyway)
    "dedup_clusters",
]


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:] or DEFAULT
    from spark_sorted_spark.queries import QUERIES
    from spark_sorted_spark.session import get_spark

    spark = get_spark("plans_r16")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r16",
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
