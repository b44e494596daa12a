"""Measure MMR DIVERSITY value (subtopic recall@3) on a redundant
first-stage fixture — the end-to-end usefulness number for
`rerank_mmr` (the `tools/rerank_ndcg.py` / `tools/hybrid_ndcg.py`
precedent: quality claims get a measured fixture, not an assertion
by construction).

The fixture is deterministic (no RNG): 10 queries with per-query
disjoint token vocabularies, five docs per query covering THREE
subtopics:

* subtopic A, three near-identical docs — the exact query text, plus
  two one-pad variants. All four query terms match, so BM25 ranks
  them 1-3: the realistic scraped-corpus failure (boilerplate
  near-dups monopolize the top-k).
* subtopic B — two of the four query tokens + B-specific pads
  (first-stage rank 4).
* subtopic C — the other two query tokens + C-specific pads
  (first-stage rank 5).

Metric: subtopic recall@3 = |{subtopics present in the top 3}| / 3,
averaged over the 10 queries. The first stage's top-3 is the three A
near-dups (recall 1/3); greedy MMR at the DEFAULT lam=0.5 picks A1,
then B (rank 4 beats the A2 near-dup: .5*(1/4) - .5*(1/3) = -0.042
vs .5*(1/2) - .5*0.8 = -0.15), then C — recall 1.0. lam=1 reproduces
the first stage (the degeneracy sanity arm). Measured claim:

    recall(MMR lam=.5) = 1.0 > recall(first stage) = recall(lam=1) = 1/3

Floors pinned in tests/test_mmr_diversity.py, numbers recorded in
PARITY.md.

Usage: python tools/mmr_diversity.py
Prints a markdown table (paste into PARITY.md) + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_QUERIES = 10
K = 3


def fixture(spark):
    """(queries, docs, subtopic): per-query disjoint-vocab graded
    rows; subtopic maps doc_id -> 'A' | 'B' | 'C'."""
    queries, docs, subtopic = [], [], {}
    for i in range(N_QUERIES):
        qt = [f"alpha{i}", f"beta{i}", f"gamma{i}", f"delta{i}"]
        queries.append((i, " ".join(qt)))
        base = 100 * i
        # subtopic A: three near-dups of the query text (ranks 1-3)
        docs.append((base + 1, " ".join(qt)))
        docs.append((base + 2, " ".join(qt + [f"pad{i}_2"])))
        docs.append((base + 3, " ".join(qt + [f"pad{i}_3"])))
        for j in (1, 2, 3):
            subtopic[base + j] = "A"
        # subtopic B: two query tokens + B pads (rank 4)
        docs.append((base + 4, " ".join(qt[:2] + [f"b{i}_0", f"b{i}_1"])))
        subtopic[base + 4] = "B"
        # subtopic C: the other two query tokens + C pads (rank 5)
        docs.append((base + 5, " ".join(qt[2:] + [f"c{i}_0", f"c{i}_1"])))
        subtopic[base + 5] = "C"
    qdf = spark.createDataFrame(queries, "query_id bigint, text string")
    ddf = spark.createDataFrame(docs, "doc_id bigint, text string")
    return qdf, ddf, subtopic


def subtopic_recall(rows, subtopic, rank_col="rank", k=K):
    """Mean over queries of |{subtopics in the top k}| / 3."""
    per_q: dict = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append((r[rank_col], r.doc_id))
    vals = []
    for q in range(N_QUERIES):
        top = [d for _r, d in sorted(per_q.get(q, []))][:k]
        vals.append(len({subtopic[d] for d in top}) / 3.0)
    return sum(vals) / len(vals)


def measure(spark):
    from spark_sorted_spark.functions.retrieval import bm25_join, rerank_mmr

    qdf, ddf, subtopic = fixture(spark)
    first = bm25_join(ddf, qdf, k=5).cache()
    mmr = rerank_mmr(first, ddf, k=K, lam=0.5)
    mmr_lam1 = rerank_mmr(first, ddf, k=K, lam=1.0)
    return {
        "first_stage_bm25": subtopic_recall(first.collect(), subtopic),
        "mmr_lam1_sanity": subtopic_recall(
            mmr_lam1.collect(), subtopic, rank_col="mmr_rank"
        ),
        "mmr_default_lam05": subtopic_recall(
            mmr.collect(), subtopic, rank_col="mmr_rank"
        ),
    }


def main():
    from spark_sorted_spark.session import get_spark

    spark = get_spark("mmr-diversity")
    spark.sparkContext.setLogLevel("ERROR")
    res = measure(spark)
    print(f"| variant | mean subtopic recall@{K} ({N_QUERIES} queries) |")
    print("|---|---|")
    for name, v in res.items():
        print(f"| {name} | {v:.4f} |")
    print(json.dumps({"k": K, "n_queries": N_QUERIES, **res}))


if __name__ == "__main__":
    main()
