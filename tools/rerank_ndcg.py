"""Measure rerank QUALITY (nDCG@5) on a graded-relevance fixture —
the ranking-usefulness number for the two second-stage rerankers
(VERDICT r13 item 7: `default_cross_scorer` made rerank_cross_encoder
runnable end-to-end in round 13, but its usefulness was asserted only
by construction; the ann_recall.py precedent says measure it).

The fixture is deterministic (no RNG): 10 queries, each with a
per-query token vocabulary so cross-query contamination is zero, and
five graded documents per query:

* grade 3 — the exact duplicate of the query text;
* grade 2 — all query tokens, each repeated 5x, diluted with 20 noise
  tokens (relevant but imprecise);
* grade 1 — two of the four query tokens + 2 noise tokens;
* grade 0 — two long (150-token) pure-noise distractors. Their
  length inflates avgdl, which WEAKENS BM25's length normalization
  enough that the diluted doc's tf=5 saturation outscores the exact
  doc's tf=1 — the realistic first-stage mistake (keyword-stuffed
  near-dup outranks the precise hit) this fixture plants.

What the measurement separates:

* FIRST STAGE (bm25_join): ranks diluted (grade 2) ABOVE exact
  (grade 3) per the avgdl construction — measured nDCG < 1.
* rerank_overlap: distinct-token overlap TIES diluted and exact
  (both contain every query token) and the tie falls back to the
  wrong first-stage order — measured nDCG equals the first stage's
  (the documented refinement-not-coin-flip tiebreak inheriting the
  first-stage mistake).
* rerank_cross_encoder(default_cross_scorer): the containment term
  |q∩d|/|d| breaks exactly that tie toward the precise doc — the
  measured claim for the default scorer is
  nDCG(cross) > nDCG(overlap) = nDCG(first stage) on this fixture.

nDCG@5 per query = DCG@5 / ideal-DCG@5 with gains 2^grade - 1,
averaged over the 10 queries. Floors pinned in
tests/test_rerank_ndcg.py.

Usage: python tools/rerank_ndcg.py
Prints a markdown table (paste into PARITY.md) + one JSON line.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_QUERIES = 10
K = 5


def fixture(spark):
    """(queries, corpus, grades): graded-relevance rows with per-query
    disjoint vocabularies. grades maps (query_id, doc_id) -> grade."""
    queries, docs, grades = [], [], {}
    for i in range(N_QUERIES):
        qt = [f"alpha{i}", f"beta{i}", f"gamma{i}", f"delta{i}"]
        queries.append((i, " ".join(qt)))
        base = 100 * i
        # grade 3: exact duplicate
        docs.append((base + 1, " ".join(qt)))
        grades[(i, base + 1)] = 3
        # grade 2: all query tokens 5x + 20 distinct noise tokens
        diluted = [t for t in qt for _ in range(5)] + [
            f"noise{i}_{j}" for j in range(20)
        ]
        docs.append((base + 2, " ".join(diluted)))
        grades[(i, base + 2)] = 2
        # grade 1: two of the four query tokens + 2 noise tokens
        marginal = qt[:2] + [f"pad{i}_{j}" for j in range(2)]
        docs.append((base + 3, " ".join(marginal)))
        grades[(i, base + 3)] = 1
        # grade 0: two LONG pure-noise distractors — their 150-token
        # length inflates avgdl, weakening BM25's length norm so the
        # diluted doc's tf=5 outscores the exact doc's tf=1 (the
        # planted first-stage mistake)
        for j in (4, 5):
            docs.append(
                (base + j, " ".join(f"junk{i}_{j}_{m}" for m in range(150)))
            )
            grades[(i, base + j)] = 0
    qdf = spark.createDataFrame(queries, "query_id bigint, text string")
    ddf = spark.createDataFrame(docs, "doc_id bigint, text string")
    return qdf, ddf, grades


def _dcg(gains):
    return sum(g / math.log2(r + 2) for r, g in enumerate(gains))


def ndcg_at_k(ranked_ids, grades, query_id, k=K):
    gains = [
        (2 ** grades.get((query_id, d), 0)) - 1 for d in ranked_ids[:k]
    ]
    ideal = sorted(
        ((2**g) - 1 for (q, _d), g in grades.items() if q == query_id),
        reverse=True,
    )[:k]
    idcg = _dcg(ideal)
    return _dcg(gains) / idcg if idcg > 0 else 0.0


def mean_ndcg(
    rows, grades, rank_col="rank", id_attr="doc_id", k=K, n_queries=N_QUERIES
):
    """rows: collected (query_id, <id_attr>, ..., rank) rows. Shared
    with tools/hybrid_ndcg.py, whose dense arm ranks embedding rows
    (id_attr='vec_id') at its own k/n_queries."""
    per_q: dict = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append((r[rank_col], r[id_attr]))
    vals = []
    for q in range(n_queries):
        ranked = [d for _r, d in sorted(per_q.get(q, []))]
        vals.append(ndcg_at_k(ranked, grades, q, k=k))
    return sum(vals) / len(vals)


def measure(spark):
    from spark_sorted_spark.functions.retrieval import (
        bm25_join,
        rerank_cross_encoder,
        rerank_overlap,
    )

    qdf, ddf, grades = fixture(spark)
    first = bm25_join(ddf, qdf, k=8).cache()
    ov = rerank_overlap(first, ddf, qdf, k=K)
    ce = rerank_cross_encoder(first, ddf, qdf, k=K)
    return {
        "first_stage_bm25": mean_ndcg(first.collect(), grades),
        "rerank_overlap": mean_ndcg(ov.collect(), grades),
        "rerank_cross_encoder_default": mean_ndcg(ce.collect(), grades),
    }


def main():
    from spark_sorted_spark.session import get_spark

    spark = get_spark("rerank-ndcg")
    spark.sparkContext.setLogLevel("ERROR")
    res = measure(spark)
    print(f"| variant | mean nDCG@{K} ({N_QUERIES} graded queries) |")
    print("|---|---|")
    for name, v in res.items():
        print(f"| {name} | {v:.4f} |")
    print(json.dumps({"k": K, "n_queries": N_QUERIES, **res}))


if __name__ == "__main__":
    main()
