"""Measure HYBRID retrieval quality (nDCG@3) on a graded two-modality
fixture — the end-to-end usefulness number for the RRF fusion layer
(VERDICT r14 item 7: the fusion weights were asserted by construction
only; tools/rerank_ndcg.py is the precedent).

The fixture is deterministic (no RNG): 10 queries with per-query
disjoint token vocabularies AND per-query orthogonal embedding
subspaces (3 dedicated dimensions each), so cross-query contamination
is zero in both modalities. Five docs per query:

* grade 3 — the PRECISE HIT: exact text duplicate, embedding equal to
  the query vector. Both arms rank it #1.
* grade 2 — the PARAPHRASE: zero token overlap (BM25 cannot retrieve
  it at all), embedding at cos 0.8. Only the dense arm sees it.
* grade 2 — the LEXICAL MATCH: all four query tokens (+2 pads),
  embedding orthogonal (cos 0). Only the lexical arm sees it.
* grade 0 — lexical junk: one shared token + noise (BM25 rank 3),
  embedding at cos -1.
* grade 0 — dense junk: topically-adjacent embedding (cos 0.3, dense
  rank 3), pure-noise text.

With n_candidates=3, each single arm's top-3 is forced to include its
junk doc while MISSING the other modality's grade-2 doc — the
documented complementarity (BM25 catches exact-term matches
embeddings blur; embeddings catch paraphrases BM25 misses). RRF then
fuses to the perfect order: the precise hit leads (present in both
lists), the two grade-2 docs follow (one list each, same reciprocal),
junk drops (worse ranks). Measured claim:

    nDCG(hybrid RRF) > nDCG(BM25-only) = nDCG(dense-only)

nDCG@3 with gains 2^grade - 1, averaged over the 10 queries; floors
pinned in tests/test_hybrid_ndcg.py, numbers recorded in PARITY.md.

Usage: python tools/hybrid_ndcg.py
Prints a markdown table (paste into PARITY.md) + one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rerank_ndcg import mean_ndcg  # noqa: E402  (shared nDCG math)

N_QUERIES = 10
K = 3
N_CANDIDATES = 3
DIM = 3 * N_QUERIES


def _unit(i: int, scale: float = 1.0) -> list[float]:
    v = [0.0] * DIM
    v[i] = scale
    return v


def _mix(i: int, j: int, a: float, b: float) -> list[float]:
    v = [0.0] * DIM
    v[i], v[j] = a, b
    return v


def fixture(spark):
    """(queries, docs, embeddings, grades): two-modality graded rows.
    queries carry (query_id, text, query_vec) — the hybrid_join input
    shape; docs/embeddings share the id space."""
    queries, docs, vecs, grades = [], [], [], {}
    for i in range(N_QUERIES):
        qt = [f"alpha{i}", f"beta{i}", f"gamma{i}", f"delta{i}"]
        d = 3 * i
        queries.append((i, " ".join(qt), _unit(d)))
        base = 100 * i
        # grade 3: precise hit — exact text, embedding == query vector
        docs.append((base + 1, " ".join(qt)))
        vecs.append((base + 1, _unit(d)))
        grades[(i, base + 1)] = 3
        # grade 2: paraphrase — no token overlap, cos 0.8
        docs.append((base + 2, " ".join(f"para{i}_{j}" for j in range(4))))
        vecs.append((base + 2, _mix(d, d + 1, 0.8, 0.6)))
        grades[(i, base + 2)] = 2
        # grade 2: lexical match — all query tokens, orthogonal vector
        docs.append((base + 3, " ".join(qt + [f"pad{i}_0", f"pad{i}_1"])))
        vecs.append((base + 3, _unit(d + 2)))
        grades[(i, base + 3)] = 2
        # grade 0: lexical junk — one shared token, cos -1
        docs.append(
            (base + 4, " ".join([qt[0]] + [f"junk{i}_{j}" for j in range(5)]))
        )
        vecs.append((base + 4, _unit(d, -1.0)))
        grades[(i, base + 4)] = 0
        # grade 0: dense junk — pure-noise text, cos 0.3
        docs.append(
            (base + 5, " ".join(f"noise{i}_{j}" for j in range(6)))
        )
        vecs.append((base + 5, _mix(d, d + 1, 0.3, 0.954)))
        grades[(i, base + 5)] = 0
    qdf = spark.createDataFrame(
        queries, "query_id bigint, text string, query_vec array<double>"
    )
    ddf = spark.createDataFrame(docs, "doc_id bigint, text string")
    edf = spark.createDataFrame(
        vecs, "vec_id bigint, embedding array<double>"
    )
    return qdf, ddf, edf, grades


def _mean_ndcg(rows, grades, id_attr="doc_id"):
    return mean_ndcg(
        rows, grades, id_attr=id_attr, k=K, n_queries=N_QUERIES
    )


def measure(spark):
    from spark_sorted_spark.functions.retrieval import bm25_join, hybrid_join
    from spark_sorted_spark.functions.similarity import cosine_join

    qdf, ddf, edf, grades = fixture(spark)
    lex = bm25_join(ddf, qdf, k=K)
    dense = cosine_join(edf, qdf, k=K)
    fused = hybrid_join(
        ddf, edf, qdf, k=K, n_candidates=N_CANDIDATES
    )
    return {
        "bm25_only": _mean_ndcg(lex.collect(), grades),
        "dense_only": _mean_ndcg(dense.collect(), grades, id_attr="vec_id"),
        "hybrid_rrf": _mean_ndcg(fused.collect(), grades),
    }


def main():
    from spark_sorted_spark.session import get_spark

    spark = get_spark("hybrid-ndcg")
    spark.sparkContext.setLogLevel("ERROR")
    res = measure(spark)
    print(f"| variant | mean nDCG@{K} ({N_QUERIES} graded queries) |")
    print("|---|---|")
    for name, v in res.items():
        print(f"| {name} | {v:.4f} |")
    print(json.dumps({"k": K, "n_queries": N_QUERIES, **res}))


if __name__ == "__main__":
    main()
