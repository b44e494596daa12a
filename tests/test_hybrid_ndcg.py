"""Hybrid-quality floors (VERDICT r14 item 7): the two-modality
graded fixture in tools/hybrid_ndcg.py measures the RRF fusion's
end-to-end ranking usefulness — previously asserted by construction
only — the way tools/rerank_ndcg.py pins rerank quality. Measured
values (bm25 0.8557, dense 0.8557, hybrid 1.0000) live in PARITY.md;
per the r14 ADVICE lesson the assertions pin the CLAIMS (each single
arm is measurably imperfect because it misses one grade-2 modality;
fusion is near-perfect and strictly better than both), not the
constants.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import hybrid_ndcg  # noqa: E402


def test_hybrid_rrf_ndcg_beats_both_single_arms(spark):
    res = hybrid_ndcg.measure(spark)
    lex, dense, fused = (
        res["bm25_only"],
        res["dense_only"],
        res["hybrid_rrf"],
    )
    # each single arm misses one grade-2 doc entirely (the paraphrase
    # for BM25, the lexical match for the dense arm): measurably
    # imperfect
    assert lex < 0.99, lex
    assert dense < 0.99, dense
    # the fixture is modality-symmetric, so the two arms fail equally
    assert abs(lex - dense) < 1e-12, (lex, dense)
    # RRF surfaces both grade-2 docs above the junk each arm was
    # forced to admit: near-perfect and strictly better by a wide
    # margin
    assert fused > lex + 0.1, (fused, lex)
    assert fused >= 0.95, fused
