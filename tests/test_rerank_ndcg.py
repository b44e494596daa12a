"""Rerank-quality floors (VERDICT r13 item 7): the graded-relevance
fixture in tools/rerank_ndcg.py measures the ranking usefulness of
`default_cross_scorer` — previously asserted only by construction —
the way tools/ann_recall.py pins ANN recall. Full numbers in PARITY.md
"Rerank quality (round 14)".

The fixture plants ONE realistic first-stage mistake (a
keyword-stuffed near-dup outranking the exact hit once long
distractors inflate avgdl and weaken BM25's length norm) that
distinct-token overlap cannot fix (it ties and falls back to the
first-stage order) but the default scorer's containment term can.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import rerank_ndcg  # noqa: E402


def test_default_cross_scorer_ndcg_beats_overlap_and_first_stage(spark):
    res = rerank_ndcg.measure(spark)
    first = res["first_stage_bm25"]
    ov = res["rerank_overlap"]
    ce = res["rerank_cross_encoder_default"]
    # the planted mistake: the first stage is measurably imperfect
    assert first < 0.99, first
    # overlap ties diluted/exact and inherits the first-stage order —
    # its documented refinement contract, pinned as equality
    assert abs(ov - first) < 1e-12, (ov, first)
    # the default scorer's containment term fixes the tie: near-perfect
    # order on this fixture, strictly better than both. The floors pin
    # the CLAIM (a wide margin over the first stage), not the round-14
    # measured constants (ADVICE r14: an exact ce == 1.0 and the
    # 0.82-0.87 first-stage band would trip on any benign BM25
    # constant or tokenizer tweak even while the ordering holds; the
    # measured values — first 0.843, ce 1.000 — live in PARITY.md)
    assert ce > ov + 0.1, (ce, ov)
    assert ce >= 0.95, ce
