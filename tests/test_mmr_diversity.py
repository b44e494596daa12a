"""MMR diversity floors: the redundant-first-stage fixture in
tools/mmr_diversity.py measures rerank_mmr's end-to-end coverage
value — the way tools/rerank_ndcg.py and tools/hybrid_ndcg.py pin
the other two quality claims. Measured values (first stage 0.3333,
lam=1 sanity 0.3333, default lam=0.5 1.0000) live in PARITY.md; per
the r14 ADVICE lesson the assertions pin the CLAIMS (the near-dup
first stage covers measurably few subtopics; the lam=1 arm inherits
it exactly; default-lam MMR covers nearly all of them and strictly
improves), not the constants.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

import mmr_diversity  # noqa: E402


def test_mmr_default_lam_lifts_subtopic_recall(spark):
    res = mmr_diversity.measure(spark)
    first, lam1, mmr = (
        res["first_stage_bm25"],
        res["mmr_lam1_sanity"],
        res["mmr_default_lam05"],
    )
    # the three A near-dups monopolize the first-stage top-3:
    # measurably low coverage
    assert first < 0.5, first
    # lam=1 is the documented degeneracy: exactly the first stage
    assert abs(lam1 - first) < 1e-12, (lam1, first)
    # default-lam MMR trades the two redundant near-dups for the B/C
    # subtopics: near-total coverage, strictly better by a wide margin
    assert mmr > first + 0.3, (mmr, first)
    assert mmr >= 0.95, mmr
