"""Transcendentals that match the DuckDB oracle bit-for-bit.

Measured on this host (600k uniform args over (1e-6, 5000)): the
JVM's ``Math.log`` behind Spark's ``F.log`` disagrees with glibc libm
in the last ULP on **~4.4%** of arguments, and numpy's SIMD ``np.log``
on ~22% — while Python's ``math.log`` and DuckDB's ``ln`` (both the
same glibc libm) agreed on 100k/100k. Every engine is within 1 ULP of
the true value; they just round differently, so a Spark-side ``F.log``
feeding an exact-compare oracle is a coin-flip per distinct argument
(the round-10 audit caught ``unigram_logprob`` passing nine rounds of
gates on exactly that luck).

``ln_libm`` evaluates ln through Python's ``math.log`` — an
Arrow-batched pandas UDF. THE RULE: apply it to BOUNDED AGGREGATE
relations only (a vocabulary's count table, a query's idf terms, a
bucketed LM's log-ratios), never to the raw occurrence stream — the
per-row hot path stays JVM-side and the Python pass touches the few
thousand rows the aggregate produced. The one sanctioned per-row use
is ``gumbel_libm`` over ONE narrow post-aggregation column (a
selection key at one row per document, after the fold), where the
alternative — JVM log — would make the sampled row set
engine-dependent.

Portability note: "exact vs the oracle" means *this host's* libm on
both sides. A cross-machine deployment pins determinism machine-to-
itself (glibc's log has been stable across recent releases, but the
contract worth documenting is same-libm, not same-planet).
``tools/libm_fingerprint.py`` records this host's ln digest over a
hostile-argument sample in ``LIBM_FINGERPRINT.json`` — run it with
``--check`` on any other machine BEFORE trusting oracle artifacts
generated here (a mismatch means regenerate locally, not chase
per-query hash noise).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F  # noqa: F401  (re-export convenience)

__all__ = ["ln_libm", "gumbel_libm"]


def ln_libm(col: Column) -> Column:
    """``ln(col)`` via Python ``math.log`` (glibc libm — bitwise the
    oracle's ``ln``). Nulls pass through; non-positive values raise
    (a silent NaN would corrupt downstream folds)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ln(s: pd.Series) -> pd.Series:
        return pd.Series(
            [None if pd.isna(v) else math.log(v) for v in s],
            index=s.index,
            dtype="float64",
        )

    return _ln(col)


def gumbel_libm(u: Column) -> Column:
    """Standard Gumbel draw ``-ln(-ln(u))`` from a uniform ``u`` in
    (0, 1), both ``ln`` through libm in ONE Arrow pass — the
    derandomized Gumbel-max key used by :func:`...sampling.dsir_select`
    (the oracle replays it as ``-ln(-ln(u))`` with DuckDB's ln; the
    double negations are exact, so the composition matches bitwise)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _g(s: pd.Series) -> pd.Series:
        return pd.Series(
            [None if pd.isna(v) else -math.log(-math.log(v)) for v in s],
            index=s.index,
            dtype="float64",
        )

    return _g(u)
