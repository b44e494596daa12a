"""Lexical retrieval: BM25 top-k over a document corpus.

The lexical complement to the embedding ANN surface
(``functions/similarity.py``): the classic sparse-retrieval scorer
(Robertson & Zaragoza 2009, "The Probabilistic Relevance Framework:
BM25 and Beyond") as ONE relational job — no inverted-index service,
the index IS the relational algebra:

    score(d, q) = sum_t idf(t) * tf(t,d) * (k1 + 1)
                  / (tf(t,d) + k1 * (1 - b + b * dl(d) / avgdl))
    idf(t)      = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))

Scale shape (the 100 TB argument):

* the exploded token stream is FILTERED to the query's terms
  immediately after the explode — the per-term postings are built for
  the handful of query terms only, never for the vocabulary;
* ``df(t)`` is a |terms|-row aggregate and joins back by broadcast;
* ``N``/``sum(dl)`` are one column-pruned 2-scalar aggregate
  (bounded-metadata collect, the repo-wide pattern);
* the final top-k is ``ORDER BY score DESC LIMIT k`` — Catalyst
  compiles it to TakeOrderedAndProject (per-partition top-k + driver
  merge of k-row heaps), never a global sort materialization.

Float discipline: the idf's ``ln`` is evaluated on the |terms|-row
df table through ``exactmath.ln_libm`` (bitwise the oracle's libm —
JVM ``F.log`` rounds differently on ~4.4% of arguments); every other
per-(doc, term) operation is a fixed-shape IEEE double expression
over EXACT integers (tf, dl, df, N — avgdl enters as the exact
integer pair sum_dl/N, divided inside the expression); and the
per-document sum folds contributions in STRICT ascending-term order
(array_sort + F.aggregate) — so the DuckDB oracle replays the floats
bit-for-bit, same as the cosine and ln folds elsewhere in the repo.
"""

from __future__ import annotations

import re as _re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .local_rows import local_rows_df as _local_rows_df
from .text import tokens

# Driver-side bitwise twin of text.tokens() (= F.split(F.trim(c),
# r"\s+")): Spark's trim strips 0x20 only, and Java's \s is the ASCII
# class [ \t\n\x0B\f\r] (no unicode spaces) with limit=-1 keeping
# leading/trailing empty strings — Python's str.split() differs on all
# three, so the batch forms that enumerate query terms driver-side use
# THIS to reproduce the relational explode(tokens(...)) exactly
# (pinned against the relational form in tests/test_retrieval.py).
_JAVA_WS_RE = _re.compile(r"[ \t\n\x0B\f\r]+")


def _tokens_py(text: str) -> list[str]:
    return _JAVA_WS_RE.split(text.strip(" "))



__all__ = [
    "rerank_overlap",
    "rerank_cross_encoder",
    "bm25_topk",
    "bm25_topk_prf",
    "bm25_topk_rm3",
    "rm3_expand",
    "expand_query_prf",
    "bm25_join",
    "bm25_join_prf",
    "bm25_join_rm3",
    "hybrid_topk",
    "hybrid_topk_indexed",
    "hybrid_join",
    "hybrid_join_indexed",
    "build_bm25_index",
    "append_to_bm25_index",
    "compact_bm25_index",
    "bm25_index_stats",
    "bm25_topk_indexed",
    "bm25_join_indexed",
    "bm25_topk_prf_indexed",
    "bm25_topk_rm3_indexed",
    "bm25_join_prf_indexed",
    "bm25_join_rm3_indexed",
    "retrieval_metrics",
    "retrieval_metrics_summary",
]


def bm25_topk(
    df: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    stats: tuple | None = None,
    where=None,
    weights: dict | None = None,
) -> DataFrame:
    """Top-``k`` documents by BM25 score for ``query`` (whitespace
    tokenization, the corpus-wide ``tokens`` rule; duplicate query
    terms count once, the standard short-query form). Only documents
    matching at least one term can score — the returned relation is
    ``(id, score, n_terms_matched)``, score-descending with the id as
    the deterministic tiebreak.

    ``stats=(n_docs, sum_dl)`` lets pipeline callers who already
    scanned the corpus skip the second stats scan this definitional
    form otherwise pays (the values are exact integers, so a caller-
    supplied pair that matches the derived one is bitwise-neutral —
    pinned in tests); the persisted-index probes amortize it for
    everyone else.

    ``where`` (SQL string or Column over ``docs``'s metadata columns)
    is FILTERED retrieval: only qualifying documents can appear in
    the top-k, while idf/avgdl stay CORPUS-WIDE (the standard
    filtered-search contract — the filter restricts candidates, not
    the collection statistics; this is what makes the indexed twin's
    ``where`` bitwise-pinnable against this form).

    ``weights`` (``{term: w}``) is WEIGHTED-QUERY BM25: each term's
    contribution is scaled by its weight before the per-document fold
    (term boosting / RM3 expansion weights — see :func:`rm3_expand`).
    When given, the term set is the weight keys and ``query`` is
    ignored for term extraction. Weights enter as exact literals and
    multiply each contribution once, so the scoring stays
    oracle-replayable."""
    from .similarity import _apply_where

    weights = dict(weights) if weights else None
    if weights is not None:
        terms = sorted(weights)
        # not (w > 0) instead of w <= 0: NaN compares False BOTH ways,
        # so the naive form would let a NaN weight silently poison
        # every contribution (ADVICE r11)
        if any(not (w > 0) for w in weights.values()):
            raise ValueError("weights must be positive")
    else:
        terms = sorted(set(query.split()))
    if not terms:
        raise ValueError("query has no terms")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not (k1 > 0 and 0.0 <= b <= 1.0):
        raise ValueError(f"need k1 > 0 and 0 <= b <= 1, got k1={k1} b={b}")

    # one corpus scan for the postings: per-doc length + the doc's
    # occurrences of QUERY terms only (the filter sits directly on the
    # exploded stream — nothing vocabulary-sized is ever aggregated)
    toks = tokens(text_col)
    occ = (
        df.select(
            F.col(id_col),
            F.size(toks).alias("__dl"),
            F.explode(toks).alias("__tok"),
        )
        .filter(F.col("__tok").isin(terms))
    )
    tf = occ.groupBy(id_col, "__tok").agg(
        F.count(F.lit(1)).alias("__tf"), F.first("__dl").alias("__dl")
    )

    if stats is not None:
        n_docs, sum_dl = int(stats[0]), int(stats[1])
        if n_docs <= 0 or sum_dl < 0:
            raise ValueError(f"invalid precomputed stats {stats!r}")
    else:
        # corpus stats: bounded 2-scalar collect (column-pruned scan).
        # n_docs first — on an empty corpus sum_dl is NULL, so
        # converting it before the emptiness check would raise
        # TypeError (ADVICE r10)
        st = df.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.size(toks)).alias("sum_dl"),
        ).head()
        n_docs = int(st.n)
        if n_docs == 0:
            raise ValueError("corpus is empty")
        sum_dl = int(st.sum_dl)

    # per-term document frequency: |terms|-row relation, collected and
    # turned into a (term, idf) broadcast LITERAL. The idf's ln runs
    # driver-side through math.log — the same libm call the former
    # ln_libm pandas UDF made (bitwise; JVM F.log disagrees on ~4.4%
    # of arguments — functions/exactmath.py), so this removes the
    # ArrowEvalPython node and its broadcast-build job (round 16,
    # guide §4) without touching a single output bit. The df aggregate
    # is the same extra corpus pass Catalyst already planned for the
    # broadcast build (it prunes the tf aggregate differently, so the
    # exchange was never reused); bounded-collect: |terms| rows.
    dfrows = [
        (r[0], int(r[1]))
        for r in tf.groupBy("__tok").agg(F.count(F.lit(1)).alias("__df")).collect()
    ]
    df_t = _idf_literal(df.sparkSession, dfrows, n_docs, "__tok")

    # filtered retrieval: restrict CANDIDATES to qualifying docs
    # (semi-join against the filtered id set) AFTER df_t derived from
    # the unfiltered postings — collection statistics stay global,
    # matching the indexed probe's where (df comes from the dft store)
    if where is not None:
        tf = tf.join(
            _apply_where(df, where).select(id_col), id_col, "left_semi"
        )
    if weights is not None:
        # per-term boost rides the |terms|-row idf table; the weight
        # multiplies the WHOLE contribution (w * (idf * sat)) so the
        # unweighted expression — and every existing oracle — is
        # untouched when weights is None
        wdf = _local_rows_df(df.sparkSession,
            [(t, float(w)) for t, w in sorted(weights.items())],
            "__tok string, __w double",
        )
        df_t = df_t.join(F.broadcast(wdf), "__tok")
    base_c = (
        F.col("__idf")
        * (F.col("__tf") * F.lit(float(k1) + 1.0))
        / (
            F.col("__tf")
            + F.lit(float(k1))
            * (
                F.lit(1.0 - float(b))
                + F.lit(float(b))
                * F.col("__dl")
                / (F.lit(float(sum_dl)) / F.lit(float(n_docs)))
            )
        )
    )
    contrib = tf.join(F.broadcast(df_t), "__tok").select(
        F.col(id_col),
        F.col("__tok"),
        (base_c if weights is None else F.col("__w") * base_c).alias("__c"),
    )
    scored = (
        contrib.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms_matched"),
            F.array_sort(
                F.collect_list(F.struct("__tok", "__c"))
            ).alias("__cs"),
        )
        .select(
            id_col,
            F.aggregate(
                F.col("__cs"), F.lit(0.0), lambda acc, s: acc + s["__c"]
            ).alias("score"),
            "n_terms_matched",
        )
    )
    # TakeOrderedAndProject: per-partition top-k + driver k-heap merge
    return scored.orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    ).limit(int(k))


def _idf_literal(spark, df_rows, n_docs: int, tok_name: str):
    """(term, idf) literal relation from driver-side ``(term, df)``
    rows: ``idf = ln(1 + (N - df + 0.5) / (df + 0.5))`` evaluated with
    Python's ``math.log`` — the SAME glibc libm call ``ln_libm``'s
    pandas UDF made, on an argument computed in IEEE-754 doubles in
    the same operation order as the former Catalyst expression
    (``+ - /`` are exactly specified and ``df < 2^53`` casts exactly),
    so every idf is bitwise-identical to the ArrowEvalPython form this
    replaces. The round-16 point (guide §4): the df table is
    |terms|-row — workload-bounded — and the terms are already
    enumerated driver-side by every caller, so the Python-worker
    round trip (one ArrowEvalPython node + its broadcast build per
    retrieval pass) buys nothing; collect the tiny aggregate, do the
    ln on the driver, ship the result back as a broadcast literal."""
    import math

    n = float(n_docs)
    rows = [
        (
            t,
            math.log(1.0 + (((n - float(df)) + 0.5) / (float(df) + 0.5))),
        )
        for t, df in df_rows
    ]
    return _local_rows_df(spark, rows, f"{tok_name} string, __idf double")


def _corpus_stats(docs: DataFrame, text_col: str) -> tuple:
    """One bounded 2-scalar corpus-stats scan — EXACTLY the aggregate
    :func:`bm25_topk` derives internally (count + sum of tokenized
    lengths), factored out so two-pass wrappers pay it ONCE and thread
    it through both passes via the bitwise-neutral ``stats=`` contract
    (round-15: each pass otherwise re-tokenized the whole corpus for
    the same two integers — guide §1.4/§2.4)."""
    st = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(tokens(text_col))).alias("sum_dl"),
    ).head()
    n_docs = int(st.n)
    if n_docs == 0:
        raise ValueError("corpus is empty")
    return n_docs, int(st.sum_dl)


def expand_query_prf(
    docs: DataFrame,
    query: str,
    fb_docs: int = 3,
    fb_terms: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    where=None,
    stats: tuple | None = None,
) -> str:
    """Pseudo-relevance-feedback query expansion (the Rocchio/RM3
    family, binary term weights): run BM25 once, take the top
    ``fb_docs`` documents as pseudo-relevant, add the ``fb_terms``
    most frequent tokens of that feedback set (total occurrence count
    desc, token asc — deterministic, exact integers) that are not
    already query terms, and return the expanded query string
    (sorted unique terms — the set form every ``bm25_*`` entry point
    consumes). Recall tool, precision trade: expansion terms carry
    the same unit weight as originals (the binary simplification of
    RM3's weighted variant, documented trade).

    Scale shape: pass one is :func:`bm25_topk` (scale-safe top-k);
    the feedback ids are a bounded workload-sized collect; the term
    count is one explode over ``fb_docs`` documents ONLY (id-pruned
    scan), top-``fb_terms`` via TakeOrderedAndProject. ``where``
    scopes pass one AND the feedback docs (filtered retrieval's
    contract carries through)."""
    if fb_docs < 1:
        raise ValueError(f"fb_docs must be >= 1, got {fb_docs}")
    if fb_terms < 1:
        raise ValueError(f"fb_terms must be >= 1, got {fb_terms}")
    terms = sorted(set(query.split()))
    first = bm25_topk(
        docs, query, k=fb_docs, k1=k1, b=b,
        text_col=text_col, id_col=id_col, where=where, stats=stats,
    )
    # bounded-collect: fb_docs ids — the feedback set is k-sized by
    # construction (pass one's TakeOrdered output)
    fb_ids = [r[0] for r in first.select(id_col).collect()]
    if not fb_ids:
        return " ".join(terms)
    fb_counts = (
        docs.filter(F.col(id_col).isin(fb_ids))
        .select(F.explode(tokens(text_col)).alias("__tok"))
        .filter(~F.col("__tok").isin(terms))
        .groupBy("__tok")
        .agg(F.count(F.lit(1)).alias("__n"))
        .orderBy(F.col("__n").desc(), F.col("__tok").asc())
        .limit(int(fb_terms))
    )
    # bounded-collect: fb_terms rows (TakeOrdered output)
    new_terms = [r[0] for r in fb_counts.collect()]
    return " ".join(sorted(set(terms) | set(new_terms)))


def rm3_expand(
    docs: DataFrame,
    query: str,
    fb_docs: int = 3,
    fb_terms: int = 5,
    lam: float = 0.5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    where=None,
    stats: tuple | None = None,
) -> dict:
    """RM3 query expansion with WEIGHTS (Abdul-Jaleel et al., TREC
    2004 — the weighted upgrade of :func:`expand_query_prf`'s binary
    form): the relevance model's term mass is estimated from the
    top-``fb_docs`` feedback set, TRUNCATED to the kept vocabulary,
    renormalized over it (the standard RM3 truncate-then-renormalize
    step), and mixed with the original query's uniform model,

        w(t) = lam * 1[t in q]/|q|  +  (1-lam) * count_fb(t)/total_kept

    where the kept vocabulary is the union of the original terms and
    the ``fb_terms`` most frequent non-query feedback tokens, and
    ``total_kept`` sums the feedback counts of the KEPT terms only —
    so the feedback component always carries its full (1-lam) mass
    regardless of feedback-document length. Returns ``{term: weight}``
    for :func:`bm25_topk(weights=...)`. Every weight is a Python
    float built from exact integer counts by the same +*/ sequence a
    SQL replay performs, so the downstream scoring stays
    oracle-replayable. Same bounded-collect shape as the binary
    form (feedback ids and term counts are TakeOrdered outputs)."""
    if fb_docs < 1:
        raise ValueError(f"fb_docs must be >= 1, got {fb_docs}")
    if fb_terms < 1:
        raise ValueError(f"fb_terms must be >= 1, got {fb_terms}")
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    terms = sorted(set(query.split()))
    first = bm25_topk(
        docs, query, k=fb_docs, k1=k1, b=b,
        text_col=text_col, id_col=id_col, where=where, stats=stats,
    )
    # bounded-collect: fb_docs ids (pass one's TakeOrdered output)
    fb_ids = [r[0] for r in first.select(id_col).collect()]
    fb_counts: dict = {}
    if fb_ids:
        all_counts = (
            docs.filter(F.col(id_col).isin(fb_ids))
            .select(F.explode(tokens(text_col)).alias("__tok"))
            .groupBy("__tok")
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        keep = (
            all_counts.filter(~F.col("__tok").isin(terms))
            .orderBy(F.col("__n").desc(), F.col("__tok").asc())
            .limit(int(fb_terms))
            .unionByName(all_counts.filter(F.col("__tok").isin(terms)))
        )
        # bounded-collect: <= fb_terms + |q| count rows (TakeOrdered
        # union the query's own terms)
        fb_counts = {r[0]: int(r[1]) for r in keep.collect()}
    # renormalizer over the KEPT vocabulary only (RM3's truncate-then-
    # renormalize; ADVICE r11 — dividing by ALL feedback tokens would
    # dampen expansion as feedback documents get longer). Exact
    # integer sum of the already-collected kept counts — no extra scan.
    total_kept = sum(fb_counts.values())
    out: dict = {}
    nq = len(terms)
    for t in sorted(set(terms) | set(fb_counts)):
        w_orig = lam * (1.0 / nq) if t in terms else 0.0
        w_fb = (
            (1.0 - lam) * (fb_counts.get(t, 0) / total_kept)
            if total_kept
            else 0.0
        )
        w = w_orig + w_fb
        if w > 0:
            out[t] = w
    return out


def bm25_topk_rm3(
    docs: DataFrame,
    query: str,
    k: int = 10,
    fb_docs: int = 3,
    fb_terms: int = 5,
    lam: float = 0.5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    where=None,
) -> DataFrame:
    """Two-pass WEIGHTED relevance feedback: :func:`rm3_expand` then
    weighted-query :func:`bm25_topk` — the full RM3 composition
    (weights are exact-integer-derived literals, pinned against a
    DuckDB replay of both passes in tests). The corpus stats scan
    runs ONCE and threads through both passes (bitwise-neutral by the
    ``stats=`` contract)."""
    stats = _corpus_stats(docs, text_col)
    w = rm3_expand(
        docs, query, fb_docs=fb_docs, fb_terms=fb_terms, lam=lam,
        k1=k1, b=b, text_col=text_col, id_col=id_col, where=where,
        stats=stats,
    )
    return bm25_topk(
        docs, query, k=k, k1=k1, b=b, text_col=text_col,
        id_col=id_col, where=where, weights=w, stats=stats,
    )


def bm25_topk_prf(
    docs: DataFrame,
    query: str,
    k: int = 10,
    fb_docs: int = 3,
    fb_terms: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    where=None,
) -> DataFrame:
    """Two-pass BM25 with pseudo-relevance feedback: expand via
    :func:`expand_query_prf`, then score the expanded query with the
    ordinary :func:`bm25_topk` (same float discipline — the expansion
    layer is all exact-integer selection, so the whole composition
    stays oracle-replayable; pinned against a DuckDB replay in
    tests). The corpus stats scan runs ONCE and threads through both
    passes (bitwise-neutral by the ``stats=`` contract)."""
    stats = _corpus_stats(docs, text_col)
    expanded = expand_query_prf(
        docs, query, fb_docs=fb_docs, fb_terms=fb_terms, k1=k1, b=b,
        text_col=text_col, id_col=id_col, where=where, stats=stats,
    )
    return bm25_topk(
        docs, expanded, k=k, k1=k1, b=b,
        text_col=text_col, id_col=id_col, where=where, stats=stats,
    )


def bm25_join(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_text_col: str = "text",
    query_id_col: str = "query_id",
    stats: tuple | None = None,
    where=None,
    weights: DataFrame | None = None,
) -> DataFrame:
    """Batch BM25 retrieval — the R-S form of :func:`bm25_topk`: score
    EVERY query of ``queries`` against ``docs`` in one relational job
    and keep each query's top ``k`` (the shape of RAG candidate
    generation, lexical decontamination sweeps, and eval-set retrieval
    at corpus scale, where looping ``bm25_topk`` would re-scan the
    corpus per query). Duplicate terms within a query count once
    (same short-query form as bm25_topk).

    Returns ``(query_id, id, score, n_terms_matched, rank)`` with
    rank 1..k per query (score DESC, id tiebreak).

    Scale shape: the query batch is collected driver-side (bounded —
    the retrieval WORKLOAD, the same contract as
    :func:`bm25_join_indexed`, whose probe must enumerate it anyway)
    and the corpus explode is filtered against the literal batch
    vocabulary INSIDE the scan stage — the corpus is scanned once
    regardless of |queries|, with no vocabulary relation, no join and
    no distinct exchanges (round-15: the former relational form let
    the planner BROADCAST the corpus token stream — built by one
    single-threaded task — against the unestimatable vocabulary side;
    guide §2.4/§3.1). df(t) aggregates over matched postings only;
    idf's ln runs on that |terms|-row table via ln_libm; the per-term
    idf and (query, term) tables join back as explicit broadcasts.
    Per-query top-k is a window over the query partitioning —
    per-partition state is one query's candidates, spilled by
    WindowExec if a query matches half the corpus. A million-term
    query batch is the point where chunk-and-union (per-query
    independence makes it semantics-free) beats one literal IN-set.
    Floats: same discipline as bm25_topk (libm idf, fixed-shape
    contributions, strict (term)-ordered per-(query, doc) fold) — the
    DuckDB oracle replays bit-for-bit. ``stats=(n_docs, sum_dl)``
    skips the stats scan as in :func:`bm25_topk`; ``where`` is
    filtered retrieval with the same contract (candidates restricted,
    collection statistics corpus-wide).

    ``weights`` is WEIGHTED-QUERY batch BM25 — the R-S twin of
    :func:`bm25_topk(weights=...)`: a relation with columns
    ``(query_id_col, term, weight)`` giving each query its own
    weighted term set (per-query boosting / RM3 expansion weights,
    see :func:`bm25_join_rm3`), or — internal fast path for the
    feedback wrappers that already hold the rows driver-side — a
    plain list of ``(query_id, term, weight)`` tuples. When given,
    the per-query term sets come from the weights and ``queries``'
    text column is ignored for term extraction; each term's
    contribution is scaled ``w * (idf * saturation)`` —
    operand-for-operand the single-query weighted form, so per-query
    output equals looping ``bm25_topk(weights=w_q)`` bitwise
    (pinned). The relation is workload-bounded (|Q| x terms); weights
    must be positive and (query, term) pairs unique — validated
    driver-side on the collected workload (the indexed twin's
    contract)."""
    from pyspark.sql import Window

    from .exactmath import ln_libm
    from .similarity import _apply_where

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not (k1 > 0 and 0.0 <= b <= 1.0):
        raise ValueError(f"need k1 > 0 and 0 <= b <= 1, got k1={k1} b={b}")

    import math

    from pyspark.sql.types import (
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    from .dedup import spread_small_input

    spark = docs.sparkSession
    if weights is not None:
        if isinstance(weights, DataFrame):
            # bounded-collect: the weighted workload — it IS the
            # per-query term enumeration (the bm25_join_indexed
            # precedent); validation is free driver-side on the
            # already-collected rows. NaN compares False both ways
            # (`w <= 0` alone would pass it — ADVICE r11), hence the
            # explicit isnan.
            wsel = weights.select(
                F.col(query_id_col),
                F.col("term"),
                F.col("weight").cast("double"),
            )
            # bounded-collect: |Q| x terms weight rows (see above)
            wrows = [(r[0], r[1], r[2]) for r in wsel.collect()]
            qid_type = weights.schema[query_id_col].dataType
        else:
            # internal fast path (bm25_join_rm3 / bm25_join_prf): the
            # weight rows are already driver-side — same validation,
            # no round-trip through a relation
            wrows = [(q, t, float(w)) for q, t, w in weights]
            qid_type = queries.schema[query_id_col].dataType
        if not wrows:
            raise ValueError("weights relation is empty")
        if any(
            w is not None and (math.isnan(w) or w <= 0)
            for _, _, w in wrows
        ):
            raise ValueError("weights must be positive")
        # count_distinct semantics: NULL-containing pairs never count
        # as distinct, so any null (query, term) component trips the
        # duplicate check exactly like the old relational aggregate
        nd = len(
            {
                (q, t)
                for q, t, _ in wrows
                if q is not None and t is not None
            }
        )
        if nd != len(wrows):
            raise ValueError("duplicate (query, term) rows in weights")
        qterms = _local_rows_df(
            spark,
            wrows,
            StructType(
                [
                    StructField(query_id_col, qid_type),
                    StructField("__tok", StringType()),
                    StructField("__w", DoubleType()),
                ]
            ),
        )
        vocab_terms = sorted({t for _, t, _ in wrows if t is not None})
    else:
        # bounded-collect: the query batch texts — the retrieval
        # workload (the _collect_query_texts / bm25_join_indexed
        # precedent). Terms re-derive through _tokens_py, the bitwise
        # twin of the old relational explode(tokens(...)).distinct(),
        # so the (query, term) pairs — and every score downstream —
        # are unchanged.
        qrows = queries.select(
            F.col(query_id_col), F.col(query_text_col)
        ).collect()
        pairs = sorted(
            {
                (r[0], t)
                for r in qrows
                if r[1] is not None
                for t in _tokens_py(r[1])
            },
            key=lambda p: (repr(p[0]), p[1]),
        )
        qid_type = queries.schema[query_id_col].dataType
        qterms = _local_rows_df(
            spark,
            pairs,
            StructType(
                [
                    StructField(query_id_col, qid_type),
                    StructField("__tok", StringType()),
                ]
            ),
        )
        vocab_terms = sorted({t for _, t in pairs})

    # a small parquet corpus arrives as ONE scan partition, which
    # would serialize the tokenize+explode onto a single core (and
    # round 15 measured exactly that: the old plan broadcast the
    # whole corpus token stream built by one 5.5 s task); no-op at
    # corpus scale where splits >= cores
    docs = spread_small_input(docs)
    toks = tokens(text_col)
    # the vocabulary is a driver-side literal, so the explode is
    # filtered in the SAME codegen stage — no vocabulary relation, no
    # join, no distinct exchanges (guide §2.4), matching bm25_topk's
    # single-query shape
    tok_in_vocab = (
        F.col("__tok").isin(vocab_terms) if vocab_terms else F.lit(False)
    )
    occ = docs.select(
        F.col(id_col),
        F.size(toks).alias("__dl"),
        F.explode(toks).alias("__tok"),
    ).filter(tok_in_vocab)
    tf = occ.groupBy(id_col, "__tok").agg(
        F.count(F.lit(1)).alias("__tf"), F.first("__dl").alias("__dl")
    )

    if stats is not None:
        n_docs, sum_dl = int(stats[0]), int(stats[1])
        if n_docs <= 0 or sum_dl < 0:
            raise ValueError(f"invalid precomputed stats {stats!r}")
    else:
        # bounded-collect: two corpus scalars (count + total length);
        # n_docs checked before sum_dl conversion (NULL on empty)
        st = docs.select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.size(toks)).alias("sum_dl"),
        ).head()
        n_docs = int(st.n)
        if n_docs == 0:
            raise ValueError("corpus is empty")
        sum_dl = int(st.sum_dl)

    # (term, idf) broadcast literal via the driver-side libm ln —
    # bitwise the former ln_libm ArrowEvalPython form, minus the
    # Python-worker round trip and its broadcast-build corpus pass's
    # Arrow tail (see bm25_topk; round 16, guide §4). bounded-collect:
    # |batch vocabulary| rows.
    dfrows = [
        (r[0], int(r[1]))
        for r in tf.groupBy("__tok").agg(F.count(F.lit(1)).alias("__df")).collect()
    ]
    df_t = _idf_literal(spark, dfrows, n_docs, "__tok")

    # filtered retrieval: candidates only — df_t above is already
    # derived from the unfiltered postings (global statistics)
    if where is not None:
        tf = tf.join(
            _apply_where(docs, where).select(id_col), id_col, "left_semi"
        )
    base_c = (
        F.col("__idf")
        * (F.col("__tf") * F.lit(float(k1) + 1.0))
        / (
            F.col("__tf")
            + F.lit(float(k1))
            * (
                F.lit(1.0 - float(b))
                + F.lit(float(b))
                * F.col("__dl")
                / (F.lit(float(sum_dl)) / F.lit(float(n_docs)))
            )
        )
    )
    contrib = (
        tf.join(F.broadcast(df_t), "__tok")
        .join(F.broadcast(qterms), "__tok")
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.col("__tok"),
            # weighted form multiplies the WHOLE contribution once,
            # operand-for-operand bm25_topk's `__w * base_c`
            (base_c if weights is None else F.col("__w") * base_c).alias(
                "__c"
            ),
        )
    )
    scored = (
        contrib.groupBy(query_id_col, id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms_matched"),
            F.array_sort(
                F.collect_list(F.struct("__tok", "__c"))
            ).alias("__cs"),
        )
        .select(
            query_id_col,
            id_col,
            F.aggregate(
                F.col("__cs"), F.lit(0.0), lambda acc, s: acc + s["__c"]
            ).alias("score"),
            "n_terms_matched",
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def bm25_join_prf(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    fb_docs: int = 3,
    fb_terms: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_text_col: str = "text",
    query_id_col: str = "query_id",
    where=None,
) -> DataFrame:
    """Batch PRF retrieval — the R-S form of :func:`bm25_topk_prf`:
    expand EVERY query of the batch from its own top-``fb_docs``
    feedback documents, then rescore the expanded batch, with each
    corpus pass shared across the whole batch (pass one is ONE
    :func:`bm25_join`; the feedback term counts are one scan of the
    union of all queries' feedback docs, grouped per query; pass two
    is one :func:`bm25_join` over the expanded texts). Per-query
    output is IDENTICAL to looping :func:`bm25_topk_prf` (pinned —
    same selection rule: occurrence count desc, token asc, own terms
    excluded, binary weights).

    Driver traffic is workload-bounded only: the query texts, the
    |Q| x fb_docs feedback pairs, and the |Q| x fb_terms expansion
    terms (all TakeOrdered/window outputs).

    |Q| ceiling: PRF is the one batch op that re-materializes the
    EXPANDED query texts driver-side, so the practical bound is
    |Q| x (fb_docs + fb_terms + |query| in tokens) strings — 10^5
    queries at the defaults is tens of MB, fine; millions of queries
    should chunk the batch (outputs are per-query independent, so
    chunk-and-union is semantics-free)."""
    from pyspark.sql import Window
    from pyspark.sql.types import StringType, StructField, StructType

    if fb_docs < 1:
        raise ValueError(f"fb_docs must be >= 1, got {fb_docs}")
    if fb_terms < 1:
        raise ValueError(f"fb_terms must be >= 1, got {fb_terms}")
    spark = docs.sparkSession
    # bounded-collect: the query batch texts — the retrieval workload
    qrows = queries.select(F.col(query_id_col), F.col(query_text_col)).collect()
    if not qrows:
        raise ValueError("query batch is empty")
    qid_type = queries.schema[query_id_col].dataType
    # the documented contract is "identical to looping bm25_topk_prf":
    # a duplicate id would silently collapse two queries into one dict
    # slot, and a NULL text would stringify to the literal token
    # 'None' — both must fail loudly instead (ADVICE r11), matching
    # bm25_topk's own "query has no terms" validation
    if len({r[0] for r in qrows}) != len(qrows):
        raise ValueError("duplicate query ids in the batch")
    for r in qrows:
        if r[1] is None or not r[1].split():
            raise ValueError(f"query {r[0]!r} has no terms")
    orig = {r[0]: sorted(set(r[1].split())) for r in qrows}
    # corpus stats computed ONCE and shared by both passes (the
    # documented bitwise-neutral stats= fast path — exact integers, so
    # pass two equals a fresh derivation; saves one full-corpus
    # tokenize+aggregate per call)
    st = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(tokens(text_col))).alias("sum_dl"),
    ).head()
    if int(st.n) == 0:
        raise ValueError("corpus is empty")
    stats = (int(st.n), int(st.sum_dl))
    first = bm25_join(
        docs, queries, k=fb_docs, k1=k1, b=b, text_col=text_col,
        id_col=id_col, query_text_col=query_text_col,
        query_id_col=query_id_col, where=where, stats=stats,
    )
    # bounded-collect: |Q| x fb_docs feedback pairs (pass one's
    # per-query top-k window output)
    fb_pairs = [(r[0], r[1]) for r in first.select(query_id_col, id_col).collect()]
    if fb_pairs:
        id_type = docs.schema[id_col].dataType
        pair_df = _local_rows_df(
            spark,
            fb_pairs,
            StructType(
                [
                    StructField(query_id_col, qid_type),
                    StructField(id_col, id_type),
                ]
            ),
        )
        fb_ids = sorted({p[1] for p in fb_pairs})
        orig_df = _local_rows_df(
            spark,
            [(q, t) for q, ts in orig.items() for t in ts],
            StructType(
                [
                    StructField(query_id_col, qid_type),
                    StructField("__tok", StringType()),
                ]
            ),
        )
        counts = (
            docs.filter(F.col(id_col).isin(fb_ids))
            .select(F.col(id_col), F.explode(tokens(text_col)).alias("__tok"))
            .join(F.broadcast(pair_df), id_col)
            .groupBy(query_id_col, "__tok")
            .agg(F.count(F.lit(1)).alias("__n"))
            .join(F.broadcast(orig_df), [query_id_col, "__tok"], "left_anti")
        )
        w = Window.partitionBy(query_id_col).orderBy(
            F.col("__n").desc(), F.col("__tok").asc()
        )
        top = counts.withColumn("__rn", F.row_number().over(w)).filter(
            F.col("__rn") <= int(fb_terms)
        )
        # bounded-collect: |Q| x fb_terms expansion terms
        new_terms: dict = {}
        for r in top.select(query_id_col, "__tok").collect():
            new_terms.setdefault(r[0], set()).add(r[1])
    else:
        new_terms = {}
    expanded = _local_rows_df(
        spark,
        [
            (q, " ".join(sorted(set(ts) | new_terms.get(q, set()))))
            for q, ts in orig.items()
        ],
        StructType(
            [
                StructField(query_id_col, qid_type),
                StructField(query_text_col, StringType()),
            ]
        ),
    )
    return bm25_join(
        docs, expanded, k=k, k1=k1, b=b, text_col=text_col,
        id_col=id_col, query_text_col=query_text_col,
        query_id_col=query_id_col, where=where, stats=stats,
    )


def bm25_join_rm3(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    fb_docs: int = 3,
    fb_terms: int = 5,
    lam: float = 0.5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_text_col: str = "text",
    query_id_col: str = "query_id",
    where=None,
) -> DataFrame:
    """Batch RM3 retrieval — the R-S form of :func:`bm25_topk_rm3`,
    completing the relevance-feedback matrix (binary PRF x weighted
    RM3, single x batch): every query's relevance-model weights are
    estimated from its OWN top-``fb_docs`` feedback set (pass one is
    ONE :func:`bm25_join`; the feedback term counts are one scan of
    the union of all queries' feedback docs, grouped per query), then
    the whole weighted batch rescores in one weighted
    :func:`bm25_join`. Per-query output is IDENTICAL to looping
    :func:`bm25_topk_rm3` (pinned — same truncate-then-renormalize
    weights over the kept vocabulary, same ``w * (idf * saturation)``
    scoring).

    Driver traffic is workload-bounded only: the query texts, the
    |Q| x fb_docs feedback pairs, and the |Q| x (fb_terms + |q|)
    kept-term counts (TakeOrdered/window outputs). Same |Q| ceiling
    as :func:`bm25_join_prf` — millions of queries should chunk the
    batch (per-query independence makes chunk-and-union
    semantics-free)."""
    from pyspark.sql import Window
    from pyspark.sql.types import (
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    if fb_docs < 1:
        raise ValueError(f"fb_docs must be >= 1, got {fb_docs}")
    if fb_terms < 1:
        raise ValueError(f"fb_terms must be >= 1, got {fb_terms}")
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    spark = docs.sparkSession
    # bounded-collect: the query batch texts — the retrieval workload
    qrows = queries.select(F.col(query_id_col), F.col(query_text_col)).collect()
    if not qrows:
        raise ValueError("query batch is empty")
    qid_type = queries.schema[query_id_col].dataType
    # same loud validation as bm25_join_prf (ADVICE r11): duplicates
    # collapse dict slots, NULL text stringifies to 'None'
    if len({r[0] for r in qrows}) != len(qrows):
        raise ValueError("duplicate query ids in the batch")
    for r in qrows:
        if r[1] is None or not r[1].split():
            raise ValueError(f"query {r[0]!r} has no terms")
    orig = {r[0]: sorted(set(r[1].split())) for r in qrows}
    # corpus stats computed ONCE and shared by both passes (the
    # documented bitwise-neutral stats= fast path; saves one
    # full-corpus tokenize+aggregate per call)
    st = docs.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.size(tokens(text_col))).alias("sum_dl"),
    ).head()
    if int(st.n) == 0:
        raise ValueError("corpus is empty")
    stats = (int(st.n), int(st.sum_dl))
    first = bm25_join(
        docs, queries, k=fb_docs, k1=k1, b=b, text_col=text_col,
        id_col=id_col, query_text_col=query_text_col,
        query_id_col=query_id_col, where=where, stats=stats,
    )
    # bounded-collect: |Q| x fb_docs feedback pairs (pass one's
    # per-query top-k window output)
    fb_pairs = [(r[0], r[1]) for r in first.select(query_id_col, id_col).collect()]
    fb_counts: dict = {q: {} for q in orig}
    if fb_pairs:
        id_type = docs.schema[id_col].dataType
        pair_df = _local_rows_df(
            spark,
            fb_pairs,
            StructType(
                [
                    StructField(query_id_col, qid_type),
                    StructField(id_col, id_type),
                ]
            ),
        )
        fb_ids = sorted({p[1] for p in fb_pairs})
        orig_df = _local_rows_df(
            spark,
            [(q, t) for q, ts in orig.items() for t in ts],
            StructType(
                [
                    StructField(query_id_col, qid_type),
                    StructField("__tok", StringType()),
                ]
            ),
        )
        counts = (
            docs.filter(F.col(id_col).isin(fb_ids))
            .select(F.col(id_col), F.explode(tokens(text_col)).alias("__tok"))
            .join(F.broadcast(pair_df), id_col)
            .groupBy(query_id_col, "__tok")
            .agg(F.count(F.lit(1)).alias("__n"))
        )
        # kept vocabulary per query: the fb_terms most frequent
        # NON-query feedback tokens (count DESC, tok ASC) ...
        w = Window.partitionBy(query_id_col).orderBy(
            F.col("__n").desc(), F.col("__tok").asc()
        )
        top = (
            counts.join(
                F.broadcast(orig_df), [query_id_col, "__tok"], "left_anti"
            )
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= int(fb_terms))
            .select(query_id_col, "__tok", "__n")
        )
        # ... plus the query's OWN terms present in its feedback set
        own = counts.join(
            F.broadcast(orig_df), [query_id_col, "__tok"], "left_semi"
        ).select(query_id_col, "__tok", "__n")
        # bounded-collect: <= |Q| x (fb_terms + |q|) kept-count rows
        for r in top.unionByName(own).collect():
            fb_counts[r[0]][r[1]] = int(r[2])
    # weights driver-side: exact integer counts through the same
    # truncate-then-renormalize +*/ sequence as rm3_expand
    wrows = []
    for q, ts in orig.items():
        counts_q = fb_counts.get(q, {})
        total_kept = sum(counts_q.values())
        nq = len(ts)
        for t in sorted(set(ts) | set(counts_q)):
            w_orig = lam * (1.0 / nq) if t in ts else 0.0
            w_fb = (
                (1.0 - lam) * (counts_q.get(t, 0) / total_kept)
                if total_kept
                else 0.0
            )
            wv = w_orig + w_fb
            if wv > 0:
                wrows.append((q, t, wv))
    # weight rows are already driver-side — bm25_join's internal list
    # fast path skips the createDataFrame -> re-collect round-trip
    return bm25_join(
        docs, queries, k=k, k1=k1, b=b, text_col=text_col,
        id_col=id_col, query_text_col=query_text_col,
        query_id_col=query_id_col, where=where, weights=wrows,
        stats=stats,
    )


def rerank_overlap(
    candidates: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    text_col: str = "text",
    query_text_col: str = "text",
    rank_col: str = "rank",
) -> DataFrame:
    """Second-stage reranker over a first-stage candidate set — the
    retrieve-then-rerank serving pattern: ``candidates`` is any
    retriever's ``(query_id, id, ..., rank)`` output (BM25, hybrid,
    ANN — shape is all that matters), and this stage re-scores ONLY
    those |Q| x n_candidates pairs by distinct-token overlap
    ``|q_tokens ∩ d_tokens| / |q_tokens|``, returning
    ``(query_id, id, n_common, overlap, rank)`` with rank 1..k per
    query by (n_common DESC, first-stage rank ASC, id ASC) — the
    first-stage rank as tiebreak keeps the rerank a refinement, never
    a coin flip. Native Catalyst end to end (array_distinct /
    array_intersect), so the whole two-stage pipeline is
    SQL-replayable; the model-scored variant with identical plumbing
    is :func:`rerank_cross_encoder`.

    Scale shape: the expensive relation (corpus text) is touched ONLY
    for candidate ids — the broadcast candidate set joins into the
    corpus scan, so stage-two cost is |Q| x n_candidates regardless
    of corpus size; that asymmetry is the entire point of two-stage
    retrieval."""
    from pyspark.sql import Window

    from .text import tokens

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    cand = candidates.select(
        F.col(query_id_col),
        F.col(id_col),
        F.col(rank_col).alias("__rank1"),
    )
    # NULL text coalesces to the empty token set — without this,
    # size(NULL array) is -1 in Spark (a nonsense score the oracle's
    # len(NULL)=NULL would diverge from)
    empty = F.array().cast("array<string>")
    dd = corpus.select(
        F.col(id_col),
        F.coalesce(F.array_distinct(tokens(text_col)), empty).alias("__dt"),
    )
    dq = queries.select(
        F.col(query_id_col),
        F.coalesce(
            F.array_distinct(tokens(query_text_col)), empty
        ).alias("__qt"),
    )
    scored = (
        dd.join(F.broadcast(cand), id_col)
        .join(F.broadcast(dq), query_id_col)
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.size(F.array_intersect(F.col("__dt"), F.col("__qt"))).alias(
                "n_common"
            ),
            F.size(F.col("__qt")).alias("__nq"),
            F.col("__rank1"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("n_common").desc(), F.col("__rank1").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn(
            "overlap",
            # a query with NO tokens (NULL/blank text) defines
            # overlap as 0.0 — the 0/0 division would kill the job
            # under ANSI (the SQ8 zero-vector precedent)
            F.when(
                F.col("__nq") > 0,
                F.col("n_common").cast("double")
                / F.col("__nq").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "n_common", "overlap", "rank")
    )


def default_cross_scorer(q_texts, d_texts):
    """Deterministic model-free pair scorer — the shipped default for
    :func:`rerank_cross_encoder` (VERDICT r12 item 6), so the op runs
    end-to-end without an inference runtime while keeping ``scorer=``
    injection for real cross-encoders.

    Per pair, from whitespace-distinct token sets: overlap
    ``|q∩d|/|q|``, containment ``|q∩d|/|d|``, and the length ratio
    ``min(|q|,|d|)/max(|q|,|d|)``, combined through a FIXED logistic
    ``sigmoid(-2 + 3*overlap + 1.5*containment + 0.5*len_ratio)``.
    The weights are constants, not trained — the scorer is a
    deterministic heuristic standing where a model forward pass goes,
    strictly increasing in overlap/containment so planted duplicates
    rank first (pinned in tests, bitwise: pure float64 + libm exp).
    NULL text scores as the empty token set."""
    import math

    import pandas as pd

    out = []
    for q, d in zip(q_texts, d_texts):
        qt = set(q.split()) if isinstance(q, str) else set()
        dt = set(d.split()) if isinstance(d, str) else set()
        inter = len(qt & dt)
        ov = inter / len(qt) if qt else 0.0
        ct = inter / len(dt) if dt else 0.0
        lr = min(len(qt), len(dt)) / max(len(qt), len(dt)) if qt and dt else 0.0
        z = -2.0 + 3.0 * ov + 1.5 * ct + 0.5 * lr
        out.append(1.0 / (1.0 + math.exp(-z)))
    return pd.Series(out, dtype="float64")


def rerank_cross_encoder(
    candidates: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    scorer=None,
    k: int = 10,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    text_col: str = "text",
    query_text_col: str = "text",
    rank_col: str = "rank",
) -> DataFrame:
    """Model-scored second stage with the SAME plumbing as
    :func:`rerank_overlap`: the candidate (query, doc) TEXT pairs —
    |Q| x n_candidates rows, never the corpus — flow through
    ``mapInPandas`` in Arrow batches to ``scorer``, a callable
    ``(pandas.Series q_text, pandas.Series d_text) -> pandas.Series
    float`` (a cross-encoder forward pass in real deployments).
    Returns ``(query_id, id, score, rank)``, rank 1..k per query by
    (score DESC, first-stage rank ASC, id ASC).

    ``scorer=None`` uses :func:`default_cross_scorer` — a
    deterministic token-feature logistic, so the op is usable
    end-to-end in environments without an inference runtime; pass a
    real model's batch forward for production quality. The plumbing
    (pair join shape, Arrow batching, schema, deterministic final
    window) is identical either way and test-pinned."""
    from pyspark.sql.types import (
        DoubleType,
        StructField,
        StructType,
    )

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if scorer is None:
        scorer = default_cross_scorer
    from pyspark.sql import Window

    cand = candidates.select(
        F.col(query_id_col),
        F.col(id_col),
        F.col(rank_col).alias("__rank1"),
    )
    pairs = (
        corpus.select(F.col(id_col), F.col(text_col).alias("__dtext"))
        .join(F.broadcast(cand), id_col)
        .join(
            F.broadcast(
                queries.select(
                    F.col(query_id_col),
                    F.col(query_text_col).alias("__qtext"),
                )
            ),
            query_id_col,
        )
    )
    qid_f = pairs.schema[query_id_col]
    id_f = pairs.schema[id_col]
    r1_f = pairs.schema["__rank1"]
    out_schema = StructType(
        [
            StructField(query_id_col, qid_f.dataType),
            StructField(id_col, id_f.dataType),
            StructField("__rank1", r1_f.dataType),
            StructField("score", DoubleType()),
        ]
    )

    def run(batches):
        for pdf in batches:
            if len(pdf) == 0:
                # never hand an empty batch to the user's scorer (a
                # model forward pass on zero rows is a common crash)
                continue
            out = pdf[[query_id_col, id_col, "__rank1"]].copy()
            out["score"] = [
                float(x) for x in scorer(pdf["__qtext"], pdf["__dtext"])
            ]
            yield out

    scored = pairs.mapInPandas(run, schema=out_schema)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col("__rank1").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )


def rerank_mmr(
    candidates: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    lam: float = 0.5,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    text_col: str = "text",
    rank_col: str = "rank",
) -> DataFrame:
    """Diversity-aware second stage — Maximal Marginal Relevance
    (Carbonell & Goldstein, SIGIR 1998; public literature,
    independently implemented), the standard answer to a first stage
    that returns k near-copies of the same passage: after scraping,
    boilerplate near-dups dominate BM25/ANN top-k, and a RAG or
    training-data consumer wants COVERAGE of the result space, not
    five copies of one document. Greedy selection over each query's
    candidate set:

        pick_1 = the best first-stage rank
        pick_s = argmax  lam * (1 / rank1)
                       - (1 - lam) * max_{c in picked} jaccard(d, c)

    Relevance is the RECIPROCAL FIRST-STAGE RANK — the RRF convention
    this repo's hybrid fusion already uses, for the same reason:
    scale-free across BM25 / hybrid / ANN stage ones (whose score
    scales differ), and here additionally SCALE-MATCHED to the [0,1]
    Jaccard redundancy term, so ``lam=0.5`` genuinely balances the
    two. (A linear-in-rank relevance would make lam=0.5 degenerate:
    with integer ranks, a redundancy delta bounded by 1 can never
    outweigh a 1-rank relevance gap.) Redundancy is distinct-token
    Jaccard ``|t_d ∩ t_c| / |t_d ∪ t_c|`` between candidate
    documents (empty-union pairs score 0.0). ``lam=1`` degenerates to
    the first-stage order; ``lam=0`` is pure anti-redundancy after
    the first pick (both pinned in tests). Ties break by
    (score DESC, rank1 ASC, id ASC) — a refinement, never a coin
    flip (the rerank-family contract shared with
    :func:`rerank_overlap`). Returns ``(query_id, id, rank1,
    mmr_rank)`` with ``mmr_rank`` 1..k per query; candidates missing
    from the corpus are dropped (the inner-join contract the other
    rerankers share).

    Tier choice: greedy selection is sequential in s by definition,
    so this is a documented Arrow tier (``applyInPandas`` per query
    group), not Catalyst — sanctioned because every group is
    CANDIDATE-bounded, never corpus-bounded: the corpus text is
    joined only for the broadcast candidate ids, so stage-two cost is
    |Q| x n_candidates^2 token-set intersections regardless of corpus
    size (n_candidates is the first stage's k — tens, not millions).
    Selection floats are replayed bitwise by the DuckDB oracle:
    Python and DuckDB share IEEE-754 double semantics, and the score
    uses the same division / multiply / subtract shapes on
    integer-exact inputs; the RETURNED columns are all integers."""
    from pyspark.sql.types import LongType, StructField, StructType

    from .text import tokens

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    one_minus_lam = 1.0 - lam
    cand = candidates.select(
        F.col(query_id_col),
        F.col(id_col),
        F.col(rank_col).alias("__rank1"),
    )
    # NULL text coalesces to the empty token set (the rerank_overlap
    # precedent; size(NULL)=-1 nonsense otherwise)
    empty = F.array().cast("array<string>")
    dd = corpus.select(
        F.col(id_col),
        F.coalesce(F.array_distinct(tokens(text_col)), empty).alias("__dt"),
    )
    joined = dd.join(F.broadcast(cand), id_col)
    qid_f = joined.schema[query_id_col]
    id_f = joined.schema[id_col]
    r1_f = joined.schema["__rank1"]
    out_schema = StructType(
        [
            StructField(query_id_col, qid_f.dataType),
            StructField(id_col, id_f.dataType),
            StructField("rank1", r1_f.dataType),
            StructField("mmr_rank", LongType()),
        ]
    )

    def per_query(pdf):
        import pandas as pd

        toks = [set(t) for t in pdf["__dt"]]
        rank1 = [int(r) for r in pdf["__rank1"]]
        bad = [r for r in rank1 if r < 1]
        if bad:
            raise ValueError(
                "rerank_mmr: first-stage ranks must be >= 1 (the "
                f"1-based row_number contract), got {sorted(bad)[:3]} — "
                "a 0-based rank would divide by zero and a negative "
                "one silently inverts relevance"
            )
        ids = list(pdf[id_col])
        qids = list(pdf[query_id_col])
        # candidate indices in tiebreak order (rank1 ASC, id ASC):
        # iterating in this order with a STRICT > comparison makes
        # the argmax resolve ties exactly like the oracle's
        # row_number ORDER BY score DESC, rank1, doc_id
        remaining = sorted(
            range(len(ids)), key=lambda i: (rank1[i], ids[i])
        )
        # running max-jaccard-to-picked per candidate: only the NEWEST
        # pick can raise it, so updating after each pick keeps the
        # documented n_candidates^2 intersection bound (a fresh max
        # over all picked per step would be ~k/2 x that); max over
        # the same IEEE values in any order is exact, so picks are
        # identical either way
        mj = [0.0] * len(ids)
        rows = []
        while remaining and len(rows) < k:
            if not rows:
                best = remaining[0]
            else:
                best, best_score = None, None
                for i in remaining:
                    s = lam * (1.0 / rank1[i]) - one_minus_lam * mj[i]
                    if best is None or s > best_score:
                        best, best_score = i, s
            remaining.remove(best)
            rows.append((qids[best], ids[best], rank1[best], len(rows) + 1))
            tb = toks[best]
            for i in remaining:
                ti = toks[i]
                inter = len(ti & tb)
                union = len(ti) + len(tb) - inter
                jac = inter / union if union else 0.0
                if jac > mj[i]:
                    mj[i] = jac
        return pd.DataFrame(
            rows, columns=[query_id_col, id_col, "rank1", "mmr_rank"]
        )

    return joined.groupBy(query_id_col).applyInPandas(per_query, out_schema)


def hybrid_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    query: str,
    query_vec: list,
    k: int = 10,
    n_candidates: int = 50,
    rrf_k: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    lex_where=None,
    dense_where=None,
    w_lex: float = 1.0,
    w_dense: float = 1.0,
) -> DataFrame:
    """Hybrid retrieval: fuse lexical (BM25) and dense (exact cosine)
    rankings by Reciprocal Rank Fusion (Cormack et al., SIGIR'09):

        rrf(d) = 1/(rrf_k + rank_lex(d)) + 1/(rrf_k + rank_dense(d))

    with a side contributing 0 when ``d`` is outside its top
    ``n_candidates``. The standard two-tower retrieval pattern — BM25
    catches exact-term matches embeddings blur, embeddings catch
    paraphrases BM25 misses. ``docs`` and ``embeddings`` must share an
    id space (``id_col`` == ``vec_id_col`` values).

    Returns ``(id, rrf, rank_lex, rank_dense, rank)`` — ranks NULL for
    the side that did not retrieve the id.

    Exactness: RRF is a sum of two reciprocals of exact integers,
    added in a FIXED order — no transcendentals, so the fusion layer
    is engine-exact by construction (the BM25 side carries its own
    libm-idf discipline). Scale shape: each side is its own scale-safe
    top-``n_candidates`` (TakeOrderedAndProject); the fusion then
    joins two <= n_candidates-row relations — negligible at any corpus
    size. The windows below run over those candidate rows only.

    ``lex_where`` / ``dense_where`` restrict each side's candidates
    (filtered hybrid — each arm's documented filter contract; pass
    the same predicate to both when the corpora share metadata)."""
    from pyspark.sql import Window

    from .similarity import _apply_where, cosine_topk

    if rrf_k < 1:
        raise ValueError(f"rrf_k must be >= 1, got {rrf_k}")
    lex = bm25_topk(
        docs, query, k=n_candidates, k1=k1, b=b,
        text_col=text_col, id_col=id_col, where=lex_where,
    ).select(
        F.col(id_col).alias("__id"),
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col(id_col).asc()))
        .cast("bigint")
        .alias("rank_lex"),
    )
    dense = cosine_topk(
        _apply_where(embeddings, dense_where),
        [float(x) for x in query_vec], k=n_candidates,
        vec_col=vec_col, id_col=vec_id_col,
    ).select(
        F.col(vec_id_col).alias("__id"),
        F.col("rank").cast("bigint").alias("rank_dense"),
    )
    return _rrf_fuse(lex, dense, id_col, rrf_k, k, w_lex, w_dense)


def _check_rrf_weights(w_lex: float, w_dense: float) -> None:
    """Shared weight validation for every hybrid entry point (all four
    route through _rrf_fuse/_rrf_fuse_batch): 0.0 legitimately
    disables a side, but a NEGATIVE weight would silently invert that
    side's rank contribution, and NaN (which compares False both ways)
    would silently poison every fused score (ADVICE r11)."""
    for name, w in (("w_lex", w_lex), ("w_dense", w_dense)):
        if not (w >= 0):
            raise ValueError(
                f"{name} must be >= 0 (0 disables the side), got {w!r}"
            )


def _rrf_fuse(
    lex, dense, id_col: str, rrf_k: int, k: int,
    w_lex: float = 1.0, w_dense: float = 1.0,
) -> DataFrame:
    """Reciprocal Rank Fusion of two (__id, rank_*) candidate
    relations — the shared fusion layer of :func:`hybrid_topk` and
    :func:`hybrid_topk_indexed` (both <= n_candidates rows per side,
    so every window below is candidate-bounded). Engine-exact: a
    fixed-order sum of reciprocals of exact integer ranks, each side
    scaled by its weight (``w=1.0`` multiplies exactly, so the
    defaults are bitwise the unweighted fusion)."""
    from pyspark.sql import Window

    _check_rrf_weights(w_lex, w_dense)
    fused = lex.join(dense, "__id", "full_outer").select(
        F.col("__id").alias(id_col),
        (
            F.coalesce(
                F.lit(float(w_lex))
                * (F.lit(1.0) / (F.lit(int(rrf_k)) + F.col("rank_lex"))),
                F.lit(0.0),
            )
            + F.coalesce(
                F.lit(float(w_dense))
                * (F.lit(1.0) / (F.lit(int(rrf_k)) + F.col("rank_dense"))),
                F.lit(0.0),
            )
        ).alias("rrf"),
        "rank_lex",
        "rank_dense",
    )
    w = Window.orderBy(F.col("rrf").desc(), F.col(id_col).asc())
    return (
        fused.select(
            id_col, "rrf", "rank_lex", "rank_dense",
            F.row_number().over(w).cast("bigint").alias("rank"),
        )
        .orderBy("rank")
        .limit(int(k))
    )


def hybrid_topk_indexed(
    spark,
    bm25_path: str,
    ann_path: str,
    query: str,
    query_vec: list,
    k: int = 10,
    n_candidates: int = 50,
    rrf_k: int = 60,
    nprobe: int | None = None,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    dense: str = "ivf",
    dense_rerank: int | None = None,
    lex_where=None,
    dense_where=None,
    w_lex: float = 1.0,
    w_dense: float = 1.0,
) -> DataFrame:
    """Hybrid retrieval against PERSISTED indexes on both sides — the
    100 TB serving form of :func:`hybrid_topk`: the lexical candidates
    come from the bucket-pruned BM25 inverted index
    (:func:`bm25_topk_indexed` — reads only the query terms' postings
    buckets, never corpus text) and the dense candidates from a
    persisted IVF index (``similarity.ann_ivf_topk_indexed`` — scans
    only the ``nprobe`` probed cell directories), fused by the same
    engine-exact RRF layer. Neither side touches a full table: the
    probe cost is O(query terms' postings + probed cells), independent
    of corpus size.

    ``dense="ivfpq"`` probes an IVF-PQ index instead
    (``similarity.ann_ivfpq_topk_indexed``) — same cell pruning PLUS
    code-column-only reads (~16x less probe IO at the defaults);
    ``dense="ivfsq8"`` probes an IVF-SQ8 index
    (``similarity.ann_ivfsq8_topk_indexed`` — scalar-quantized codes,
    ~4x less probe IO at near-exact recall, the middle ground).
    ``dense_rerank=R`` adds the exact-cosine tail over each probe's
    top-R compressed candidates. The fusion consumes ranks only, so
    any dense arm slots in unchanged.

    With ``nprobe >= nlist`` (full probe) the IVF dense side ranks by
    exact cosine over all vectors, so the output is BITWISE the
    scan-form :func:`hybrid_topk` (pinned in tests; for ``ivfpq`` the
    same holds with ``dense_rerank >= |corpus|``); at serving defaults
    the dense side trades recall for the pruned scan, which is the
    point. ``nprobe=None`` uses the similarity module's default.
    ``lex_where`` / ``dense_where`` restrict each arm's candidates
    in-scan (filtered hybrid — both indexes must store the predicate
    columns via their builds' ``extra_cols``)."""
    from pyspark.sql import Window

    from .similarity import (
        ANN_NPROBE,
        ann_ivf_topk_indexed,
        ann_ivfpq_topk_indexed,
        ann_ivfsq8_topk_indexed,
    )

    if rrf_k < 1:
        raise ValueError(f"rrf_k must be >= 1, got {rrf_k}")
    if dense not in ("ivf", "ivfpq", "ivfsq8"):
        raise ValueError(
            f"dense must be 'ivf', 'ivfpq', or 'ivfsq8', got {dense!r}"
        )
    lex = bm25_topk_indexed(
        spark, bm25_path, query, k=n_candidates, k1=k1, b=b,
        id_col=id_col, where=lex_where,
    ).select(
        F.col(id_col).alias("__id"),
        F.row_number()
        .over(Window.orderBy(F.col("score").desc(), F.col(id_col).asc()))
        .cast("bigint")
        .alias("rank_lex"),
    )
    np_ = ANN_NPROBE if nprobe is None else int(nprobe)
    if dense == "ivfpq":
        dense_df = ann_ivfpq_topk_indexed(
            spark,
            ann_path,
            [float(x) for x in query_vec],
            k=n_candidates,
            nprobe=np_,
            rerank=dense_rerank,
            where=dense_where,
        )
    elif dense == "ivfsq8":
        dense_df = ann_ivfsq8_topk_indexed(
            spark,
            ann_path,
            [float(x) for x in query_vec],
            k=n_candidates,
            nprobe=np_,
            rerank=dense_rerank,
            where=dense_where,
        )
    else:
        dense_df = ann_ivf_topk_indexed(
            spark, ann_path, [float(x) for x in query_vec],
            k=n_candidates, nprobe=np_, where=dense_where,
        )
    dense_df = dense_df.select(
        F.col("vec_id").alias("__id"),
        F.col("rank").cast("bigint").alias("rank_dense"),
    )
    return _rrf_fuse(lex, dense_df, id_col, rrf_k, k, w_lex, w_dense)


def retrieval_metrics(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    grade_col: str = "grade",
) -> DataFrame:
    """Per-query retrieval quality — the eval half of the retrieval
    surface: given a ranked result relation (``query_id, id, rank``,
    rank 1-based — the output shape of :func:`bm25_join`,
    :func:`hybrid_join_indexed`, ``similarity.cosine_join``, ...) and
    a relevance-judgment relation (``query_id, id, grade`` with
    grade > 0 relevant), compute the standard cutoff-``k`` metrics:

    * ``recall``  = |relevant retrieved in top k| / |relevant|
    * ``rr``      = 1 / rank of the first relevant hit (0 if none) —
      average it for MRR@k
    * ``ap``      = average precision@k: the j-th relevant hit (by
      rank) contributes ``j / rank_j``; the sum is divided by
      ``min(n_relevant, k)`` — average it for MAP@k
    * ``ndcg``    = DCG@k / IDCG@k with linear gain,
      DCG = sum_i grade_i / log2(rank_i + 1)

    Returns ``(query_id, n_relevant, n_hits, recall, rr, ap, ndcg)``
    — one row per query WITH at least one relevant judgment (the
    convention every IR eval tool uses: unjudged queries are
    excluded, retrieved-nothing queries score 0).

    Scale shape: one cutoff filter + one join of results against
    qrels (both workload-sized — at 100 TB the corpus appears only
    through the ids results carry), two bounded per-query aggregates,
    and a broadcast-friendly final join keyed by query. Float
    discipline: every log2 runs through ``exactmath.ln_libm`` on the
    bounded hit/judgment relations divided by the libm ``ln(2)``
    literal, and the DCG/IDCG sums are strict rank-ordered folds — the
    DuckDB oracle replays them bit-for-bit (recall and rr are single
    IEEE divisions of exact integers)."""
    import math as _math

    from .exactmath import ln_libm

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    ln2 = F.lit(_math.log(2.0))
    rel = qrels.filter(F.col(grade_col) > 0).select(
        F.col(query_id_col),
        F.col(id_col),
        F.col(grade_col).cast("double").alias("__g"),
    )
    # per-query judgment totals + IDCG@k: the ideal ordering is the
    # grades descending; the fold runs over the top-k of that ordering
    # in strict position order (1-indexed, log2(i+1) via libm)
    ideal = (
        rel.groupBy(query_id_col)
        .agg(
            F.count(F.lit(1)).alias("n_relevant"),
            F.slice(
                F.reverse(F.array_sort(F.collect_list("__g"))), 1, int(k)
            ).alias("__gs"),
        )
        .select(
            query_id_col,
            "n_relevant",
            F.posexplode("__gs").alias("__i", "__g"),
        )
        .select(
            query_id_col,
            "n_relevant",
            "__i",
            (
                F.col("__g")
                / (ln_libm(F.col("__i") + F.lit(2.0)) / ln2)
            ).alias("__t"),
        )
        .groupBy(query_id_col, "n_relevant")
        .agg(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("__i", "__t"))),
                F.lit(0.0),
                lambda acc, s: acc + s["__t"],
            ).alias("__idcg")
        )
    )
    hits = (
        results.filter(F.col(rank_col) <= k)
        .select(
            F.col(query_id_col), F.col(id_col), F.col(rank_col).alias("__r")
        )
        .join(rel, [query_id_col, id_col])
        .select(
            query_id_col,
            "__r",
            (
                F.col("__g")
                / (ln_libm(F.col("__r") + F.lit(1.0)) / ln2)
            ).alias("__t"),
        )
    )
    per_q = hits.groupBy(query_id_col).agg(
        F.count(F.lit(1)).alias("n_hits"),
        (F.lit(1.0) / F.min("__r")).alias("rr"),
        F.aggregate(
            F.array_sort(F.collect_list(F.struct("__r", "__t"))),
            F.lit(0.0),
            lambda acc, s: acc + s["__t"],
        ).alias("__dcg"),
        # AP numerator: the j-th relevant hit by rank contributes
        # j / rank_j (both exact integers — one IEEE division per
        # term), summed in strict position order: sort the hit ranks,
        # fold with a (count, sum) struct accumulator
        F.aggregate(
            F.array_sort(F.collect_list("__r")),
            F.struct(
                F.lit(0).alias("j"), F.lit(0.0).alias("s")
            ),
            lambda acc, r: F.struct(
                (acc["j"] + 1).alias("j"),
                (acc["s"] + (acc["j"] + 1) / r).alias("s"),
            ),
        )["s"].alias("__apsum"),
    )
    return (
        ideal.join(per_q, query_id_col, "left")
        .select(
            query_id_col,
            "n_relevant",
            F.coalesce("n_hits", F.lit(0)).alias("n_hits"),
            (
                F.coalesce("n_hits", F.lit(0)) / F.col("n_relevant")
            ).alias("recall"),
            F.coalesce("rr", F.lit(0.0)).alias("rr"),
            F.coalesce(
                F.col("__apsum")
                / F.least(F.col("n_relevant"), F.lit(int(k))),
                F.lit(0.0),
            ).alias("ap"),
            F.coalesce(
                F.col("__dcg") / F.col("__idcg"), F.lit(0.0)
            ).alias("ndcg"),
        )
    )


def retrieval_metrics_summary(
    results: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_id_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    grade_col: str = "grade",
) -> DataFrame:
    """One-row corpus-level summary of :func:`retrieval_metrics`:
    ``(n_queries, recall, mrr, map, ndcg)`` — the means IR papers
    report (MRR@k = mean rr, MAP@k = mean ap, ...). Means are strict
    query-id-ordered folds divided by the exact integer count, so the
    summary is bitwise-reproducible like the per-query relation it
    folds (a plain ``avg`` would sum in partition order)."""
    per_q = retrieval_metrics(
        results, qrels, k=k, query_id_col=query_id_col, id_col=id_col,
        rank_col=rank_col, grade_col=grade_col,
    )

    def mean_of(col: str):
        return (
            F.aggregate(
                F.array_sort(
                    F.collect_list(F.struct(query_id_col, col))
                ),
                F.lit(0.0),
                lambda acc, s: acc + s[col],
            )
            / F.count(F.lit(1))
        )

    return per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        mean_of("recall").alias("recall"),
        mean_of("rr").alias("mrr"),
        mean_of("ap").alias("map"),
        mean_of("ndcg").alias("ndcg"),
    )


def _rrf_fuse_batch(
    lex, dense, query_id_col: str, id_col: str, rrf_k: int, k: int,
    w_lex: float = 1.0, w_dense: float = 1.0,
) -> DataFrame:
    """Per-query RRF fusion of two (query_id, __id, rank_*) candidate
    relations — the batch twin of :func:`_rrf_fuse`. Both inputs are
    <= n_candidates rows PER QUERY, so the fusion join and the final
    window are candidate-bounded per partition key."""
    from pyspark.sql import Window

    _check_rrf_weights(w_lex, w_dense)
    fused = lex.join(dense, [query_id_col, "__id"], "full_outer").select(
        F.col(query_id_col),
        F.col("__id").alias(id_col),
        (
            F.coalesce(
                F.lit(float(w_lex))
                * (F.lit(1.0) / (F.lit(int(rrf_k)) + F.col("rank_lex"))),
                F.lit(0.0),
            )
            + F.coalesce(
                F.lit(float(w_dense))
                * (F.lit(1.0) / (F.lit(int(rrf_k)) + F.col("rank_dense"))),
                F.lit(0.0),
            )
        ).alias("rrf"),
        "rank_lex",
        "rank_dense",
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("rrf").desc(), F.col(id_col).asc()
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def hybrid_join(
    docs: DataFrame,
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_candidates: int = 50,
    rrf_k: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_text_col: str = "text",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    lex_where=None,
    dense_where=None,
    w_lex: float = 1.0,
    w_dense: float = 1.0,
) -> DataFrame:
    """Batch hybrid retrieval — the R-S form of :func:`hybrid_topk`:
    fuse per-query BM25 (:func:`bm25_join`, one corpus text scan for
    the whole batch) and per-query exact cosine
    (``similarity.cosine_join``, one embedding scan) rankings by RRF.
    ``queries`` carries BOTH modalities per row: ``(query_id, text,
    query_vec)``. Returns ``(query_id, id, rrf, rank_lex, rank_dense,
    rank)`` with rank 1..k per query; ranks NULL for the side that
    did not retrieve the id.

    Each side scans its table ONCE regardless of |queries|; the
    fusion joins two <= |queries| x n_candidates relations. The
    100 TB serving form is :func:`hybrid_join_indexed` (neither side
    scans a full table). ``lex_where`` / ``dense_where`` restrict
    each side's candidates (filtered hybrid)."""
    from .similarity import _apply_where, cosine_join

    if rrf_k < 1:
        raise ValueError(f"rrf_k must be >= 1, got {rrf_k}")
    lex = bm25_join(
        docs,
        queries,
        k=n_candidates,
        k1=k1,
        b=b,
        text_col=text_col,
        id_col=id_col,
        query_text_col=query_text_col,
        query_id_col=query_id_col,
        where=lex_where,
    ).select(
        F.col(query_id_col),
        F.col(id_col).alias("__id"),
        F.col("rank").alias("rank_lex"),
    )
    dense = cosine_join(
        _apply_where(embeddings, dense_where),
        queries,
        k=n_candidates,
        vec_col=vec_col,
        id_col=vec_id_col,
        query_id_col=query_id_col,
        query_vec_col=query_vec_col,
    ).select(
        F.col(query_id_col),
        F.col(vec_id_col).alias("__id"),
        F.col("rank").alias("rank_dense"),
    )
    return _rrf_fuse_batch(lex, dense, query_id_col, id_col, rrf_k, k, w_lex, w_dense)


def hybrid_join_indexed(
    spark,
    bm25_path: str,
    ann_path: str,
    queries: DataFrame,
    k: int = 10,
    n_candidates: int = 50,
    rrf_k: int = 60,
    nprobe: int | None = None,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    query_text_col: str = "text",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    dense: str = "ivf",
    dense_rerank: int | None = None,
    lex_where=None,
    dense_where=None,
    w_lex: float = 1.0,
    w_dense: float = 1.0,
) -> DataFrame:
    """Batch hybrid retrieval against PERSISTED indexes on both sides
    — completes the hybrid matrix (:func:`hybrid_topk` /
    :func:`hybrid_topk_indexed` / :func:`hybrid_join` / this), and is
    the shape a 100 TB RAG serving path actually runs: the whole
    query batch's lexical candidates come from the bucket-pruned BM25
    inverted index (:func:`bm25_join_indexed` — reads the batch
    vocabulary's postings buckets only) and its dense candidates from
    the IVF index (``similarity.ann_ivf_join_indexed`` — reads the
    union of the batch's probed cells only), fused per query by the
    same engine-exact RRF. No full-table scan anywhere.

    ``dense="ivfpq"`` probes an IVF-PQ index instead
    (``similarity.ann_ivfpq_join_indexed``); ``dense="ivfsq8"`` an
    IVF-SQ8 index (``similarity.ann_ivfsq8_join_indexed``, the
    scalar-quantized middle ground) — the union-of-cells scan
    additionally reads the CODE column only (~16x less probe IO at
    the defaults); ``dense_rerank=R`` adds the per-query exact-cosine
    tail. The fusion consumes ranks only, so either arm slots in.

    With ``nprobe >= nlist`` the output is BITWISE :func:`hybrid_join`
    (pinned in tests; for ``ivfpq`` the same holds with
    ``dense_rerank >= |corpus|``); at serving defaults the dense side
    trades recall for the pruned scan. ``lex_where`` /
    ``dense_where`` restrict each arm's candidates in-scan (filtered
    hybrid; both indexes must store the predicate columns).

    |Q| ceiling: the query batch is driver-materialized BY DESIGN
    (texts + vectors; ~100 bytes + 8*dim per query — 10^5 queries at
    dim 64 is ~60 MB, far under driver memory). Millions of queries:
    chunk the batch and union the outputs — per-query results are
    independent, so chunking is semantics-free."""
    from .similarity import (
        ANN_NPROBE,
        ann_ivf_join_indexed,
        ann_ivfpq_join_indexed,
        ann_ivfsq8_join_indexed,
    )

    if rrf_k < 1:
        raise ValueError(f"rrf_k must be >= 1, got {rrf_k}")
    if dense not in ("ivf", "ivfpq", "ivfsq8"):
        raise ValueError(
            f"dense must be 'ivf', 'ivfpq', or 'ivfsq8', got {dense!r}"
        )
    # materialize the query batch ONCE: both sides must collect the
    # workload anyway (terms -> postings buckets, vectors -> probe
    # cells), and handing each a live DataFrame would re-run the
    # caller's query-construction lineage per side
    # bounded-collect: the retrieval workload (both sides re-collect
    # from this local relation, which is free)
    qrows = queries.select(
        F.col(query_id_col),
        F.col(query_text_col),
        F.col(query_vec_col).cast("array<double>"),
    ).collect()
    if not qrows:
        raise ValueError("query batch is empty")
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    qid_type = queries.schema[query_id_col].dataType
    qlocal = _local_rows_df(
        spark,
        [(r[0], r[1], [float(x) for x in r[2]]) for r in qrows],
        StructType(
            [
                StructField(query_id_col, qid_type),
                StructField(query_text_col, StringType()),
                StructField(query_vec_col, ArrayType(DoubleType())),
            ]
        ),
    )
    lex = bm25_join_indexed(
        spark,
        bm25_path,
        qlocal,
        k=n_candidates,
        k1=k1,
        b=b,
        id_col=id_col,
        query_text_col=query_text_col,
        query_id_col=query_id_col,
        where=lex_where,
    ).select(
        F.col(query_id_col),
        F.col(id_col).alias("__id"),
        F.col("rank").alias("rank_lex"),
    )
    np_ = ANN_NPROBE if nprobe is None else int(nprobe)
    if dense == "ivfpq":
        dense_df = ann_ivfpq_join_indexed(
            spark,
            ann_path,
            qlocal,
            k=n_candidates,
            nprobe=np_,
            rerank=dense_rerank,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
            where=dense_where,
        )
    elif dense == "ivfsq8":
        dense_df = ann_ivfsq8_join_indexed(
            spark,
            ann_path,
            qlocal,
            k=n_candidates,
            nprobe=np_,
            rerank=dense_rerank,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
            where=dense_where,
        )
    else:
        dense_df = ann_ivf_join_indexed(
            spark,
            ann_path,
            qlocal,
            k=n_candidates,
            nprobe=np_,
            query_id_col=query_id_col,
            query_vec_col=query_vec_col,
            where=dense_where,
        )
    dense_df = dense_df.select(
        F.col(query_id_col),
        F.col("vec_id").alias("__id"),
        F.col("rank").alias("rank_dense"),
    )
    return _rrf_fuse_batch(lex, dense_df, query_id_col, id_col, rrf_k, k, w_lex, w_dense)


_BM25_RESERVED_COLS = (
    "tok", "tf", "dl", "df", "tok_bucket", "ingest_batch_id",
    "n_docs", "sum_dl", "n_buckets",
)


def _check_bm25_extra_cols(extra_cols, id_col: str, text_col: str) -> None:
    bad = [
        c
        for c in extra_cols
        if c in _BM25_RESERVED_COLS or c in (id_col, text_col)
    ]
    if bad:
        raise ValueError(
            f"extra_cols {bad} collide with BM25 index layout columns "
            f"({_BM25_RESERVED_COLS + (id_col, text_col)})"
        )


def _bm25_extra_cols(postings: DataFrame, id_col: str) -> list[str]:
    """Metadata columns a persisted postings relation carries beyond
    the layout — appends introspect these (the ANN-append pattern) so
    extras flow through without a parameter, and a batch MISSING one
    fails loudly at the select instead of writing silent nulls."""
    return [
        c
        for c in postings.columns
        if c not in _BM25_RESERVED_COLS and c != id_col
    ]


def build_bm25_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int | None = 64,
    commit: str = "rename",
    extra_cols: tuple[str, ...] = (),
    target_bucket_docs: int = 1024,
) -> None:
    """Persist the BM25 inverted index for a corpus — the repeated-
    retrieval twin of :func:`bm25_topk` (which rebuilds the query
    terms' postings from text every call). One corpus scan writes:

    * ``{path}/postings`` — ``(tok, id, tf, dl)``, directory-
      partitioned by ``ingest_batch_id`` (base ``-1``; appends land in
      their own partitions, the every-store layout) then
      ``tok_bucket = md5(tok) % n_buckets`` so a probe reads ONLY its
      terms' buckets (``PartitionFilters`` prune whole directories at
      planning time — at 100 TB, the difference between scanning the
      corpus and reading a few term shards);
    * ``{path}/dft``     — per-term document-frequency rows, same
      layout; appends write per-batch DELTAS which probes merge for
      THEIR terms only (the band-store counts trick);
    * ``{path}/_bm25_stats`` — per-batch (n_docs, sum_dl) rows, summed
      at probe time (bounded by batch count; compaction re-totals);
    * ``{path}/_bm25_meta``  — ``n_buckets`` (probes resolve it; the
      ``_lsh_meta`` discipline).

    ``commit="manifest"`` publishes via the generation-pointer layout
    (``sources/manifest.py``) — the same object-store contract as the
    ANN/band/gram stores. Probes (:func:`bm25_topk_indexed`) are
    pinned bitwise-equal to the scan form, including across appends
    (idf and avgdl re-derive from the summed stats, so a probe after
    ``append_to_bm25_index`` equals a text scan of the UNION corpus).
    Append batches must hold NEW document ids (the shared
    reserved-base contract of all the incremental stores).

    ``extra_cols`` stores passthrough metadata (source, language,
    license) on every postings row — the filtered-retrieval enabler:
    a probe's ``where`` then evaluates inside the bucket-pruned scan
    (parquet pushdown). Per-(doc, term) duplication of the metadata
    value is the standard stored-field trade; keep extras narrow.

    ``n_buckets=None`` AUTO-SIZES the bucket count from the corpus:
    ``ceil(n_docs / target_bucket_docs)`` — the ``nlist=None`` rule of
    the IVF builds carried to the lexical store. Fixed buckets make a
    probe's per-bucket read grow linearly with the corpus (the b40
    1.4-1.5x probe slope in PARITY's scaling note); auto keeps
    expected postings-per-bucket roughly constant, so probe IO stays
    flat as the corpus grows. The DEFAULT stays the fixed constant so
    gated constructions remain oracle-replayable; pass ``None`` at
    scale. Probes resolve whatever count was used from
    ``_bm25_meta``, so nothing downstream changes."""
    from ..sources.bucketed import write_partitioned
    from ..sources.manifest import begin_generation, commit_generation
    from .dedup import _rm_dir, spread_small_input
    from .text import md5_int32, tokens

    if n_buckets is None:
        if target_bucket_docs < 1:
            raise ValueError(
                f"target_bucket_docs must be >= 1, got {target_bucket_docs}"
            )
        # one corpus scalar (count) sizing the layout
        n_buckets = max(
            1, -(-docs.count() // int(target_bucket_docs))
        )
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    if commit not in ("rename", "manifest"):
        raise ValueError(f"commit must be 'rename' or 'manifest', got {commit!r}")
    _check_bm25_extra_cols(extra_cols, id_col, text_col)
    spark = docs.sparkSession
    if commit == "manifest":
        root = path
        path = begin_generation(spark, root)
    else:
        # clear ALL per-batch subdirs, not just postings/dft: a rebuild
        # over a previously-appended index must not leave stale
        # _bm25_stats partitions behind — probes SUM the stats rows, so
        # a leftover batch row silently skews idf/avgdl (ADVICE r10)
        _rm_dir(spark, f"{path}/postings")
        _rm_dir(spark, f"{path}/dft")
        _rm_dir(spark, f"{path}/_bm25_stats")
    toks = tokens(text_col)
    occ = spread_small_input(docs).select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        F.explode(toks).alias("tok"),
        *[F.col(c) for c in extra_cols],
    )
    postings = (
        occ.groupBy(id_col, "tok")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.first("dl").alias("dl"),
            *[F.first(c).alias(c) for c in extra_cols],
        )
        .withColumn("tok_bucket", F.pmod(md5_int32(F.col("tok")), F.lit(n_buckets)))
    )
    write_partitioned(
        postings, f"{path}/postings/ingest_batch_id=-1", "tok_bucket"
    )
    (
        spark.read.parquet(f"{path}/postings/ingest_batch_id=-1")
        .groupBy("tok_bucket", "tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .write.partitionBy("tok_bucket")
        .mode("overwrite")
        .parquet(f"{path}/dft/ingest_batch_id=-1")
    )
    docs.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).alias("sum_dl"),
    ).coalesce(1).write.mode("overwrite").parquet(
        f"{path}/_bm25_stats/ingest_batch_id=-1"
    )
    _local_rows_df(
        spark,
        [(int(n_buckets),)], "n_buckets int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/_bm25_meta")
    if commit == "manifest":
        commit_generation(spark, root, path)


def append_to_bm25_index(
    docs: DataFrame,
    path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_id: int | None = None,
) -> None:
    """Append a new batch of documents to an existing BM25 index —
    the nightly post-ingest step, mirroring
    ``append_to_minhash_band_store``: postings land as-is, per-term df
    and the corpus stats append as PER-BATCH DELTA rows (probes merge
    them lazily, for their terms only), so the append is O(new batch)
    — the existing index is never read, let alone re-totalled.

    With ``batch_id`` the write is IDEMPOTENT (partition overwrite —
    streaming-replay safe); without it rows accumulate in the base
    partition. Batch ids must be NEW documents (shared incremental-
    store contract); probes after the append equal a text scan of the
    union corpus (pinned)."""
    from ..sources.bucketed import write_partitioned
    from ..sources.manifest import resolve_root
    from .dedup import spread_small_input
    from .text import md5_int32, tokens

    if batch_id is not None and batch_id < 0:
        raise ValueError(
            f"batch_id must be >= 0, got {batch_id}: negative ids are "
            "reserved (ingest_batch_id=-1 is the base partition)"
        )
    spark = docs.sparkSession
    path = resolve_root(spark, path)
    # bounded-collect: one parameter row from the index metadata
    n_buckets = int(spark.read.parquet(f"{path}/_bm25_meta").collect()[0][0])
    extras = _bm25_extra_cols(
        spark.read.parquet(f"{path}/postings"), id_col
    )
    part = -1 if batch_id is None else batch_id
    mode = "append" if batch_id is None else "overwrite"
    toks = tokens(text_col)
    occ = spread_small_input(docs).select(
        F.col(id_col),
        F.size(toks).alias("dl"),
        F.explode(toks).alias("tok"),
        *[F.col(c) for c in extras],
    )
    postings = (
        occ.groupBy(id_col, "tok")
        .agg(
            F.count(F.lit(1)).alias("tf"),
            F.first("dl").alias("dl"),
            *[F.first(c).alias(c) for c in extras],
        )
        .withColumn(
            "tok_bucket", F.pmod(md5_int32(F.col("tok")), F.lit(n_buckets))
        )
        .persist()
    )
    write_partitioned(
        postings, f"{path}/postings/ingest_batch_id={part}", "tok_bucket",
        mode=mode,
    )
    (
        postings.groupBy("tok_bucket", "tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .write.partitionBy("tok_bucket")
        .mode(mode)
        .parquet(f"{path}/dft/ingest_batch_id={part}")
    )
    postings.unpersist()
    docs.select(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).alias("sum_dl"),
    ).coalesce(1).write.mode(mode).parquet(
        f"{path}/_bm25_stats/ingest_batch_id={part}"
    )


def bm25_index_stats(spark, path: str) -> DataFrame:
    """Operational health report for a persisted BM25 index: one row
    per ``(table, ingest_batch_id, tok_bucket)`` with its row count,
    over the postings AND the df-delta store (``table`` in
    ``('postings', 'dft')``). Many batch partitions or fat df-delta
    counts -> :func:`compact_bm25_index`; persistently hot buckets ->
    rebuild with a larger ``n_buckets``. Store-only read, aggregate
    bounded by tables x batches x buckets."""
    from ..sources.manifest import resolve_root

    path = resolve_root(spark, path)
    out = None
    for table in ("postings", "dft"):
        t = (
            spark.read.parquet(f"{path}/{table}")
            .groupBy(
                F.lit(table).alias("table"),
                F.col("ingest_batch_id").cast("bigint").alias(
                    "ingest_batch_id"
                ),
                F.col("tok_bucket").cast("int").alias("tok_bucket"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
        )
        out = t if out is None else out.unionByName(t)
    return out


def compact_bm25_index(spark, path: str) -> None:
    """Collapse a long-appended BM25 index back to the base layout:
    postings merge into ``ingest_batch_id=-1``, df deltas re-total to
    one row per term, stats rows to one. Reads only the STORE (never
    corpus text). Manifest-layout indexes publish a fresh generation
    (object-store safe, concurrent-reader safe); rename-layout swaps
    in place via ``_swap_in`` (stopped-writer contract)."""
    from ..sources.manifest import (
        begin_generation,
        commit_generation,
        resolve_root,
    )
    from ..streaming.ingest import _read_text, _write_text
    from .dedup import _swap_in

    root = path
    cur = resolve_root(spark, root)
    # stream_maintain_bm25_index keeps its identity marker INSIDE
    # {path}/postings (the dir this compaction replaces) — carry it
    # across, the compact_gram_store lesson (ADVICE r9)
    marker = _read_text(spark, f"{cur}/postings/_ingest_stream")
    postings = spark.read.parquet(f"{cur}/postings").drop("ingest_batch_id")
    dft = (
        spark.read.parquet(f"{cur}/dft")
        .groupBy("tok_bucket", "tok")
        .agg(F.sum("df").cast("bigint").alias("df"))
    )
    stats = spark.read.parquet(f"{cur}/_bm25_stats").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("sum_dl").cast("bigint").alias("sum_dl"),
    )
    if cur != root:
        gen = begin_generation(spark, root)
        postings.write.partitionBy("tok_bucket").mode("overwrite").parquet(
            f"{gen}/postings/ingest_batch_id=-1"
        )
        dft.write.partitionBy("tok_bucket").mode("overwrite").parquet(
            f"{gen}/dft/ingest_batch_id=-1"
        )
        stats.coalesce(1).write.mode("overwrite").parquet(
            f"{gen}/_bm25_stats/ingest_batch_id=-1"
        )
        spark.read.parquet(f"{cur}/_bm25_meta").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{gen}/_bm25_meta")
        if marker is not None:
            _write_text(spark, f"{gen}/postings/_ingest_stream", marker)
        commit_generation(spark, root, gen)
        return
    for sub, df_out, pby in (
        ("postings", postings, True),
        ("dft", dft, True),
        ("_bm25_stats", stats.coalesce(1), False),
    ):
        staging = f"{path}/{sub}_compacting"
        w = df_out.write.mode("overwrite")
        if pby:
            w = w.partitionBy("tok_bucket")
        w.parquet(staging)
        _swap_in(
            spark, staging, f"{path}/{sub}",
            f"{path}/{sub}/ingest_batch_id=-1",
        )
        if sub == "postings" and marker is not None:
            # re-arm the stream-identity marker IMMEDIATELY after the
            # postings swap (the dir that carries it) — a crash between
            # the swaps must not leave a marker-less base-only store
            # that a fresh-checkpoint stream could silently adopt with
            # a reset replay fence (ADVICE r10)
            _write_text(spark, f"{path}/postings/_ingest_stream", marker)


def bm25_topk_indexed(
    spark,
    path: str,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    before_batch: int | None = None,
    where=None,
    weights: dict | None = None,
) -> DataFrame:
    """Top-``k`` BM25 against a persisted index — NEVER touches corpus
    text: the probe reads only the query terms' postings buckets
    (directory-partition pruning on ``tok_bucket``), the |terms|-row
    df shard (idf via ln_libm), and the 1-row stats table. Bitwise the
    scan-form :func:`bm25_topk` answer (pinned in tests). ``where``
    (over the index's stored ``extra_cols``) is filtered retrieval:
    the predicate evaluates inside the pruned postings scan,
    restricting CANDIDATES while idf/avgdl stay corpus-wide — bitwise
    the scan form's ``where`` (pinned).

    ``weights`` (``{term: w}``) is WEIGHTED-QUERY probing, bitwise
    the scan form's :func:`bm25_topk(weights=...)`: the term set is
    the weight keys (``query`` ignored for term extraction) and each
    term's contribution scales ``w * (idf * saturation)`` — the RM3
    serving path against the index."""
    from ..sources.manifest import resolve_root
    from .exactmath import ln_libm
    from .similarity import _apply_where

    weights = dict(weights) if weights else None
    if weights is not None:
        terms = sorted(weights)
        # not (w > 0): NaN compares False both ways (the scan form's
        # ADVICE-r11 check, mirrored)
        if any(not (w > 0) for w in weights.values()):
            raise ValueError("weights must be positive")
    else:
        terms = sorted(set(query.split()))
    if not terms:
        raise ValueError("query has no terms")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not (k1 > 0 and 0.0 <= b <= 1.0):
        raise ValueError(f"need k1 > 0 and 0 <= b <= 1, got k1={k1} b={b}")
    path = resolve_root(spark, path)
    # bounded-collect: one parameter row from the index metadata
    n_buckets = int(spark.read.parquet(f"{path}/_bm25_meta").collect()[0][0])
    stats = spark.read.parquet(f"{path}/_bm25_stats")
    if before_batch is not None:
        stats = stats.filter(F.col("ingest_batch_id") < before_batch)
    # bounded-collect: the summed corpus scalars (one row per batch
    # partition pre-sum — batch count, not corpus, sized)
    st = stats.agg(
        F.sum("n_docs").alias("n_docs"), F.sum("sum_dl").alias("sum_dl")
    ).collect()[0]
    if st.n_docs is None:
        raise ValueError(f"index at {path!r} holds no stats rows")
    n_docs, sum_dl = int(st.n_docs), int(st.sum_dl)

    import hashlib

    buckets = sorted(
        {int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % n_buckets for t in terms}
    )
    term_filter = F.col("tok").isin(terms)
    bucket_filter = F.col("tok_bucket").isin(buckets)
    tf = (
        spark.read.parquet(f"{path}/postings")
        .filter(bucket_filter)
        .filter(term_filter)
    )
    dft = (
        spark.read.parquet(f"{path}/dft")
        .filter(bucket_filter)
        .filter(term_filter)
    )
    if before_batch is not None:
        tf = tf.filter(F.col("ingest_batch_id") < before_batch)
        dft = dft.filter(F.col("ingest_batch_id") < before_batch)
    # filtered retrieval: candidates only — df (below) comes from the
    # dft store, so collection statistics stay corpus-wide
    tf = _apply_where(tf, where)
    # merge per-append df DELTAS — for the probe's terms only, so the
    # merge aggregate is |terms|-row sized regardless of append count;
    # collected, ln'd driver-side (same libm, bitwise — see
    # _idf_literal), and shipped back as a broadcast literal: the
    # pruned dft read that fed the former broadcast build now feeds a
    # |terms|-row collect, and the ArrowEvalPython node disappears
    # (round 16, guide §4)
    dfrows = [
        (r[0], int(r[1]))
        for r in dft.groupBy("tok").agg(F.sum("df").alias("df")).collect()
    ]
    df_t = _idf_literal(spark, dfrows, n_docs, "tok")
    if weights is not None:
        # per-term boost rides the |terms|-row idf table, exactly the
        # scan form's construction (bitwise-pinned)
        wdf = _local_rows_df(
            spark,
            [(t, float(w)) for t, w in sorted(weights.items())],
            "tok string, __w double",
        )
        df_t = df_t.join(F.broadcast(wdf), "tok")
    base_c = (
        F.col("__idf")
        * (F.col("tf") * F.lit(float(k1) + 1.0))
        / (
            F.col("tf")
            + F.lit(float(k1))
            * (
                F.lit(1.0 - float(b))
                + F.lit(float(b))
                * F.col("dl")
                / (F.lit(float(sum_dl)) / F.lit(float(n_docs)))
            )
        )
    )
    contrib = tf.join(F.broadcast(df_t), "tok").select(
        F.col(id_col),
        F.col("tok").alias("__tok"),
        (base_c if weights is None else F.col("__w") * base_c).alias("__c"),
    )
    scored = (
        contrib.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms_matched"),
            F.array_sort(
                F.collect_list(F.struct("__tok", "__c"))
            ).alias("__cs"),
        )
        .select(
            id_col,
            F.aggregate(
                F.col("__cs"), F.lit(0.0), lambda acc, s: acc + s["__c"]
            ).alias("score"),
            "n_terms_matched",
        )
    )
    return scored.orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    ).limit(int(k))


def bm25_join_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    query_text_col: str = "text",
    query_id_col: str = "query_id",
    before_batch: int | None = None,
    where=None,
    weights: DataFrame | None = None,
) -> DataFrame:
    """Batch retrieval against a persisted index — completes the
    scan/indexed x single/batch matrix (:func:`bm25_topk` /
    :func:`bm25_join` / :func:`bm25_topk_indexed` / this): score a
    whole query batch reading ONLY the batch vocabulary's postings
    buckets, never corpus text. Same output and semantics as
    :func:`bm25_join` (pinned bitwise-equal).

    ``weights`` is the WEIGHTED batch probe — the indexed twin of
    :func:`bm25_join(weights=...)`: a ``(query_id_col, term, weight)``
    relation giving each query its own weighted term set (``queries``
    is then ignored for term extraction; it may even be the weights
    relation itself). Validation happens driver-side on the already-
    collected workload (the batch probe collects the (query, term)
    pairs regardless — that is what enumerates the postings buckets),
    and contributions scale ``w * (idf * saturation)`` exactly like
    every other weighted form. Per-query output equals looping
    ``bm25_topk_indexed(weights=w_q)`` bitwise (pinned).

    Scale shape: the postings/df scans prune to the union of the query
    batch's term buckets at PLANNING time when the vocabulary is
    driver-enumerable — which it is here, because the query batch
    itself must be collected to know which buckets to read
    (bounded-collect: the batch's distinct terms — the query WORKLOAD,
    not the corpus; a million-term batch is the point where
    :func:`bm25_join`'s full-scan form wins anyway). df deltas merge
    for these terms only; per-query top-k is the same spilling window
    as bm25_join. ``where`` is filtered retrieval over the index's
    stored ``extra_cols`` (candidates restricted in-scan, statistics
    corpus-wide), applied to the whole batch."""
    from ..sources.manifest import resolve_root
    from .exactmath import ln_libm
    from .similarity import _apply_where

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if not (k1 > 0 and 0.0 <= b <= 1.0):
        raise ValueError(f"need k1 > 0 and 0 <= b <= 1, got k1={k1} b={b}")
    from pyspark.sql import Window

    path = resolve_root(spark, path)
    # bounded-collect: one parameter row from the index metadata
    n_buckets = int(spark.read.parquet(f"{path}/_bm25_meta").collect()[0][0])
    stats = spark.read.parquet(f"{path}/_bm25_stats")
    if before_batch is not None:
        stats = stats.filter(F.col("ingest_batch_id") < before_batch)
    # bounded-collect: the summed corpus scalars (batch-count rows)
    st = stats.agg(
        F.sum("n_docs").alias("n_docs"), F.sum("sum_dl").alias("sum_dl")
    ).collect()[0]
    if st.n_docs is None:
        raise ValueError(f"index at {path!r} holds no stats rows")
    n_docs, sum_dl = int(st.n_docs), int(st.sum_dl)

    from .text import tokens

    # bounded-collect: the query batch's (query_id, term) pairs — the
    # retrieval workload itself, needed driver-side to enumerate the
    # postings buckets the scans prune to
    from pyspark.sql.types import (
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    if weights is not None:
        # bounded-collect: the weighted workload (same contract as
        # qpairs — it IS the (query, term) enumeration); validation is
        # free here because the rows are already driver-side
        wrows = weights.select(
            F.col(query_id_col),
            F.col("term"),
            F.col("weight").cast("double"),
        ).collect()
        if not wrows:
            raise ValueError("weights relation is empty")
        seen = set()
        for r in wrows:
            # not (w > 0): catches NaN, None, and non-positives alike
            if r[2] is None or not (r[2] > 0):
                raise ValueError("weights must be positive")
            if (r[0], r[1]) in seen:
                raise ValueError("duplicate (query, term) rows in weights")
            seen.add((r[0], r[1]))
        qpairs = [(r[0], r[1]) for r in wrows]
        qid_type = weights.schema[query_id_col].dataType
    else:
        qpairs = (
            queries.select(
                F.col(query_id_col),
                F.explode(tokens(query_text_col)).alias("__tok"),
            )
            .distinct()
            # bounded-collect: workload-sized (the marker comment above)
            .collect()
        )
        qid_type = queries.schema[query_id_col].dataType
    if not qpairs:
        raise ValueError("query batch has no terms")
    terms = sorted({r[1] for r in qpairs})
    import hashlib

    buckets = sorted(
        {int(hashlib.md5(t.encode()).hexdigest()[:8], 16) % n_buckets for t in terms}
    )
    # re-created frame keeps the CALLER's query-id type — the scan-form
    # twin bm25_join is id-type-agnostic, so this must be too
    qfields = [
        StructField(query_id_col, qid_type),
        StructField("__tok", StringType()),
    ]
    if weights is not None:
        qterms = _local_rows_df(
            spark,
            [(r[0], r[1], float(r[2])) for r in wrows],
            StructType(qfields + [StructField("__w", DoubleType())]),
        )
    else:
        qterms = _local_rows_df(
            spark,
            [(r[0], r[1]) for r in qpairs], StructType(qfields)
        )
    term_filter = F.col("tok").isin(terms)
    bucket_filter = F.col("tok_bucket").isin(buckets)
    tf = (
        spark.read.parquet(f"{path}/postings")
        .filter(bucket_filter)
        .filter(term_filter)
    )
    dft = (
        spark.read.parquet(f"{path}/dft")
        .filter(bucket_filter)
        .filter(term_filter)
    )
    if before_batch is not None:
        tf = tf.filter(F.col("ingest_batch_id") < before_batch)
        dft = dft.filter(F.col("ingest_batch_id") < before_batch)
    # filtered retrieval: candidates only; df from the dft store
    # keeps collection statistics corpus-wide
    tf = _apply_where(tf, where)
    # (term, idf) broadcast literal from the |batch vocabulary|-row
    # dft merge, ln'd driver-side (same libm, bitwise — _idf_literal;
    # round 16, guide §4): no ArrowEvalPython, no broadcast-build job
    dfrows = [
        (r[0], int(r[1]))
        for r in dft.groupBy("tok").agg(F.sum("df").alias("df")).collect()
    ]
    df_t = _idf_literal(spark, dfrows, n_docs, "tok")
    base_c = (
        F.col("__idf")
        * (F.col("tf") * F.lit(float(k1) + 1.0))
        / (
            F.col("tf")
            + F.lit(float(k1))
            * (
                F.lit(1.0 - float(b))
                + F.lit(float(b))
                * F.col("dl")
                / (F.lit(float(sum_dl)) / F.lit(float(n_docs)))
            )
        )
    )
    contrib = (
        tf.join(F.broadcast(df_t), "tok")
        .join(
            F.broadcast(qterms.withColumnRenamed("__tok", "tok")), "tok"
        )
        .select(
            F.col(query_id_col),
            F.col(id_col),
            F.col("tok").alias("__tok"),
            # weighted form multiplies the whole contribution once,
            # operand-for-operand every other weighted BM25 form
            (base_c if weights is None else F.col("__w") * base_c).alias(
                "__c"
            ),
        )
    )
    scored = (
        contrib.groupBy(query_id_col, id_col)
        .agg(
            F.count(F.lit(1)).alias("n_terms_matched"),
            F.array_sort(
                F.collect_list(F.struct("__tok", "__c"))
            ).alias("__cs"),
        )
        .select(
            query_id_col,
            id_col,
            F.aggregate(
                F.col("__cs"), F.lit(0.0), lambda acc, s: acc + s["__c"]
            ).alias("score"),
            "n_terms_matched",
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def _fb_counts_from_postings(
    spark,
    path: str,
    fb_ids: list,
    id_col: str = "doc_id",
    before_batch: int | None = None,
):
    """Per-term occurrence counts of a feedback-doc set, read from the
    PERSISTED index's postings instead of corpus text — the indexed
    twin of the PRF/RM3 feedback scan: ``tf`` is already the per-(doc,
    term) occurrence count, so summing it over the feedback ids equals
    the scan form's explode-and-count exactly (integers). Cost shape:
    one postings read pruned to three columns (tok, id, tf) with the
    id filter pushed to parquet row groups — NOT bucket-pruned (a
    document's terms span all buckets; this is the classic
    inverted-index-without-forward-index trade), but it never touches
    corpus text and the output is |fb vocabulary|-bounded."""
    posts = spark.read.parquet(f"{path}/postings")
    if before_batch is not None:
        posts = posts.filter(F.col("ingest_batch_id") < before_batch)
    return (
        posts.filter(F.col(id_col).isin(fb_ids))
        .groupBy("tok")
        .agg(F.sum("tf").cast("bigint").alias("__n"))
    )


def bm25_topk_prf_indexed(
    spark,
    path: str,
    query: str,
    k: int = 10,
    fb_docs: int = 3,
    fb_terms: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    before_batch: int | None = None,
    where=None,
) -> DataFrame:
    """Two-pass PRF against a PERSISTED index — the serving form of
    :func:`bm25_topk_prf`, bitwise-equal to it (pinned): pass one is
    the bucket-pruned :func:`bm25_topk_indexed`, the feedback term
    counts come from the index's own postings
    (:func:`_fb_counts_from_postings` — tf summed over the feedback
    ids equals the scan form's explode-and-count exactly), and pass
    two probes the expanded term set. Corpus text is never read.
    ``where`` scopes both probes (the scan twin's contract);
    ``before_batch`` fences every read to the pre-append state."""
    if fb_docs < 1:
        raise ValueError(f"fb_docs must be >= 1, got {fb_docs}")
    if fb_terms < 1:
        raise ValueError(f"fb_terms must be >= 1, got {fb_terms}")
    from ..sources.manifest import resolve_root

    terms = sorted(set(query.split()))
    first = bm25_topk_indexed(
        spark, path, query, k=fb_docs, k1=k1, b=b, id_col=id_col,
        before_batch=before_batch, where=where,
    )
    # bounded-collect: fb_docs ids (pass one's TakeOrdered output)
    fb_ids = [r[0] for r in first.select(id_col).collect()]
    if not fb_ids:
        return bm25_topk_indexed(
            spark, path, query, k=k, k1=k1, b=b, id_col=id_col,
            before_batch=before_batch, where=where,
        )
    fb_counts = (
        _fb_counts_from_postings(
            spark, resolve_root(spark, path), fb_ids, id_col, before_batch
        )
        .filter(~F.col("tok").isin(terms))
        .orderBy(F.col("__n").desc(), F.col("tok").asc())
        .limit(int(fb_terms))
    )
    # bounded-collect: fb_terms rows (TakeOrdered output)
    new_terms = [r[0] for r in fb_counts.collect()]
    expanded = " ".join(sorted(set(terms) | set(new_terms)))
    return bm25_topk_indexed(
        spark, path, expanded, k=k, k1=k1, b=b, id_col=id_col,
        before_batch=before_batch, where=where,
    )


def bm25_topk_rm3_indexed(
    spark,
    path: str,
    query: str,
    k: int = 10,
    fb_docs: int = 3,
    fb_terms: int = 5,
    lam: float = 0.5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    before_batch: int | None = None,
    where=None,
) -> DataFrame:
    """Weighted RM3 against a PERSISTED index — the serving form of
    :func:`bm25_topk_rm3`, bitwise-equal to it (pinned): feedback term
    counts from the index's postings, the same truncate-then-
    renormalize weights over the kept vocabulary, and a weighted
    bucket-pruned probe (:func:`bm25_topk_indexed(weights=...)`).
    Corpus text is never read."""
    if fb_docs < 1:
        raise ValueError(f"fb_docs must be >= 1, got {fb_docs}")
    if fb_terms < 1:
        raise ValueError(f"fb_terms must be >= 1, got {fb_terms}")
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    from ..sources.manifest import resolve_root

    terms = sorted(set(query.split()))
    first = bm25_topk_indexed(
        spark, path, query, k=fb_docs, k1=k1, b=b, id_col=id_col,
        before_batch=before_batch, where=where,
    )
    # bounded-collect: fb_docs ids (pass one's TakeOrdered output)
    fb_ids = [r[0] for r in first.select(id_col).collect()]
    fb_counts: dict = {}
    if fb_ids:
        all_counts = _fb_counts_from_postings(
            spark, resolve_root(spark, path), fb_ids, id_col, before_batch
        )
        keep = (
            all_counts.filter(~F.col("tok").isin(terms))
            .orderBy(F.col("__n").desc(), F.col("tok").asc())
            .limit(int(fb_terms))
            .unionByName(all_counts.filter(F.col("tok").isin(terms)))
        )
        # bounded-collect: <= fb_terms + |q| count rows (TakeOrdered
        # union the query's own terms — the scan form's shape)
        fb_counts = {r[0]: int(r[1]) for r in keep.collect()}
    # identical weight arithmetic to rm3_expand (truncate-then-
    # renormalize over the kept vocabulary; exact integer counts)
    total_kept = sum(fb_counts.values())
    w: dict = {}
    nq = len(terms)
    for t in sorted(set(terms) | set(fb_counts)):
        w_orig = lam * (1.0 / nq) if t in terms else 0.0
        w_fb = (
            (1.0 - lam) * (fb_counts.get(t, 0) / total_kept)
            if total_kept
            else 0.0
        )
        wv = w_orig + w_fb
        if wv > 0:
            w[t] = wv
    return bm25_topk_indexed(
        spark, path, query, k=k, k1=k1, b=b, id_col=id_col,
        before_batch=before_batch, where=where, weights=w,
    )


def _collect_query_texts(queries, query_id_col, query_text_col):
    """Collect + validate a query batch (the shared front door of the
    batch feedback forms): duplicate ids collapse dict slots and NULL
    texts stringify to 'None', so both fail loudly (ADVICE r11)."""
    # bounded-collect: the query batch texts — the retrieval workload
    qrows = queries.select(
        F.col(query_id_col), F.col(query_text_col)
    ).collect()
    if not qrows:
        raise ValueError("query batch is empty")
    if len({r[0] for r in qrows}) != len(qrows):
        raise ValueError("duplicate query ids in the batch")
    for r in qrows:
        if r[1] is None or not r[1].split():
            raise ValueError(f"query {r[0]!r} has no terms")
    return {r[0]: sorted(set(r[1].split())) for r in qrows}


def _fb_counts_per_query(
    spark,
    path: str,
    fb_pairs: list,
    qid_type,
    id_type,
    id_col: str,
    query_id_col: str,
    before_batch: int | None,
):
    """Per-(query, term) feedback counts from the INDEX's postings —
    the batch twin of :func:`_fb_counts_from_postings`: one postings
    read pruned to (tok, id, tf) and the union of all queries'
    feedback ids, tf summed per (query, tok) through the broadcast
    (query, fb_doc) pair relation. Output is |Q| x |fb vocabulary|-
    bounded; corpus text is never read."""
    from pyspark.sql.types import StructField, StructType

    pair_df = _local_rows_df(
        spark,
        fb_pairs,
        StructType(
            [
                StructField(query_id_col, qid_type),
                StructField(id_col, id_type),
            ]
        ),
    )
    fb_ids = sorted({p[1] for p in fb_pairs})
    posts = spark.read.parquet(f"{path}/postings")
    if before_batch is not None:
        posts = posts.filter(F.col("ingest_batch_id") < before_batch)
    return (
        posts.filter(F.col(id_col).isin(fb_ids))
        .select(id_col, "tok", "tf")
        .join(F.broadcast(pair_df), id_col)
        .groupBy(query_id_col, F.col("tok").alias("__tok"))
        .agg(F.sum("tf").cast("bigint").alias("__n"))
    )


def bm25_join_prf_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    fb_docs: int = 3,
    fb_terms: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    query_text_col: str = "text",
    query_id_col: str = "query_id",
    before_batch: int | None = None,
    where=None,
) -> DataFrame:
    """Batch PRF against a PERSISTED index — the last PRF cell of the
    {single, batch} x {scan, indexed} matrix: pass one is ONE
    bucket-pruned :func:`bm25_join_indexed`, the per-query feedback
    term counts come from the index's own postings (one pruned read
    for the whole batch — :func:`_fb_counts_per_query`), and pass two
    probes the expanded batch. Corpus text is never read; per-query
    output is IDENTICAL to looping :func:`bm25_topk_prf_indexed`
    (pinned), which in turn equals the scan-form PRF."""
    from pyspark.sql import Window

    if fb_docs < 1:
        raise ValueError(f"fb_docs must be >= 1, got {fb_docs}")
    if fb_terms < 1:
        raise ValueError(f"fb_terms must be >= 1, got {fb_terms}")
    from pyspark.sql.types import StringType, StructField, StructType

    from ..sources.manifest import resolve_root

    orig = _collect_query_texts(queries, query_id_col, query_text_col)
    qid_type = queries.schema[query_id_col].dataType
    first = bm25_join_indexed(
        spark, path, queries, k=fb_docs, k1=k1, b=b, id_col=id_col,
        query_text_col=query_text_col, query_id_col=query_id_col,
        before_batch=before_batch, where=where,
    )
    # bounded-collect: |Q| x fb_docs feedback pairs
    fb_pairs = [(r[0], r[1]) for r in first.select(query_id_col, id_col).collect()]
    new_terms: dict = {}
    if fb_pairs:
        cur = resolve_root(spark, path)
        id_type = spark.read.parquet(f"{cur}/postings").schema[
            id_col
        ].dataType
        orig_df = _local_rows_df(
            spark,
            [(q, t) for q, ts in orig.items() for t in ts],
            StructType(
                [
                    StructField(query_id_col, qid_type),
                    StructField("__tok", StringType()),
                ]
            ),
        )
        counts = _fb_counts_per_query(
            spark, cur, fb_pairs, qid_type, id_type, id_col,
            query_id_col, before_batch,
        ).join(F.broadcast(orig_df), [query_id_col, "__tok"], "left_anti")
        w = Window.partitionBy(query_id_col).orderBy(
            F.col("__n").desc(), F.col("__tok").asc()
        )
        top = counts.withColumn("__rn", F.row_number().over(w)).filter(
            F.col("__rn") <= int(fb_terms)
        )
        # bounded-collect: |Q| x fb_terms expansion terms
        for r in top.select(query_id_col, "__tok").collect():
            new_terms.setdefault(r[0], set()).add(r[1])
    expanded = _local_rows_df(
        spark,
        [
            (q, " ".join(sorted(set(ts) | new_terms.get(q, set()))))
            for q, ts in orig.items()
        ],
        StructType(
            [
                StructField(query_id_col, qid_type),
                StructField(query_text_col, StringType()),
            ]
        ),
    )
    return bm25_join_indexed(
        spark, path, expanded, k=k, k1=k1, b=b, id_col=id_col,
        query_text_col=query_text_col, query_id_col=query_id_col,
        before_batch=before_batch, where=where,
    )


def bm25_join_rm3_indexed(
    spark,
    path: str,
    queries: DataFrame,
    k: int = 10,
    fb_docs: int = 3,
    fb_terms: int = 5,
    lam: float = 0.5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    query_text_col: str = "text",
    query_id_col: str = "query_id",
    before_batch: int | None = None,
    where=None,
) -> DataFrame:
    """Batch RM3 against a PERSISTED index — the last cell of the full
    relevance-feedback matrix ({PRF, RM3} x {single, batch} x {scan,
    indexed}): per-query RM3 weights from one pruned postings read for
    the whole batch, rescored in ONE weighted batch probe
    (:func:`bm25_join_indexed(weights=...)`). Corpus text is never
    read; per-query output is IDENTICAL to looping
    :func:`bm25_topk_rm3_indexed` (pinned), which equals the scan-form
    RM3."""
    from pyspark.sql import Window

    if fb_docs < 1:
        raise ValueError(f"fb_docs must be >= 1, got {fb_docs}")
    if fb_terms < 1:
        raise ValueError(f"fb_terms must be >= 1, got {fb_terms}")
    if not 0.0 <= lam <= 1.0:
        raise ValueError(f"lam must be in [0, 1], got {lam}")
    from pyspark.sql.types import (
        DoubleType,
        StringType,
        StructField,
        StructType,
    )

    from ..sources.manifest import resolve_root

    orig = _collect_query_texts(queries, query_id_col, query_text_col)
    qid_type = queries.schema[query_id_col].dataType
    first = bm25_join_indexed(
        spark, path, queries, k=fb_docs, k1=k1, b=b, id_col=id_col,
        query_text_col=query_text_col, query_id_col=query_id_col,
        before_batch=before_batch, where=where,
    )
    # bounded-collect: |Q| x fb_docs feedback pairs
    fb_pairs = [(r[0], r[1]) for r in first.select(query_id_col, id_col).collect()]
    fb_counts: dict = {q: {} for q in orig}
    if fb_pairs:
        cur = resolve_root(spark, path)
        id_type = spark.read.parquet(f"{cur}/postings").schema[
            id_col
        ].dataType
        orig_df = _local_rows_df(
            spark,
            [(q, t) for q, ts in orig.items() for t in ts],
            StructType(
                [
                    StructField(query_id_col, qid_type),
                    StructField("__tok", StringType()),
                ]
            ),
        )
        counts = _fb_counts_per_query(
            spark, cur, fb_pairs, qid_type, id_type, id_col,
            query_id_col, before_batch,
        )
        w = Window.partitionBy(query_id_col).orderBy(
            F.col("__n").desc(), F.col("__tok").asc()
        )
        top = (
            counts.join(
                F.broadcast(orig_df), [query_id_col, "__tok"], "left_anti"
            )
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= int(fb_terms))
            .select(query_id_col, "__tok", "__n")
        )
        own = counts.join(
            F.broadcast(orig_df), [query_id_col, "__tok"], "left_semi"
        ).select(query_id_col, "__tok", "__n")
        # bounded-collect: <= |Q| x (fb_terms + |q|) kept-count rows
        for r in top.unionByName(own).collect():
            fb_counts[r[0]][r[1]] = int(r[2])
    # identical weight arithmetic to rm3_expand / bm25_join_rm3
    wrows = []
    for q, ts in orig.items():
        counts_q = fb_counts.get(q, {})
        total_kept = sum(counts_q.values())
        nq = len(ts)
        for t in sorted(set(ts) | set(counts_q)):
            w_orig = lam * (1.0 / nq) if t in ts else 0.0
            w_fb = (
                (1.0 - lam) * (counts_q.get(t, 0) / total_kept)
                if total_kept
                else 0.0
            )
            wv = w_orig + w_fb
            if wv > 0:
                wrows.append((q, t, wv))
    wdf = _local_rows_df(
        spark,
        wrows,
        StructType(
            [
                StructField(query_id_col, qid_type),
                StructField("term", StringType()),
                StructField("weight", DoubleType()),
            ]
        ),
    )
    return bm25_join_indexed(
        spark, path, queries, k=k, k1=k1, b=b, id_col=id_col,
        query_text_col=query_text_col, query_id_col=query_id_col,
        before_batch=before_batch, where=where, weights=wdf,
    )
