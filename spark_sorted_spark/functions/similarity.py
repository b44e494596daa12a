"""Similarity search over embedding columns (``array<float>``).

* ``cosine`` — exact-order strict-fold dot product / norms, written so
  Spark's ``F.aggregate`` and DuckDB's ``list_reduce`` perform the
  identical IEEE-double operation sequence => bitwise-equal scores,
  enabling exact (no-tolerance) oracle comparison even through a
  threshold or a rank.
* ``cosine_topk`` — brute-force top-k vs a query vector: one narrow
  scan + a k-limited sort (``ORDER BY ... LIMIT k`` compiles to
  TakeOrderedAndProject — no global sort materialization).
* ``cosine_neardup_pairs`` — all-pairs cosine threshold (exact
  baseline; O(n^2) — for corpus scale, block first);
  ``cosine_neardup_pairs_lsh`` — the scale path (multi-table sign-bit
  LSH, auto-sized plane count, exact verify).
* ``ann_lsh_topk`` / ``ann_ivf_topk`` — approximate top-k: random-
  hyperplane LSH buckets (md5-seeded deterministic planes, multi-probe
  ``probe_bits`` recall knob) / inverted-file cells (seeded centroids,
  native argmax assignment). Approximate in recall, deterministic in
  output.
* ``build_ann_{lsh,ivf}_index`` + ``ann_{lsh,ivf}_topk_indexed`` —
  the repeated-query form: assignment persisted once, probes scan only
  the probed bucket/cell directories (partition-pruned). Both indexes
  grow incrementally (``append_to_ann_{lsh,ivf}_index`` — batch-
  partitioned, replay-idempotent; see also
  ``streaming.stream_index_embeddings``), and
  ``cosine_neardup_against_index`` runs incremental embedding
  near-dup of a new batch against the persisted index.
* ``ann_pq_topk`` / ``build_ann_pq_index`` / ``ann_pq_topk_indexed``
  — product quantization (Jégou et al., TPAMI 2011): seeded or
  Lloyd-trained per-subspace codebooks, native argmin encoding, ADC
  ranking whose indexed scan reads the code column only (~4 bytes per
  vector), exact ``rerank=R`` tail. ``build_ann_ivfpq_index`` /
  ``ann_ivfpq_topk_indexed`` compose IVF cell pruning with
  residual-PQ codes — the canonical billion-scale layout: a probe
  touches ``nprobe/nlist`` of the corpus at code width.

* IVF-SQ8 (round 12): IVF cells over per-vector int8 scalar-quantized
  codes (the ``quantize_embeddings`` scheme persisted as an index) —
  probes read ``(scale, codes)`` at nprobe/nlist of the corpus,
  reconstruct inline, rank by exact cosine over the reconstruction;
  no trained codebook, so appended batches quantize exactly like the
  build (the drift-free member of the quantized family).

At 100 TB the brute-force variants are per-partition narrow ops
(embarrassingly parallel); the LSH/IVF variants turn top-k per query
into a pruned scan of ~1/2^planes (resp. nprobe/nlist) of the data,
the standard trade of recall for locality.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .local_rows import local_rows_df

__all__ = [
    "dot_strict",
    "dot_py",
    "ann_ivf_topk",
    "ann_ivf_join_indexed",
    "knn_join_lsh",
    "cosine",
    "cosine_topk",
    "cosine_join",
    "cosine_neardup_pairs",
    "cosine_neardup_pairs_lsh",
    "cosine_neardup_against_index",
    "ann_lsh_topk",
    "build_ann_lsh_index",
    "append_to_ann_lsh_index",
    "append_to_ann_ivf_index",
    "ann_lsh_topk_indexed",
    "build_ann_ivf_index",
    "ann_ivf_topk_indexed",
    "pq_codebooks",
    "ann_pq_topk",
    "build_ann_pq_index",
    "append_to_ann_pq_index",
    "ann_pq_topk_indexed",
    "build_ann_ivfpq_index",
    "ann_ivfpq_topk_indexed",
    "build_ann_ivfsq8_index",
    "append_to_ann_ivfsq8_index",
    "ann_ivfsq8_topk_indexed",
    "ann_ivfsq8_join_indexed",
    "semantic_dedup",
    "quantize_embeddings",
    "dequantize_embeddings",
    "auto_planes",
    "ANN_DIM",
    "ANN_N_PLANES",
    "ANN_NLIST",
    "ANN_NPROBE",
    "ANN_PQ_M",
    "ANN_PQ_KSUB",
]

# Shared ANN configuration — single source of truth for BOTH the Spark
# implementations below and the DuckDB oracle builders in queries.py
# (which previously hard-coded n_planes/dim by convention; drifting
# them would silently desynchronize oracle and engine).
ANN_DIM = 64  # embeddings.embedding dimension (driver tables, FIXTURES.md)
ANN_N_PLANES = 8  # sign-bit planes for the single-table top-k LSH
ANN_NLIST = 16  # IVF centroid count
ANN_NPROBE = 4  # IVF cells probed per query


def _to_double(arr: Column) -> Column:
    return F.transform(arr, lambda x: x.cast("double"))


def dot_strict(a: Column, b: Column) -> Column:
    """Strict left-fold dot product in double precision:
    ``fold(0.0, zip_with(a, b, *), +)`` — mirrors DuckDB
    ``list_reduce(list_prepend(0.0, list_transform(list_zip(a, b),
    s -> s[1]*s[2])), (acc, x) -> acc + x)`` operation for operation.

    (Measured dead ends, do not retry:
    1. unrolling literal-plane dots into flat ``v[0]*p0 + v[1]*p1 +
       ...`` chains to dodge the interpreted higher-order ``aggregate``
       blows janino's method-size limit at 32 planes x 64 dims —
       codegen falls back to interpreted for the whole projection and
       runs ~4x SLOWER than these folds.
    2. a vectorized numpy pandas-UDF screen in front of the LSH
       verify's exact fold (screen at threshold-1e-9, exact fold only
       on survivors): at 64 dims the Arrow round-trip of both
       embeddings costs ~2.5x MORE than just exact-folding all 250k
       sf0.1 candidates across cores (3.3s vs 1.3s measured r5). Also
       note Catalyst pushes a separate non-UDF exact filter BELOW the
       ArrowEvalPython node, silently re-folding every candidate — any
       future two-phase verify must guard the exact predicate inside
       one ``F.when(screen, exact)`` filter. Revisit only if embedding
       dim grows ~16x, where the fold/transfer ratio flips.)"""
    prods = F.zip_with(_to_double(a), _to_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    return dot_strict(a, b) / (
        F.sqrt(dot_strict(a, a)) * F.sqrt(dot_strict(b, b))
    )


def _vec_lit(vec) -> Column:
    """One query vector as ONE constant-folded literal (the
    `_planes_lit` trick applied to a single vector): json round-trips
    float64 exactly, and from_json of a Literal folds to a plain
    array value — vs ~dim inlined F.lit() nodes whose py4j
    construction costs real driver wall-clock per call."""
    import json

    return F.from_json(
        F.lit(json.dumps([float(x) for x in vec])), "array<double>"
    )


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine vs a literal query vector. Ties broken by
    id for determinism. Returns (id, rank, cos)."""
    q = _vec_lit(query_vec)
    scored = df.select(
        F.col(id_col), cosine(F.col(vec_col), q).alias("cos")
    )
    return (
        scored.orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
        .select(
            F.col(id_col),
            F.row_number()
            .over(Window.orderBy(F.col("cos").desc(), F.col(id_col).asc()))
            .alias("rank"),
            "cos",
        )
    )


def cosine_join(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact batch top-``k`` by cosine — the R-S form of
    :func:`cosine_topk`: score EVERY query vector of ``queries``
    against ``embeddings`` in one job and keep each query's top ``k``.
    Returns ``(query_id, id, cos, rank)`` with rank 1..k per query
    (cos DESC, id tiebreak — the identical strict-fold doubles as the
    single-query form, so the order is bitwise-reproducible).

    Scale shape: ONE corpus scan regardless of |queries| — the query
    batch rides along as a broadcast, so the |queries| x N candidate
    stream is generated executor-side with no shuffle before the
    per-query window. This is the honest exact DEFINITIONAL form
    (dense scoring has no sparsity to prune); the 100 TB path is
    :func:`ann_ivf_join_indexed`, which reads only probed cells."""
    from pyspark.sql import Window

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    q = queries.select(
        F.col(query_id_col),
        F.col(query_vec_col).cast("array<double>").alias("__qv"),
    )
    # declared-crossjoin: corpus x broadcast QUERY BATCH — the batch
    # is the retrieval workload (bounded), not a second corpus; the
    # product is the definitional exact score relation itself
    scored = embeddings.crossJoin(F.broadcast(q)).select(
        F.col(query_id_col),
        F.col(id_col),
        cosine(F.col(vec_col), F.col("__qv")).alias("cos"),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All-pairs cosine >= threshold (ids only — the threshold compare
    happens on bitwise-identical doubles, so the output is exact).
    Exact O(n^2) baseline; block or LSH-bucket first at scale."""
    a = df.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("emb_a"))
    b = df.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("emb_b"))
    # declared-crossjoin: the O(n^2) ORACLE BASELINE this module
    # documents; the gated scale path is cosine_neardup_pairs_lsh
    return (
        a.crossJoin(b)
        .filter(F.col("vec_a") < F.col("vec_b"))
        .withColumn("cos", cosine(F.col("emb_a"), F.col("emb_b")))
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b")
    )


def dot_py(a, b) -> float:
    """Driver-side strict left-fold dot product — the same IEEE
    operation sequence as ``dot_strict`` / DuckDB ``list_reduce``
    (``((0.0 + a0*b0) + a1*b1) + ...``), so driver-computed sign bits
    and probe orderings are bitwise-consistent with the engine-side
    folds. numpy's pairwise summation would not be. Fails fast on a
    dimension mismatch (zip would silently truncate)."""
    if len(a) != len(b):
        raise ValueError(f"dot_py dimension mismatch: {len(a)} vs {len(b)}")
    acc = 0.0
    for x, y in zip(a, b):
        acc += float(x) * float(y)
    return acc


def _hyperplane(plane: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component in [-1, 1):
    derived from md5 so any engine can recompute it. (Python-side
    constant generation — the literals are embedded in the plan.)"""
    import hashlib

    out = []
    for d in range(dim):
        h = int(hashlib.md5(f"plane{plane}-{d}".encode()).hexdigest()[:8], 16)
        out.append((h % 2001 - 1000) / 1000.0)
    return out


def _planes_lit(planes: list[list[float]]) -> Column:
    """Plane matrix as ONE constant-folded literal (from_json of a
    Literal folds to a plain array value in the optimizer) instead of
    len(planes)*dim inlined F.lit() nodes — the inlined tree costs
    whole seconds of py4j DataFrame construction per call at LSH sizes
    (measured r6: 70% of b13's wall-clock). json round-trips float64
    exactly, so the worker-side math is unchanged."""
    import json

    return F.from_json(F.lit(json.dumps(planes)), "array<array<double>>")


def _dot_dbl(a: Column, b: Column) -> Column:
    """dot_strict minus the per-element float->double cast transforms —
    callers pass arrays that are already double. Same products, same
    left-fold order: bitwise-equal to dot_strict."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _sign_bucket_col(vec: Column, planes: list[list[float]]) -> Column:
    """Engine-side sign-bit bucket of ``vec`` under seeded hyperplanes
    (strict-fold dots — bitwise-equal to the oracle's). bits and pow2
    are zipped BEFORE the fold so the plane-dot transform is evaluated
    once (element_at into a transform expression would re-evaluate it
    per lookup — interpreted HOFs have no CSE inside lambdas)."""
    vd = vec.cast("array<double>")
    bits = F.transform(
        _planes_lit(planes), lambda p: F.when(_dot_dbl(vd, p) >= 0, 1).otherwise(0)
    )
    pow2 = F.array(*[F.lit(1 << p) for p in range(len(planes))])
    return F.aggregate(
        F.zip_with(bits, pow2, lambda b, w: b * w),
        F.lit(0),
        lambda acc, x: acc + x,
    )


def _sign_bucket_bits(query_vec: list[float], planes: list[list[float]]) -> int:
    """Driver-side bucket of a query vector — same fold as the engine."""
    qbits = 0
    for p, plane in enumerate(planes):
        if dot_py(query_vec, plane) >= 0:
            qbits |= 1 << p
    return qbits


def _rank_topk(bucketed: DataFrame, query_vec, k: int, vec_col: str, id_col: str):
    q = _vec_lit(query_vec)
    return (
        bucketed.withColumn("cos", cosine(F.col(vec_col), q))
        .orderBy(F.col("cos").desc(), F.col(id_col).asc())
        .limit(k)
        .select(
            F.col(id_col),
            F.row_number()
            .over(Window.orderBy(F.col("cos").desc(), F.col(id_col).asc()))
            .alias("rank"),
            "cos",
        )
    )


def _multiprobe_buckets(
    query_vec: list[float],
    planes: list[list[float]],
    probe_bits: int,
    probe_hamming: int = 1,
) -> list[int]:
    """Multi-probe bucket list: the query's own bucket plus the buckets
    reached by flipping each of the ``probe_bits`` LEAST-CONFIDENT sign
    bits (planes whose dot with the query is closest to 0 — the
    standard multi-probe LSH heuristic: a near neighbor most likely
    disagrees on exactly those). ``probe_hamming=2`` also probes every
    PAIR flip among those planes (1 + m + C(m,2) buckets): measured on
    clustered data this is what lifts sign-LSH recall@10 from ~0.6 to
    >0.9 at m=6 (tools/ann_recall.py; PARITY.md "ANN recall") — a near
    neighbor of a query sitting near TWO plane boundaries disagrees on
    both. Deterministic: |dot| ties break on plane index."""
    if probe_hamming not in (1, 2):
        raise ValueError(f"probe_hamming must be 1 or 2, got {probe_hamming}")
    qbits = _sign_bucket_bits(query_vec, planes)
    confidence = sorted(
        range(len(planes)), key=lambda p: (abs(dot_py(query_vec, planes[p])), p)
    )
    flip = confidence[:probe_bits]
    probes = [qbits] + [qbits ^ (1 << p) for p in flip]
    if probe_hamming == 2:
        probes += [
            qbits ^ (1 << flip[i]) ^ (1 << flip[j])
            for i in range(len(flip))
            for j in range(i + 1, len(flip))
        ]
    return probes


def ann_lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = ANN_N_PLANES,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_bits: int = 0,
    probe_hamming: int = 1,
) -> DataFrame:
    """Approximate top-k: 8 random-hyperplane sign bits -> 256 buckets;
    rank by exact cosine within the probed buckets. Deterministic
    (seeded hyperplanes). ``probe_bits`` is the recall knob: 0 probes
    only the query's bucket; m probes m extra buckets at one-bit flips
    of the least-confident planes (candidate set grows ~(m+1)x, recall
    rises accordingly — measured in tests). ``probe_hamming=2`` adds
    the pair flips among those m planes — required to reach
    recall@10 >= 0.9 on clustered corpora (see
    :func:`_multiprobe_buckets` and PARITY.md "ANN recall"; on
    isotropic data recall ~= scanned fraction for ANY setting — an
    information-theoretic property of the data, not a knob problem).

    This form assigns buckets AT QUERY TIME (a full scan) — fine for
    one-off queries; for repeated queries over a large corpus, build
    the assignment once with :func:`build_ann_lsh_index` and probe it
    with :func:`ann_lsh_topk_indexed` (partition-pruned scan of the
    probed bucket directories)."""
    dim = len(query_vec)
    planes = [_hyperplane(p, dim) for p in range(n_planes)]
    probes = _multiprobe_buckets(query_vec, planes, probe_bits, probe_hamming)
    bucketed = df.select(
        F.col(id_col),
        F.col(vec_col),
        _sign_bucket_col(F.col(vec_col), planes).alias("bucket"),
    ).filter(F.col("bucket").isin(probes))
    return _rank_topk(bucketed, query_vec, k, vec_col, id_col)


def build_ann_lsh_index(
    df: DataFrame,
    path: str,
    n_planes: int | None = ANN_N_PLANES,
    dim: int = ANN_DIM,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    target_bucket: int = 128,
    commit: str = "rename",
) -> None:
    """Compute each vector's sign-bit bucket ONCE and persist the
    assignment directory-partitioned by ``bucket``. The build is one
    narrow scan (no shuffle — ``partitionBy`` splits files per task);
    afterwards every probe reads only its own bucket's directory
    (``PartitionFilters`` pruning — pinned in tests/test_plans.py).
    At 100 TB this turns per-query cost from O(corpus) bucket
    assignment into O(corpus / 2^n_planes) — the persist-the-index
    shape the query-time form documents.

    Layout v2 (round 8): batch-partitioned like the MinHash band
    store — the build writes base partition ``ingest_batch_id=-1``;
    :func:`append_to_ann_lsh_index` adds later corpus batches in
    their own partitions (idempotent when ``batch_id`` is set).
    Probes read the whole index; bucket pruning still applies (the
    bucket directory level is inside each batch partition).

    The build also persists its construction parameters at
    ``{path}/_lsh_meta`` (underscore — hidden from the partitioned
    read, the IVF ``_centroids`` pattern): appends/probes/dedup reads
    default to the RECORDED ``n_planes``/``dim`` and RAISE on an
    explicit mismatch — without the metadata, a probe with the wrong
    plane count silently computes garbage buckets and returns
    empty/wrong neighbors with no error.

    STORAGE CONTRACT (``commit=``): the default ``"rename"`` publish
    stages to a sibling dir and swaps via ``FileSystem.rename`` —
    atomic on HDFS and local filesystems, NOT on S3-style object
    stores (directory rename there is per-object copy+delete; a crash
    or reader mid-swap sees a torn index). On object stores pass
    ``commit="manifest"``: the index is written to a fresh
    ``{path}/gen-{k}`` generation and published by writing the small
    ``{path}/_current`` pointer LAST (one atomic PUT) — see
    ``sources/manifest.py``. Appends and probes resolve the pointer
    transparently, on both layouts."""
    from ..sources.bucketed import write_partitioned
    from ..sources.manifest import begin_generation, commit_generation
    from .dedup import _rm_dir, spread_small_input

    if commit not in ("rename", "manifest"):
        raise ValueError(f"commit must be 'rename' or 'manifest', got {commit!r}")

    # a build is a FRESH index, replacing any prior batch partitions
    # (or overwrite would leave stale appends beside the new base).
    # The replacement is STAGED: the new assignment is written to a
    # sibling ``{path}.building`` dir and swapped in only after the
    # build's plan has fully executed — so a rebuild whose input ``df``
    # READS the live index (the rebuild/compaction flow streaming/
    # ann.py recommends: the index holds id+embedding) scans the old
    # copy intact. An eager pre-delete here would destroy the only
    # copy before the lazy write ever ran (ADVICE r8), and it also
    # bypassed Spark's own cannot-read-and-overwrite-same-path check.
    spark = df.sparkSession
    _check_corpus_dim(df, vec_col, dim, "build_ann_lsh_index")
    # n_planes=None derives the depth from the corpus count (the
    # auto_planes rule — a fixed depth is the measured quadratic at
    # 10x); the persisted _lsh_meta then makes the choice sticky for
    # every append/probe. The default stays the shared constant so the
    # oracle-gated queries keep a bucket space DuckDB can replay from
    # the same constant.
    #
    # target_bucket defaults to 128 here — FOUR TIMES the multi-table
    # constructions' 32 — because this store is SINGLE-table: with no
    # OR-construction, every extra plane multiplies per-pair recall at
    # a given cosine by p_plane < 1 uncompensated, and the per-vector
    # candidate budget of the multi-table forms (n_tables x 32 = 256)
    # affords one table a fatter bucket. Adjudicated round 12 (PARITY
    # "b27 auto-depth"): at 20k vectors the old target-32 auto depth
    # (9) was SLOWER than depth 8 (7.93 vs 7.17 s min-of-3) AND found
    # 37% fewer pairs (888 vs 1405) — the cost at this corpus size is
    # 2^planes directory/file bookkeeping, not candidate volume; the
    # target-128 depth (7) measured 4.42 s with 2165 pairs. Depth
    # still grows with log2(n), so the verify stays linear-in-batch at
    # the 100 TB design point.
    if n_planes is None:
        n_planes = auto_planes(df.count(), target_bucket)
    if commit == "manifest":
        staging = begin_generation(spark, path)
    else:
        staging = f"{path}.building"
        _rm_dir(spark, staging)  # stale staging from a crashed build
    df = spread_small_input(df)
    planes = [_hyperplane(p, dim) for p in range(n_planes)]
    assigned = df.select(
        F.col(id_col),
        _dim_guard_col(F.col(vec_col), dim, "build_ann_lsh_index").alias(
            vec_col
        ),
        _sign_bucket_col(F.col(vec_col), planes).alias("bucket"),
    )
    write_partitioned(assigned, f"{staging}/ingest_batch_id=-1", "bucket")
    # occupancy side table (VERDICT r14 item 2): counted from a
    # read-back of the partition just written — bucket is the
    # directory name, so the aggregate reads no data columns
    _write_occ_counts(
        _occ_read_back(spark, f"{staging}/ingest_batch_id=-1", "bucket"),
        "bucket",
        staging,
        -1,
        "overwrite",
    )
    local_rows_df(
        spark,
        [(int(n_planes), int(dim))], "n_planes int, dim int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{staging}/_lsh_meta")
    if commit == "manifest":
        commit_generation(spark, path, staging)
    else:
        _publish_index(spark, staging, path)


def _resolve_lsh_params(
    spark, path: str, n_planes: int | None, dim: int | None, caller: str
) -> tuple[int, int]:
    """Resolve (n_planes, dim) against the index's persisted
    ``_lsh_meta``: explicit args must MATCH the recorded construction
    (a mismatch means garbage buckets — raise); ``None`` adopts the
    recorded values; a pre-metadata index falls back to the shared
    ANN constants, as before."""
    from pyspark.errors import AnalysisException

    try:
        # bounded-collect: one parameter row from the index metadata
        meta = spark.read.parquet(f"{path}/_lsh_meta").collect()
    except AnalysisException:
        meta = []
    if meta:
        mp, md = int(meta[0].n_planes), int(meta[0].dim)
        if n_planes is not None and n_planes != mp:
            raise ValueError(
                f"{caller}: index at {path!r} was built with "
                f"n_planes={mp}, got n_planes={n_planes} — mismatched "
                "planes bucket silently wrong; pass None to adopt the "
                "recorded construction"
            )
        if dim is not None and dim != md:
            raise ValueError(
                f"{caller}: index at {path!r} was built with dim={md}, "
                f"got dim={dim}"
            )
        return mp, md
    return (
        ANN_N_PLANES if n_planes is None else n_planes,
        ANN_DIM if dim is None else dim,
    )


def _publish_index(spark, staged: str, path: str) -> None:
    """Swap a fully-written staged index directory into the live
    ``path``: rename-aside → rename-in → delete-old-last (the
    crash-atomic ``_swap_in`` protocol the sketch/band-store compactors
    use; every crash point leaves a complete copy either live or at
    ``{path}.old``). A fresh build (no live dir) is a single rename."""
    from .dedup import _rename, _swap_in

    jvm = spark.sparkContext._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    if fs.exists(hpath):
        _swap_in(spark, staged, path, path)
    else:
        _rename(spark, staged, path)


def append_to_ann_lsh_index(
    df: DataFrame,
    path: str,
    batch_id: int | None = None,
    n_planes: int | None = None,
    dim: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Add a corpus batch to a persisted LSH index WITHOUT touching
    the existing assignments — the growing-corpus maintenance path: at
    100 TB, re-running :func:`build_ann_lsh_index` per nightly batch
    would re-scan and re-write the whole corpus for vectors whose
    buckets never change (the planes are seeded constants).

    Same idempotency contract as ``append_to_minhash_band_store``:
    with ``batch_id`` set, the batch lands in its own
    ``ingest_batch_id={batch_id}`` partition with overwrite semantics
    — a streaming replay replaces its earlier partial write instead
    of duplicating vectors (duplicated index rows would surface as
    duplicate candidates and corrupt ranks). Without it, rows append
    to the base partition (plain at-least-once).

    Probes (:func:`ann_lsh_topk_indexed`) need no change: partition
    discovery surfaces all batches, bucket pruning applies within
    each."""
    from ..sources.bucketed import write_partitioned
    from .dedup import spread_small_input

    if batch_id is not None and batch_id < 0:
        raise ValueError(
            f"batch_id must be >= 0, got {batch_id}: negative ids are "
            "reserved (ingest_batch_id=-1 is the base partition the "
            "build wrote — overwriting it would replace the whole base "
            "corpus assignment with one batch)"
        )
    from ..sources.manifest import resolve_root

    # manifest-committed index: the append mutates the CURRENT
    # generation in place (partition-level overwrite — same replay
    # contract as the legacy layout)
    path = resolve_root(df.sparkSession, path)
    n_planes, dim = _resolve_lsh_params(
        df.sparkSession, path, n_planes, dim, "append_to_ann_lsh_index"
    )
    df = spread_small_input(df)
    planes = [_hyperplane(p, dim) for p in range(n_planes)]
    assigned = df.select(
        F.col(id_col),
        _dim_guard_col(
            F.col(vec_col), dim, "append_to_ann_lsh_index"
        ).alias(vec_col),
        _sign_bucket_col(F.col(vec_col), planes).alias("bucket"),
    )
    part = -1 if batch_id is None else batch_id
    mode = "append" if batch_id is None else "overwrite"
    if mode == "overwrite":
        _invalidate_occ_counts(df.sparkSession, path, part)
    write_partitioned(
        assigned, f"{path}/ingest_batch_id={part}", "bucket", mode=mode
    )
    # occupancy delta for this batch (VERDICT r14 item 2): read-back
    # for batch-keyed writes, the assignment frame for base appends
    _append_occ_counts(assigned, "bucket", path, part, mode)


def ann_lsh_topk_indexed(
    spark,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_bits: int = 0,
    probe_hamming: int = 1,
    before_batch: int | None = None,
) -> DataFrame:
    """Probe a persisted LSH index (:func:`build_ann_lsh_index`):
    compute the probed buckets driver-side (query bucket + one/two-bit
    flips of the ``probe_bits`` least-confident planes, see
    :func:`_multiprobe_buckets`), scan ONLY those bucket directories
    (partition-pruned), rank by exact cosine. Output is identical to
    ``ann_lsh_topk`` with the same probe settings on the same data
    (same planes, same folds). ``before_batch`` fences the read to
    earlier batch partitions (see :func:`_before_batch`)."""
    from ..sources.manifest import resolve_root

    index_path = resolve_root(spark, index_path)
    dim = len(query_vec)
    n_planes, _ = _resolve_lsh_params(
        spark, index_path, n_planes, dim, "ann_lsh_topk_indexed"
    )
    planes = [_hyperplane(p, dim) for p in range(n_planes)]
    probes = _multiprobe_buckets(query_vec, planes, probe_bits, probe_hamming)
    idx = _before_batch(spark.read.parquet(index_path), before_batch)
    bucketed = idx.filter(F.col("bucket").isin(probes))
    return _rank_topk(bucketed, query_vec, k, vec_col, id_col)


def _ivf_centroids(
    df: DataFrame, nlist: int, vec_col: str, id_col: str
) -> list[tuple]:
    """Deterministic centroid pick: the ``nlist`` vectors with the
    smallest ``(md5(id), id)`` — a seeded sample, no training loop.
    Bounded ``nlist``-row collect after TakeOrdered (not a data-flow
    collect)."""
    # bounded-collect: nlist centroid seed rows (limit above)
    return [
        (r[0], [float(x) for x in r[1]])
        for r in df.select(F.col(id_col), F.col(vec_col))
        .orderBy(F.md5(F.col(id_col).cast("string")), F.col(id_col))
        .limit(nlist)
        .collect()
    ]


def _ivf_cell_col(vec: Column, cents: list[tuple]) -> Column:
    """Nearest-by-dot centroid as a native argmax: struct ordering
    compares fields in order, so the array_min of (-dot, idx) structs
    is the deterministic argmax with lowest-cell tiebreak — no Python
    in the scan. Centroids ride in as one constant-folded literal
    (_planes_lit) — the nlist*dim inlined-F.lit tree costs ~1 s of
    py4j construction per call (the b13 lesson, r6)."""
    vd = vec.cast("array<double>")
    cents_lit = _planes_lit([c for _cid, c in cents])
    idxs = F.sequence(F.lit(0), F.lit(len(cents) - 1))
    scored = F.zip_with(
        cents_lit,
        idxs,
        lambda c, i: F.struct((-_dot_dbl(vd, c)).alias("nd"), i.alias("cell")),
    )
    return F.array_min(scored)["cell"]


def _ivf_probe_cells_col(vec: Column, cents: list[tuple], nprobe: int) -> Column:
    """The ``nprobe`` nearest-by-dot cells of every row as a native
    array — the batch generalization of the driver-side
    :func:`_ivf_probe_cells` (same rule: dot DESC, lowest cell
    tiebreak; struct ``(-dot, cell)`` ascending sort replays it
    exactly). No Python in the scan; centroids ride in as one
    constant-folded literal like :func:`_ivf_cell_col`."""
    vd = vec.cast("array<double>")
    cents_lit = _planes_lit([c for _cid, c in cents])
    idxs = F.sequence(F.lit(0), F.lit(len(cents) - 1))
    scored = F.zip_with(
        cents_lit,
        idxs,
        lambda c, i: F.struct((-_dot_dbl(vd, c)).alias("nd"), i.alias("cell")),
    )
    return F.transform(
        F.slice(F.array_sort(scored), 1, min(nprobe, len(cents))),
        lambda s: s["cell"],
    )


def _lloyd_refine(
    df: DataFrame, cents: list[tuple], iters: int, vec_col: str
) -> list[tuple]:
    """Refine centroids with ``iters`` Lloyd (k-means) steps: assign
    every vector to its nearest current centroid (the same native
    argmax the index build uses), element-wise-average per cell, and
    collect the bounded nlist-row means as the new centroids. A cell
    that captures no vectors keeps its previous centroid (standard
    empty-cluster handling). Cost: one assign shuffle per iteration;
    the collect is nlist rows — bounded metadata, like the seeded
    pick.

    Note on determinism: the per-cell averages are float sums over
    partition-dependent order, so refined centroids can differ in
    final bits across runs. The PERSISTED index is the reproducible
    artifact (assignments are written once); rebuilds may place
    borderline vectors differently — same recall, not bitwise-same
    cells. The seeded pick (``lloyd_iters=0``) stays the fully
    deterministic default."""
    dim = len(cents[0][1])
    for _ in range(iters):
        assigned = df.select(
            F.col(vec_col).alias("__v"),
            _ivf_cell_col(F.col(vec_col), cents).alias("__cell"),
        )
        # bounded-collect: nlist mean rows (one per IVF cell)
        means = assigned.groupBy("__cell").agg(
            *[
                F.avg(F.col("__v")[i].cast("double")).alias(f"m{i}")
                for i in range(dim)
            ]
        ).collect()
        new = {
            r["__cell"]: [float(r[f"m{i}"]) for i in range(dim)]
            for r in means
        }
        cents = [
            (cid, new.get(i, vec)) for i, (cid, vec) in enumerate(cents)
        ]
    return cents


_RESERVED_INDEX_COLS = ("cell", "code", "bucket", "t", "ingest_batch_id")

# SQ8 layout columns — reserved ONLY for the IVF-SQ8 build/append
# (a pre-existing IVF/LSH index with a user extra named "scale" keeps
# working; reserving these repo-wide would make its appends silently
# drop the column)
_SQ8_RESERVED_COLS = ("scale", "codes")


def _check_extra_cols(extra_cols, id_col: str, vec_col: str) -> None:
    bad = [
        c
        for c in extra_cols
        if c in _RESERVED_INDEX_COLS or c in (id_col, vec_col)
    ]
    if bad:
        raise ValueError(
            f"extra_cols {bad} collide with index layout columns "
            f"({_RESERVED_INDEX_COLS + (id_col, vec_col)})"
        )


def _index_extra_cols(idx: DataFrame, id_col: str, vec_col: str) -> list[str]:
    """The metadata columns a persisted index carries beyond its
    layout columns — appends introspect these so extras flow through
    without a parameter (and a batch MISSING one fails loudly at the
    select instead of writing silent nulls)."""
    return [
        c
        for c in idx.columns
        if c not in _RESERVED_INDEX_COLS and c not in (id_col, vec_col)
    ]


def _apply_where(df: DataFrame, where) -> DataFrame:
    """Pre-filter semantics for indexed probes: the predicate runs
    INSIDE the pruned scan (an ordinary Catalyst pushdown over the
    index's stored metadata columns), so ranking only ever sees rows
    that qualify — top-k OF the filtered set, not a filtered top-k.
    Accepts a SQL string or a Column; None is a no-op."""
    if where is None:
        return df
    return df.filter(F.expr(where) if isinstance(where, str) else where)


def _before_batch(df: DataFrame, before_batch) -> DataFrame:
    """Replay-fence read for batch-partitioned indexes: restrict the
    probe to partitions written BEFORE the given ingest batch id —
    the same time-travel contract as the BM25 probes' ``before_batch``
    (the base partition is ``-1``, so any fence >= 0 includes the
    build). Planning-time partition pruning, like every batch-id
    filter in the repo."""
    if before_batch is None:
        return df
    return df.filter(F.col("ingest_batch_id") < int(before_batch))


def _ivf_probe_cells(query_vec, cents: list[tuple], nprobe: int) -> list[int]:
    order = sorted(
        range(len(cents)), key=lambda i: (-dot_py(query_vec, cents[i][1]), i)
    )
    return order[:nprobe]


def ann_ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nlist: int = ANN_NLIST,
    nprobe: int = ANN_NPROBE,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    lloyd_iters: int = 0,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k — the other standard scale
    path next to LSH. ``nlist`` centroids are picked deterministically
    (the vectors with the smallest ``md5(id)`` — a seeded sample, no
    training loop); every vector is assigned to its nearest centroid
    with a native argmax over ``nlist`` strict-fold dot products
    (array-of-structs min — no Python in the scan); the query probes
    its ``nprobe`` nearest cells and ranks by exact cosine inside them.

    This form assigns cells AT QUERY TIME (a full scan); for repeated
    queries build the assignment once with :func:`build_ann_ivf_index`
    and probe via :func:`ann_ivf_topk_indexed` — per-query cost is then
    ``nprobe/nlist`` of the data (partition-pruned), embarrassingly
    parallel. Driver-side work is ``nlist`` centroid vectors —
    constants in the plan, not a data-flow collect.
    """
    cents = _ivf_centroids(df, nlist, vec_col, id_col)
    if lloyd_iters and cents:
        # same refinement the index build offers (one assign shuffle
        # per iteration); on clustered corpora this lifts probe recall
        # to ~1.0 at the default nprobe (tools/ann_recall.py)
        cents = _lloyd_refine(df, cents, lloyd_iters, vec_col)
    probe = _ivf_probe_cells(query_vec, cents, nprobe)
    celled = df.select(
        F.col(id_col), F.col(vec_col), _ivf_cell_col(F.col(vec_col), cents).alias("cell")
    ).filter(F.col("cell").isin(probe))
    return _rank_topk(celled, query_vec, k, vec_col, id_col)


def build_ann_ivf_index(
    df: DataFrame,
    path: str,
    nlist: int | None = ANN_NLIST,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    lloyd_iters: int = 0,
    commit: str = "rename",
    extra_cols: tuple[str, ...] = (),
    target_cell: int = 256,
) -> None:
    """Pick centroids and assign every vector to its cell ONCE; persist
    the assignment directory-partitioned by ``cell`` plus the centroid
    table under ``<path>/_centroids`` (underscore-prefixed → invisible
    to the partitioned read). Probes then scan only their ``nprobe``
    cell directories.

    ``lloyd_iters`` > 0 refines the seeded centroid pick with that
    many k-means steps before the final assignment (see
    :func:`_lloyd_refine`): cells then track the data's actual
    cluster structure, which evens out cell sizes and improves
    probe recall at the cost of one assign shuffle per iteration.
    2-3 iterations capture most of the benefit; the refined
    centroids' ``cent_id`` keeps the seed vector's id as
    provenance.

    Layout v2 (round 8): batch-partitioned like the LSH index —
    base partition ``ingest_batch_id=-1``;
    :func:`append_to_ann_ivf_index` assigns later batches to the
    PERSISTED centroids in their own partitions. The centroid table
    stays at ``<path>/_centroids`` (underscore → hidden from the
    partitioned read).

    ``commit``: same storage contract as :func:`build_ann_lsh_index` —
    ``"rename"`` (default; atomic on HDFS/local only) or
    ``"manifest"`` (generation + pointer; the object-store-safe
    publish, see ``sources/manifest.py``).

    ``extra_cols`` stores passthrough METADATA columns in the index
    rows (source, label, license, date, ...) — the filtered-ANN
    enabler: a probe's ``where`` predicate then evaluates inside the
    pruned scan as an ordinary parquet pushdown instead of a
    post-hoc join against a metadata table. Appends introspect the
    persisted schema and carry the same columns (or fail loudly)."""
    from ..sources.bucketed import write_partitioned
    from ..sources.manifest import begin_generation, commit_generation
    from .dedup import _rm_dir, spread_small_input

    if lloyd_iters < 0:
        raise ValueError(f"lloyd_iters must be >= 0, got {lloyd_iters}")
    if commit not in ("rename", "manifest"):
        raise ValueError(f"commit must be 'rename' or 'manifest', got {commit!r}")
    _check_extra_cols(extra_cols, id_col, vec_col)
    if nlist is None:
        # auto-size cells from the corpus count (ceil(n/target_cell) —
        # the semantic_dedup rule; PARITY scale rows: fixed cells make
        # probe candidate sets grow linearly with the corpus, auto
        # keeps expected occupancy ~target_cell). The DEFAULT stays
        # the fixed constant so gated constructions remain
        # oracle-replayable; pass None at scale.
        nlist = max(1, -(-df.count() // int(target_cell)))
    cents = _ivf_centroids(df, nlist, vec_col, id_col)
    if lloyd_iters and cents:
        cents = _lloyd_refine(df, cents, lloyd_iters, vec_col)
    if cents:
        # the write-path guard below adopts the SEEDED CENTROID's
        # length as the declared dim; if the seeded pick sampled a
        # minority wrong-length row of a mixed-dim corpus, that guard
        # would fire on the MAJORITY rows with a misleading "declared
        # dim" naming the minority length (ADVICE r14). Cross-check
        # one corpus row against the centroid dim up front so the
        # loud failure names both lengths (cosmetic — the build fails
        # loudly either way).
        _check_corpus_dim(
            df, vec_col, len(cents[0][1]), "build_ann_ivf_index"
        )
    spark = df.sparkSession
    # staged rebuild, same rationale as build_ann_lsh_index: the input
    # may READ the live index (rebuild-from-index flow), so the old
    # copy must survive until the new assignment is fully written
    if commit == "manifest":
        staging = begin_generation(spark, path)
    else:
        staging = f"{path}.building"
        _rm_dir(spark, staging)  # stale staging from a crashed build
    df = spread_small_input(df)
    vcol = (
        _dim_guard_col(
            F.col(vec_col), len(cents[0][1]), "build_ann_ivf_index"
        ).alias(vec_col)
        if cents
        else F.col(vec_col)
    )
    celled = df.select(
        F.col(id_col),
        vcol,
        _ivf_cell_col(F.col(vec_col), cents).alias("cell"),
        *[F.col(c) for c in extra_cols],
    )
    write_partitioned(celled, f"{staging}/ingest_batch_id=-1", "cell")
    # occupancy side table (VERDICT r14 item 2): read-back of the
    # partition just written — cell is the directory name, no data
    # columns touched
    _write_occ_counts(
        _occ_read_back(spark, f"{staging}/ingest_batch_id=-1", "cell"),
        "cell",
        staging,
        -1,
        "overwrite",
    )
    cent_rows = [(i, cid, vec) for i, (cid, vec) in enumerate(cents)]
    local_rows_df(
        spark,
        cent_rows, "cell int, cent_id bigint, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{staging}/_centroids")
    if commit == "manifest":
        commit_generation(spark, path, staging)
    else:
        _publish_index(spark, staging, path)


def append_to_ann_ivf_index(
    df: DataFrame,
    path: str,
    batch_id: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Assign a new corpus batch to a persisted IVF index's EXISTING
    centroids (read back from ``<path>/_centroids``) and land it in
    its own batch partition — the growing-corpus path that skips both
    the centroid pick and the full-corpus re-assignment. Centroids
    intentionally do NOT move on append (the standard IVF trade-off:
    quantization drifts as the corpus grows; rebuild with
    ``lloyd_iters`` when cell-size skew warrants it).

    Same idempotency contract as the LSH twin: ``batch_id`` set →
    overwrite-own-partition (replay-safe); unset → at-least-once
    append to the base partition."""
    from ..sources.bucketed import write_partitioned
    from ..sources.manifest import resolve_root
    from .dedup import spread_small_input

    if batch_id is not None and batch_id < 0:
        raise ValueError(
            f"batch_id must be >= 0, got {batch_id}: negative ids are "
            "reserved (ingest_batch_id=-1 is the base partition the "
            "build wrote)"
        )
    spark = df.sparkSession
    path = resolve_root(spark, path)
    # layout guard: a quantized sibling at this path would be silently
    # corrupted by raw-vector rows (probes would see NULL codes)
    jfs = spark.sparkContext._jvm.org.apache.hadoop.fs.Path
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    fs = jfs(path).getFileSystem(conf)
    for meta, kind, fix in (
        ("_pq_meta", "IVF-PQ", "append_to_ann_ivfpq_index"),
        ("_sq_meta", "IVF-SQ8", "append_to_ann_ivfsq8_index"),
    ):
        if fs.exists(jfs(f"{path}/{meta}")):
            raise ValueError(
                f"index at {path!r} is {kind} (has {meta}): its rows "
                f"carry codes, not raw embeddings — use {fix}"
            )
    # bounded-collect: nlist centroid rows from the index metadata
    cent_rows = (
        spark.read.parquet(f"{path}/_centroids").orderBy("cell").collect()
    )
    if not cent_rows:
        raise ValueError(f"{path!r} holds no centroid table; build first")
    cents = [(r.cent_id, [float(x) for x in r.centroid]) for r in cent_rows]
    extras = _index_extra_cols(
        spark.read.parquet(path), id_col, vec_col
    )
    df = spread_small_input(df)
    celled = df.select(
        F.col(id_col),
        _dim_guard_col(
            F.col(vec_col), len(cents[0][1]), "append_to_ann_ivf_index"
        ).alias(vec_col),
        _ivf_cell_col(F.col(vec_col), cents).alias("cell"),
        *[F.col(c) for c in extras],
    )
    part = -1 if batch_id is None else batch_id
    mode = "append" if batch_id is None else "overwrite"
    if mode == "overwrite":
        _invalidate_occ_counts(df.sparkSession, path, part)
    write_partitioned(
        celled, f"{path}/ingest_batch_id={part}", "cell", mode=mode
    )
    # occupancy delta for this batch (VERDICT r14 item 2): read-back
    # for batch-keyed writes, the assignment frame for base appends
    _append_occ_counts(celled, "cell", path, part, mode)


def ann_ivf_topk_indexed(
    spark,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = ANN_NPROBE,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    where=None,
    before_batch: int | None = None,
) -> DataFrame:
    """Probe a persisted IVF index (:func:`build_ann_ivf_index`): load
    the (bounded, nlist-row) centroid table, order cells by query dot
    driver-side, scan ONLY the ``nprobe`` probed cell directories, rank
    by exact cosine. Identical output to ``ann_ivf_topk`` on the same
    data. ``where`` (SQL string or Column over the index's stored
    ``extra_cols``) is the FILTERED-ANN form: the predicate pushes
    into the pruned scan and ranking sees only qualifying rows —
    top-k of the filtered set. ``before_batch`` fences the read to
    earlier batch partitions (see :func:`_before_batch`)."""
    from ..sources.manifest import resolve_root

    index_path = resolve_root(spark, index_path)
    cents = _load_centroids(spark, index_path)
    probe = _ivf_probe_cells(query_vec, cents, nprobe)
    idx = _before_batch(spark.read.parquet(index_path), before_batch)
    celled = _apply_where(idx.filter(F.col("cell").isin(probe)), where)
    return _rank_topk(celled, query_vec, k, vec_col, id_col)


def ann_ivf_join_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = ANN_NPROBE,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    where=None,
    before_batch: int | None = None,
) -> DataFrame:
    """Batch ANN against a persisted IVF index — the R-S form of
    :func:`ann_ivf_topk_indexed`: probe the index for EVERY query of
    ``queries`` in one job, reading ONLY the union of the batch's
    probed cell directories. Returns ``(query_id, id, cos, rank)``,
    rank 1..k per query (exact cosine within each query's probed
    cells — same recall contract as the single-query probe; with
    ``nprobe >= nlist`` it equals :func:`cosine_join` exactly).
    ``where`` filters inside the pruned scan (see
    :func:`ann_ivf_topk_indexed`); it applies to the whole batch.

    Scale shape: per-query probe cells are ranked DRIVER-side against
    the bounded nlist-row centroid table (the query batch is the
    retrieval workload — collected like ``bm25_join_indexed``'s
    terms); the index scan prunes to the union of probed cells at
    planning time, and the (query, cell) pairs + query vectors ride
    back as broadcasts, so candidate generation is shuffle-free up to
    the per-query top-k window.

    |Q| ceiling: the query batch is driver-materialized by design
    (8*dim bytes per vector — 10^5 queries at dim 64 is ~50 MB, far
    under driver memory); millions of queries should chunk the batch
    and union the outputs (per-query independence makes chunking
    semantics-free)."""
    from pyspark.sql import Window
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    from ..sources.manifest import resolve_root

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    index_path = resolve_root(spark, index_path)
    cents = _load_centroids(spark, index_path)
    # bounded-collect: the query batch itself — the retrieval
    # workload, needed driver-side to enumerate the probed cells the
    # index scan prunes to (the bm25_join_indexed discipline)
    qrows = queries.select(
        F.col(query_id_col), F.col(query_vec_col).cast("array<double>")
    ).collect()
    if not qrows:
        raise ValueError("query batch is empty")
    qid_type = queries.schema[query_id_col].dataType
    pairs = [
        (r[0], int(cell))
        for r in qrows
        for cell in _ivf_probe_cells([float(x) for x in r[1]], cents, nprobe)
    ]
    cells = sorted({c for _, c in pairs})
    qcells = local_rows_df(
        spark,
        pairs,
        StructType(
            [
                StructField(query_id_col, qid_type),
                StructField("cell", IntegerType()),
            ]
        ),
    )
    qvecs = local_rows_df(
        spark,
        [(r[0], [float(x) for x in r[1]]) for r in qrows],
        StructType(
            [
                StructField(query_id_col, qid_type),
                StructField("__qv", ArrayType(DoubleType())),
            ]
        ),
    )
    idx = _apply_where(
        _before_batch(spark.read.parquet(index_path), before_batch)
        .filter(F.col("cell").isin(cells)),
        where,
    )
    scored = (
        idx.join(F.broadcast(qcells), "cell")
        .join(F.broadcast(qvecs), query_id_col)
        .select(
            F.col(query_id_col),
            F.col(id_col),
            cosine(F.col(vec_col), F.col("__qv")).alias("cos"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the third standard ANN path next to LSH
# and IVF [Jégou, Douze, Schmid, "Product Quantization for Nearest
# Neighbor Search", TPAMI 2011]. The vector is split into m subvectors;
# each subvector is quantized to one of ksub codewords (seeded pick,
# same md5 rule as the IVF centroids); a vector is then m small ints —
# at the defaults (m=4, ksub=16) 64 float32 dims compress to 4 bytes of
# code. Queries rank by ADC (asymmetric distance computation): a
# per-query table of subspace dots is computed driver-side, and each
# stored vector's approximate dot is m table lookups — the scan reads
# CODES ONLY (columnar pruning skips the embedding column entirely),
# which is the 100 TB story: ~16x less IO than exact ranking, with an
# optional exact rerank that reads embeddings for the top-R ids alone.
# Every float path is a strict left fold ((x-y)*(x-y) products — no
# pow), so the construction is bitwise-replayable by the DuckDB oracle.
# ---------------------------------------------------------------------------

ANN_PQ_M = 4
ANN_PQ_KSUB = 16


def _flat_lit(vals: list[float]) -> Column:
    """Flat double-array literal via the same constant-folded
    from_json trick as :func:`_planes_lit`."""
    import json

    return F.from_json(F.lit(json.dumps(vals)), "array<double>")


def pq_codebooks(
    df: DataFrame,
    m: int = ANN_PQ_M,
    ksub: int = ANN_PQ_KSUB,
    dim: int = ANN_DIM,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    lloyd_iters: int = 0,
) -> list[list[list[float]]]:
    """Seeded PQ codebooks: the ``ksub`` vectors with the smallest
    ``(md5(id), id)`` (the IVF centroid rule — deterministic, no
    training loop, oracle-replayable) sliced into ``m`` subvectors:
    ``codebooks[j][c]`` is seed ``c``'s ``j``-th subvector. Bounded
    ksub-row collect.

    ``lloyd_iters > 0`` runs that many per-subspace k-means steps —
    the standard PQ training that makes codewords track the data's
    subspace structure (measured on the clustered recall corpus:
    ADC recall 0.13 -> see PARITY "ANN recall" — untrained PQ is a
    poor quantizer, trained PQ is the shipped recommendation at
    scale). Same determinism caveat as IVF's ``_lloyd_refine``:
    float means over partition order — the PERSISTED index is the
    reproducible artifact; the seeded pick stays the default so the
    oracle-gated query replays bit-for-bit."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    seeds = _ivf_centroids(df, ksub, vec_col, id_col)
    if len(seeds) < ksub:
        raise ValueError(
            f"corpus has only {len(seeds)} rows; need >= ksub={ksub}"
        )
    cbs = [
        [vec[j * dsub : (j + 1) * dsub] for _cid, vec in seeds]
        for j in range(m)
    ]
    if lloyd_iters:
        cbs = _pq_lloyd_refine(df, cbs, lloyd_iters, vec_col)
    return cbs


def _pq_lloyd_refine(
    df: DataFrame,
    cbs: list[list[list[float]]],
    iters: int,
    vec_col: str,
) -> list[list[list[float]]]:
    """Per-subspace Lloyd steps: assign every subvector to its current
    argmin codeword (the same native encode the index uses), average
    per (subspace, code), collect the bounded m*ksub means as the new
    codewords; empty codes keep their previous codeword. One
    assign+aggregate shuffle per iteration over (j, c, subvector)
    rows — m rows per input vector, ids-free."""
    m, ksub = len(cbs), len(cbs[0])
    dsub = len(cbs[0][0])
    for _ in range(iters):
        code = _pq_code_col(F.col(vec_col), cbs)
        vd = F.col(vec_col).cast("array<double>")
        pairs = F.array(
            *[
                F.struct(
                    F.lit(j).alias("j"),
                    F.element_at(code, j + 1).alias("c"),
                    F.slice(vd, j * dsub + 1, dsub).alias("sub"),
                )
                for j in range(m)
            ]
        )
        ex = df.select(F.explode(pairs).alias("p")).select(
            "p.j", "p.c", "p.sub"
        )
        # bounded-collect: m*ksub mean rows
        means = (
            ex.groupBy("j", "c")
            .agg(*[F.avg(F.col("sub")[i]).alias(f"m{i}") for i in range(dsub)])
            .collect()
        )
        new = {
            (int(r.j), int(r.c)): [float(r[f"m{i}"]) for i in range(dsub)]
            for r in means
        }
        cbs = [
            [new.get((j, c), cbs[j][c]) for c in range(ksub)]
            for j in range(m)
        ]
    return cbs


def _d2_strict(a: Column, b: Column) -> Column:
    """Strict left-fold squared L2 distance: ``fold(0.0,
    zip_with(a, b, (x,y) -> (x-y)*(x-y)), +)`` — multiplication, not
    pow, so DuckDB's replay is bitwise-identical."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_code_col(
    vec: Column, codebooks: list[list[list[float]]]
) -> Column:
    """Native PQ encoding: per subspace, the argmin-L2 codeword index
    (ties to the lowest code — array_min over (d2, c) structs, the
    ``_ivf_cell_col`` pattern). Returns ``array<int>`` of length m.
    The codebook rides in as one constant-folded literal."""
    m, ksub = len(codebooks), len(codebooks[0])
    dsub = len(codebooks[0][0])
    flat = _planes_lit([c for j in range(m) for c in codebooks[j]])
    vd = vec.cast("array<double>")
    idxs = F.sequence(F.lit(0), F.lit(ksub - 1))

    def code_j(j: int) -> Column:
        sub = F.slice(vd, j * dsub + 1, dsub)
        scored = F.transform(
            idxs,
            lambda c: F.struct(
                _d2_strict(
                    sub, F.element_at(flat, F.lit(j * ksub) + c + 1)
                ).alias("d2"),
                c.alias("c"),
            ),
        )
        return F.array_min(scored)["c"]

    return F.array(*[code_j(j) for j in range(m)])


def _pq_query_table(
    query_vec: list[float], codebooks: list[list[list[float]]]
) -> list[float]:
    """Driver-side ADC table: ``table[j*ksub + c]`` = strict ascending
    dot of the query's j-th subvector with codeword c — python float64
    in the same IEEE order as the engine/oracle folds."""
    m, ksub = len(codebooks), len(codebooks[0])
    dsub = len(codebooks[0][0])
    out: list[float] = []
    for j in range(m):
        q = query_vec[j * dsub : (j + 1) * dsub]
        for c in range(ksub):
            acc = 0.0
            for x, y in zip(q, codebooks[j][c]):
                acc = acc + x * y
            out.append(acc)
    return out


def _pq_adc_rank(
    coded: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int,
    id_col: str,
) -> DataFrame:
    """ADC ranking over a (id, code) relation: approximate dot = strict
    fold over subspaces of table lookups; deterministic top-k by
    (adot desc, id)."""
    m, ksub = len(codebooks), len(codebooks[0])
    tbl = _flat_lit(_pq_query_table(query_vec, codebooks))
    adot = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc
        + F.element_at(tbl, j * ksub + F.element_at(F.col("code"), j + 1) + 1),
    )
    ranked = (
        coded.withColumn("adot", adot)
        .orderBy(F.desc("adot"), F.col(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.desc("adot"), F.col(id_col))
    return ranked.select(
        id_col, F.row_number().over(w).alias("rank"), "adot"
    )


def ann_pq_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    m: int = ANN_PQ_M,
    ksub: int = ANN_PQ_KSUB,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """PQ approximate top-k by ADC (query-time form: encodes at query
    time — build the code table once with :func:`build_ann_pq_index`
    for repeated queries). Returns ``(id, rank, adot)`` — rank by
    approximate dot, descending, id tie-break. Approximation error is
    the quantization error; recall floors are pinned in tests and the
    indexed form offers exact rerank."""
    from .dedup import spread_small_input

    dim = len(query_vec)
    if codebooks is None:
        codebooks = pq_codebooks(df, m, ksub, dim, vec_col, id_col)
    # the per-vector argmin encode (m*ksub strict d2 folds) is the CPU
    # hot spot — a one-file parquet input would serialize it on one
    # core (measured 3.4s -> see PARITY; every other ANN entry spreads)
    coded = spread_small_input(df).select(
        F.col(id_col), _pq_code_col(F.col(vec_col), codebooks).alias("code")
    )
    return _pq_adc_rank(coded, query_vec, codebooks, k, id_col)


def build_ann_pq_index(
    df: DataFrame,
    path: str,
    m: int = ANN_PQ_M,
    ksub: int = ANN_PQ_KSUB,
    dim: int = ANN_DIM,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    commit: str = "rename",
    lloyd_iters: int = 0,
    extra_cols: tuple[str, ...] = (),
) -> None:
    """Encode the corpus ONCE and persist ``(id, code, embedding)``
    plus the codebooks (``_pq_codebooks``) and construction params
    (``_pq_meta``). ADC probes read the CODE column only (parquet
    column pruning — the embedding bytes stay on disk); exact rerank
    reads embeddings for the top-R candidate ids alone. Same staged
    publish contract as the LSH/IVF builds (``commit="rename"`` |
    ``"manifest"``). ``extra_cols`` stores passthrough metadata for
    filtered probes (see :func:`build_ann_ivf_index`)."""
    from ..sources.manifest import begin_generation, commit_generation
    from .dedup import _rm_dir, spread_small_input

    if commit not in ("rename", "manifest"):
        raise ValueError(f"commit must be 'rename' or 'manifest', got {commit!r}")
    _check_extra_cols(extra_cols, id_col, vec_col)
    _check_corpus_dim(df, vec_col, dim, "build_ann_pq_index")
    cbs = pq_codebooks(df, m, ksub, dim, vec_col, id_col, lloyd_iters)
    spark = df.sparkSession
    if commit == "manifest":
        staging = begin_generation(spark, path)
    else:
        staging = f"{path}.building"
        _rm_dir(spark, staging)
    df = spread_small_input(df)
    coded = df.select(
        F.col(id_col),
        _pq_code_col(F.col(vec_col), cbs).alias("code"),
        _dim_guard_col(F.col(vec_col), dim, "build_ann_pq_index").alias(
            vec_col
        ),
        *[F.col(c) for c in extra_cols],
    )
    # batch-partitioned like the LSH/IVF indexes: the build writes the
    # base partition; append_to_ann_pq_index adds later batches in
    # their own idempotent partitions (frozen codebooks)
    coded.write.parquet(f"{staging}/codes/ingest_batch_id=-1")
    rows = [
        (j, c, cbs[j][c])
        for j in range(m)
        for c in range(ksub)
    ]
    local_rows_df(
        spark,
        rows, "j int, c int, sub array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{staging}/_pq_codebooks")
    local_rows_df(
        spark,
        [(int(m), int(ksub), int(dim))], "m int, ksub int, dim int"
    ).coalesce(1).write.mode("overwrite").parquet(f"{staging}/_pq_meta")
    if commit == "manifest":
        commit_generation(spark, path, staging)
    else:
        _publish_index(spark, staging, path)


def append_to_ann_pq_index(
    df: DataFrame,
    path: str,
    batch_id: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Encode a new corpus batch against a persisted PQ index's FROZEN
    codebooks and land it in its own batch partition — the
    growing-corpus path, same contract as the LSH/IVF appends:
    ``batch_id`` set → overwrite-own-partition (replay-safe); unset →
    at-least-once append to the base partition. Codebooks intentionally
    do NOT retrain on append (quantization drifts as the corpus grows;
    rebuild with ``lloyd_iters`` when ADC error warrants it — the same
    trade-off as the IVF centroids)."""
    if batch_id is not None and batch_id < 0:
        raise ValueError(
            f"batch_id must be >= 0, got {batch_id}: negative ids are "
            "reserved (ingest_batch_id=-1 is the base partition the "
            "build wrote)"
        )
    from .dedup import spread_small_input

    spark = df.sparkSession
    path, _m, _ksub, dim, cbs = _load_pq_index(spark, path)
    extras = _index_extra_cols(
        spark.read.parquet(f"{path}/codes"), id_col, vec_col
    )
    df = spread_small_input(df)
    coded = df.select(
        F.col(id_col),
        _pq_code_col(F.col(vec_col), cbs).alias("code"),
        _dim_guard_col(F.col(vec_col), dim, "append_to_ann_pq_index").alias(
            vec_col
        ),
        *[F.col(c) for c in extras],
    )
    part = -1 if batch_id is None else batch_id
    mode = "append" if batch_id is None else "overwrite"
    coded.write.mode(mode).parquet(f"{path}/codes/ingest_batch_id={part}")


def build_ann_ivfpq_index(
    df: DataFrame,
    path: str,
    nlist: int | None = ANN_NLIST,
    m: int = ANN_PQ_M,
    ksub: int = ANN_PQ_KSUB,
    dim: int = ANN_DIM,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    lloyd_iters: int = 0,
    pq_lloyd_iters: int = 0,
    commit: str = "rename",
    extra_cols: tuple[str, ...] = (),
    target_cell: int = 256,
) -> None:
    """IVF-PQ composite index — the canonical billion-scale ANN layout
    (FAISS's IVFPQ; Jégou et al., TPAMI 2011 §V): vectors are
    partitioned into ``nlist`` IVF cells (directory-partitioned, so a
    probe PRUNES to its ``nprobe`` cell dirs) and, within each cell,
    stored as the PQ code of their RESIDUAL ``x - centroid(cell)``
    (residuals are small and concentrated, so shared codebooks cover
    them far better than raw vectors — the standard accuracy trick).
    A probe touches ``nprobe/nlist`` of the data AND reads only the
    code column of that slice: cell pruning x columnar pruning is the
    100 TB multiplier the flat PQ scan lacks.

    ADC for dot ranking: ``dot(q, x) ~= dot(q, centroid(cell)) +
    sum_j dot(q_j, residual_codeword_j)`` — the first term is one
    per-cell driver-side constant, the sum is the usual table fold
    (fixed order, so the whole score is a strict IEEE fold and the
    DuckDB oracle replays it bit-for-bit with seeded codebooks).

    ``lloyd_iters`` refines the IVF centroids, ``pq_lloyd_iters`` the
    residual codebooks (same determinism caveat as both parents: the
    PERSISTED index is the reproducible artifact; seeded defaults keep
    the gated query oracle-replayable)."""
    from ..sources.bucketed import write_partitioned
    from ..sources.manifest import begin_generation, commit_generation
    from .dedup import _rm_dir, spread_small_input

    if commit not in ("rename", "manifest"):
        raise ValueError(f"commit must be 'rename' or 'manifest', got {commit!r}")
    _check_extra_cols(extra_cols, id_col, vec_col)
    _check_corpus_dim(df, vec_col, dim, "build_ann_ivfpq_index")
    if nlist is None:
        # auto-size cells (see build_ann_ivf_index — same rule, same
        # fixed-default-for-oracles / None-at-scale contract)
        nlist = max(1, -(-df.count() // int(target_cell)))
    cents = _ivf_centroids(df, nlist, vec_col, id_col)
    if lloyd_iters and cents:
        cents = _lloyd_refine(df, cents, lloyd_iters, vec_col)
    cents_lit = _planes_lit([c for _cid, c in cents])
    vd = F.col(vec_col).cast("array<double>")
    cell = _ivf_cell_col(F.col(vec_col), cents)
    resid = F.zip_with(
        vd, F.element_at(cents_lit, cell + 1), lambda a, b: a - b
    )
    spark = df.sparkSession
    df = spread_small_input(df)
    rdf = df.select(
        F.col(id_col),
        F.col(vec_col),
        cell.alias("cell"),
        resid.alias("__resid"),
        *[F.col(c) for c in extra_cols],
    )
    cbs = pq_codebooks(
        rdf, m, ksub, dim, vec_col="__resid", id_col=id_col,
        lloyd_iters=pq_lloyd_iters,
    )
    if commit == "manifest":
        staging = begin_generation(spark, path)
    else:
        staging = f"{path}.building"
        _rm_dir(spark, staging)
    coded = rdf.select(
        F.col(id_col),
        F.col("cell"),
        _pq_code_col(F.col("__resid"), cbs).alias("code"),
        _dim_guard_col(F.col(vec_col), dim, "build_ann_ivfpq_index").alias(
            vec_col
        ),
        *[F.col(c) for c in extra_cols],
    )
    write_partitioned(coded, f"{staging}/ingest_batch_id=-1", "cell")
    # occupancy side table (VERDICT r14 item 2): read-back, no data
    # columns touched (cell is the directory name)
    _write_occ_counts(
        _occ_read_back(spark, f"{staging}/ingest_batch_id=-1", "cell"),
        "cell",
        staging,
        -1,
        "overwrite",
    )
    cent_rows = [(i, cid, vec) for i, (cid, vec) in enumerate(cents)]
    local_rows_df(
        spark,
        cent_rows, "cell int, cent_id bigint, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{staging}/_centroids")
    cb_rows = [(j, c, cbs[j][c]) for j in range(m) for c in range(ksub)]
    local_rows_df(
        spark,
        cb_rows, "j int, c int, sub array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{staging}/_pq_codebooks")
    local_rows_df(
        spark,
        [(int(m), int(ksub), int(dim), int(nlist))],
        "m int, ksub int, dim int, nlist int",
    ).coalesce(1).write.mode("overwrite").parquet(f"{staging}/_pq_meta")
    if commit == "manifest":
        commit_generation(spark, path, staging)
    else:
        _publish_index(spark, staging, path)


def append_to_ann_ivfpq_index(
    df: DataFrame,
    path: str,
    batch_id: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Encode a new corpus batch against a persisted IVF-PQ index's
    FROZEN centroids and residual codebooks and land it in its own
    batch partition (cell-subpartitioned, so probes prune appended
    data exactly like the base) — completes the growing-corpus story
    for the composite layout the way the LSH/IVF/PQ appends do for
    theirs. Neither the centroids nor the codebooks move on append
    (both quantizations drift as the corpus grows; rebuild with
    ``lloyd_iters`` / ``pq_lloyd_iters`` when probe recall warrants
    it — the documented parents' trade-off, compounded).

    Same idempotency contract as every store append: ``batch_id`` set
    → overwrite-own-partition (replay-safe); unset → at-least-once
    append to the base partition."""
    from ..sources.bucketed import write_partitioned
    from ..sources.manifest import resolve_root
    from .dedup import spread_small_input

    if batch_id is not None and batch_id < 0:
        raise ValueError(
            f"batch_id must be >= 0, got {batch_id}: negative ids are "
            "reserved (ingest_batch_id=-1 is the base partition the "
            "build wrote)"
        )
    spark = df.sparkSession
    path = resolve_root(spark, path)
    # bounded-collect: nlist centroid rows from the index metadata
    cent_rows = (
        spark.read.parquet(f"{path}/_centroids").orderBy("cell").collect()
    )
    if not cent_rows:
        raise ValueError(f"{path!r} holds no centroid table; build first")
    cents = [(r.cent_id, [float(x) for x in r.centroid]) for r in cent_rows]
    _p, _m, _ksub, _dim, cbs = _load_pq_index(spark, path)
    extras = _index_extra_cols(
        spark.read.parquet(path), id_col, vec_col
    )
    cents_lit = _planes_lit([c for _cid, c in cents])
    vd = F.col(vec_col).cast("array<double>")
    cell = _ivf_cell_col(F.col(vec_col), cents)
    resid = F.zip_with(
        vd, F.element_at(cents_lit, cell + 1), lambda a, b: a - b
    )
    df = spread_small_input(df)
    # materialize the residual as a REAL column first (the build's
    # rdf pattern): element_at/zip_with inside the encode's
    # interpreted HOF lambdas would re-evaluate it per d2 fold
    rdf = df.select(
        F.col(id_col),
        F.col(vec_col),
        cell.alias("cell"),
        resid.alias("__resid"),
        *[F.col(c) for c in extras],
    )
    coded = rdf.select(
        F.col(id_col),
        F.col("cell"),
        _pq_code_col(F.col("__resid"), cbs).alias("code"),
        _dim_guard_col(
            F.col(vec_col), _dim, "append_to_ann_ivfpq_index"
        ).alias(vec_col),
        *[F.col(c) for c in extras],
    )
    part = -1 if batch_id is None else batch_id
    mode = "append" if batch_id is None else "overwrite"
    if mode == "overwrite":
        _invalidate_occ_counts(df.sparkSession, path, part)
    write_partitioned(
        coded, f"{path}/ingest_batch_id={part}", "cell", mode=mode
    )
    # occupancy delta for this batch (VERDICT r14 item 2): read-back
    # for batch-keyed writes; base appends count the pre-encode frame
    # (rdf already carries the cell assignment — pruning keeps the PQ
    # encode out of the aggregate)
    _append_occ_counts(rdf, "cell", path, part, mode)


def _list_batch_dirs(spark, root: str) -> list[str]:
    """Names of the ``ingest_batch_id=*`` partition dirs under
    ``root`` (empty if the dir is missing)."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(root)
    fs = hpath.getFileSystem(conf)
    if not fs.exists(hpath):
        return []
    out = []
    for status in fs.listStatus(hpath):
        name = status.getPath().getName()
        if name.startswith("ingest_batch_id="):
            out.append(name)
    return out


# Persisted per-cell/bucket occupancy of the ANN index stores
# (VERDICT r14 item 2, the band store's ``counts`` precedent): every
# build/append/compact writes the occupancy of the batch partition it
# lands under ``{index}/_occ_counts/ingest_batch_id={b}`` (underscore
# → invisible to the partitioned data read), so the hot-cell/bucket
# guards (``max_cell``/``max_bucket``) read a METADATA-scale side
# table instead of paying a corpus-scale groupBy over the full index
# per nightly run. Delta-row semantics mirror the band store: an
# idempotent (batch_id-keyed) write invalidates then rewrites its own
# stats partition around its data partition; a base-partition append
# appends delta rows, and readers sum per key.
_OCC_DIR = "_occ_counts"


def _write_occ_counts(
    counted: DataFrame, key: str, root: str, part: int, mode: str
) -> None:
    """Persist the per-``key`` occupancy of ONE batch partition's rows
    (``counted``: the rows that were just written — a read-back of the
    fresh partition for builds/compacts and batch-id-keyed appends,
    the assignment frame itself for base-partition appends) under
    ``{root}/_occ_counts/ingest_batch_id={part}``. Column pruning
    keeps the aggregate scan to the key column alone — for a read-back
    of a just-written partition the key IS the directory name, so the
    job reads no data columns at all.

    Crash contract (shared with the band store, whose ``counts`` table
    this mirrors): a batch-id-keyed write drops its stats partition
    FIRST (:func:`_invalidate_occ_counts`), then lands data, then
    stats — every crash point leaves the batch's stats MISSING, which
    :func:`_load_occ_counts`'s listing check detects (guards fall back
    to the recount) even when the batch is a RE-LAND of an id whose
    earlier attempt completed both writes. A base-partition append has
    no stats partition of its own to drop; a crash between its two
    appended writes is recoverable by the store's documented replay."""
    (
        counted.groupBy(key)
        .agg(F.count(F.lit(1)).alias("occ_n"))
        .write.mode(mode)
        .parquet(f"{root}/{_OCC_DIR}/ingest_batch_id={part}")
    )


def _occ_read_back(spark, part_dir: str, key: str) -> DataFrame:
    """The just-written batch partition of ``part_dir`` re-read for
    occupancy counting: ``key`` is the partition directory name, so
    the count job reads NO data columns — and, unlike counting the
    assignment frame a second time, it cannot disagree with the data
    when the input is nondeterministic (a sample/limit/changing
    source re-executed between the data write and the stats write).
    An EMPTY corpus writes only ``_SUCCESS`` (no parquet files, so
    schema inference fails with UNABLE_TO_INFER_SCHEMA) — return an
    explicit empty frame so empty builds stay a supported bootstrap
    path (build empty, then append/stream into it). ONLY that
    condition is folded to empty: any other read failure (missing
    path, corrupt layout) must stay loud — silently counting an
    empty frame would write zero-row stats for a batch that has
    data, and the listing check could not see it."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(part_dir)
    except AnalysisException as e:
        if "UNABLE_TO_INFER_SCHEMA" not in str(e):
            raise
        return local_rows_df(spark, [], f"{key} int")


def _invalidate_occ_counts(spark, root: str, part: int) -> None:
    """Drop the stats partition of a batch ABOUT to be overwritten,
    BEFORE its data partition is touched: a crash anywhere between
    then and the stats rewrite leaves the batch's stats MISSING
    (listing-detectable — guards recount) rather than silently stale
    (describing the replaced rows of a re-landed batch id, which the
    listing check alone cannot see). No-op when the batch is new."""
    from .dedup import _rm_dir

    _rm_dir(spark, f"{root}/{_OCC_DIR}/ingest_batch_id={part}")


def _append_occ_counts(
    assigned: DataFrame, key: str, root: str, part: int, mode: str
) -> None:
    """Write the occupancy stats for an append batch. Overwrite mode
    (batch-id-keyed) counts from a read-back of the partition just
    written — directory-name key, no second execution of the
    assignment expressions (sign-dots / centroid-dots run once per
    batch, which also keeps streaming maintainers at one assignment
    pass per micro-batch). Append mode counts from the frame: a
    read-back of the base partition would include prior rows."""
    if mode == "overwrite":
        counted = _occ_read_back(
            assigned.sparkSession, f"{root}/ingest_batch_id={part}", key
        )
    else:
        counted = assigned
    _write_occ_counts(counted, key, root, part, mode)


def _load_occ_counts(spark, path: str, key: str) -> DataFrame | None:
    """The persisted occupancy side table of a RESOLVED index path as
    ``(key, occ_n)`` delta rows, or ``None`` when the guards must fall
    back to recounting the index: the table is absent (a store built
    before round 15), holds a different key (layout mismatch), or its
    batch partitions don't mirror the data's (a foreign writer
    bypassed the build/append API, or a crash landed data without
    stats) — the same driver-side listing that keys the metadata
    cache, so freshness costs a directory listing, never a scan."""
    from pyspark.errors import AnalysisException

    occ_root = f"{path}/{_OCC_DIR}"
    data_batches = set(_list_batch_dirs(spark, path))
    occ_batches = set(_list_batch_dirs(spark, occ_root))
    if not occ_batches or occ_batches != data_batches:
        return None
    try:
        occ = spark.read.parquet(occ_root)
    except AnalysisException:
        return None
    if key not in occ.columns or "occ_n" not in occ.columns:
        return None
    return occ.select(key, "occ_n")


def compact_ann_index(spark, path: str) -> None:
    """Collapse a long-appended ANN index's batch partitions back to
    the base layout (``ingest_batch_id=-1``) — the ANN twin of
    ``compact_bm25_index`` / ``compact_minhash_band_store``: reads
    only the STORE (ids + codes/cells/buckets + vectors), never the
    source embeddings, and leaves probes bitwise unchanged (the batch
    column never participates in scoring — pinned in tests). Run it
    when nightly appends make the per-batch directory count (file
    listing, small files) matter; correctness never depends on it.

    Layout is AUTODETECTED: flat PQ (``codes`` subdir), IVF / IVF-PQ
    (``cell``-partitioned root), LSH (``bucket``-partitioned root).
    Metadata tables (``_centroids``, ``_pq_*``, ``_lsh_meta``) and the
    ``_ingest_stream`` marker are untouched on the rename layout and
    carried into the new generation on the manifest layout.

    On a MANIFEST-layout index the compacted data is a fresh
    generation published by the atomic pointer PUT (object-store
    safe, concurrent-reader safe). On the rename layout the swap is
    in-place and NOT concurrency-safe — stop any maintenance stream
    first (the shared compact contract); every crash point leaves a
    recoverable copy (batch dirs move ASIDE to ``.old_batches``
    before the staged base moves in; recovery = rename them back)."""
    from ..sources.bucketed import write_partitioned
    from ..sources.manifest import (
        begin_generation,
        commit_generation,
        resolve_root,
    )
    from ..streaming.ingest import _read_text, _write_text
    from .dedup import _rename, _rm_dir

    root = path
    cur = resolve_root(spark, root)
    jfs = spark.sparkContext._jvm.org.apache.hadoop.fs.Path
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    fs = jfs(cur).getFileSystem(conf)

    flat_pq = fs.exists(jfs(f"{cur}/codes"))
    data_root = f"{cur}/codes" if flat_pq else cur
    if flat_pq:
        part_col = None
    elif fs.exists(jfs(f"{cur}/_centroids")):
        part_col = "cell"
    else:
        part_col = "bucket"
    if not _list_batch_dirs(spark, data_root):
        raise ValueError(f"{path!r} holds no batch partitions; build first")
    merged = spark.read.parquet(data_root)
    if "ingest_batch_id" in merged.columns:
        merged = merged.drop("ingest_batch_id")

    if cur != root:
        # manifest layout: compacted index = next generation; bounded
        # metadata tables are rewritten alongside, the stream marker
        # (if any) carried — a draining stream must be stopped, same
        # contract as every compact path
        gen = begin_generation(spark, root)
        data_dst = f"{gen}/codes" if flat_pq else gen
        if part_col is None:
            merged.write.mode("overwrite").parquet(
                f"{data_dst}/ingest_batch_id=-1"
            )
        else:
            write_partitioned(
                merged, f"{data_dst}/ingest_batch_id=-1", part_col
            )
            # fresh occupancy side table for the compacted generation
            # (the delta partitions collapse with the data they
            # describe); flat PQ has no cell/bucket key and no guards
            _write_occ_counts(
                _occ_read_back(
                    spark, f"{data_dst}/ingest_batch_id=-1", part_col
                ),
                part_col,
                data_dst,
                -1,
                "overwrite",
            )
        for meta in (
            "_centroids", "_pq_codebooks", "_pq_meta", "_lsh_meta", "_sq_meta"
        ):
            if fs.exists(jfs(f"{cur}/{meta}")):
                spark.read.parquet(f"{cur}/{meta}").coalesce(1).write.mode(
                    "overwrite"
                ).parquet(f"{gen}/{meta}")
        marker = _read_text(spark, f"{cur}/_ingest_stream")
        if marker is not None:
            _write_text(spark, f"{gen}/_ingest_stream", marker)
        commit_generation(spark, root, gen)
        return

    # stage as a SIBLING of the data dir (writing into a child of the
    # path being read is the trap the band store's *_compacting
    # siblings avoid), then move the live batch dirs ASIDE, bring the
    # staged base in, sweep last — each crash point leaves a full
    # readable copy somewhere (recovery: rename .old_batches back)
    staging = f"{data_root}.compacting"
    _rm_dir(spark, staging)
    if part_col is None:
        merged.write.mode("overwrite").parquet(staging)
    else:
        write_partitioned(merged, staging, part_col)
    aside = f"{data_root}.old_batches"
    _rm_dir(spark, aside)
    for name in _list_batch_dirs(spark, data_root):
        _rename(spark, f"{data_root}/{name}", f"{aside}/{name}")
    _rename(spark, staging, f"{data_root}/ingest_batch_id=-1")
    _rm_dir(spark, aside)
    if part_col is not None:
        # rewrite the occupancy side table to match the collapsed
        # layout (its old per-batch partitions describe dirs that no
        # longer exist; in the window before this write the listing
        # mismatch makes guards fall back to the recount — stats are
        # derived data, every crash point self-heals via fallback)
        _rm_dir(spark, f"{data_root}/{_OCC_DIR}")
        _write_occ_counts(
            _occ_read_back(
                spark, f"{data_root}/ingest_batch_id=-1", part_col
            ),
            part_col,
            data_root,
            -1,
            "overwrite",
        )


def ann_index_stats(spark, path: str) -> DataFrame:
    """Operational health report for a persisted ANN index (layout
    autodetected like :func:`compact_ann_index`): one row per
    ``(ingest_batch_id, unit)`` with its row count, where ``unit`` is
    the cell (IVF / IVF-PQ), the bucket (LSH), or NULL (flat PQ).
    This is the relation the two maintenance decisions read from:
    many batch partitions -> :func:`compact_ann_index`; skewed or
    oversized units -> rebuild with ``lloyd_iters`` / auto ``nlist``.
    Store-only read (ids never leave the executors — the aggregate is
    batchxunit-bounded)."""
    from ..sources.manifest import resolve_root

    cur = resolve_root(spark, path)
    jfs = spark.sparkContext._jvm.org.apache.hadoop.fs.Path
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    fs = jfs(cur).getFileSystem(conf)
    flat_pq = fs.exists(jfs(f"{cur}/codes"))
    data_root = f"{cur}/codes" if flat_pq else cur
    if not _list_batch_dirs(spark, data_root):
        raise ValueError(f"{path!r} holds no batch partitions; build first")
    df = spark.read.parquet(data_root)
    if flat_pq:
        unit = F.lit(None).cast("int")
    elif "cell" in df.columns:
        unit = F.col("cell").cast("int")
    else:
        unit = F.col("bucket").cast("int")
    return (
        df.groupBy(
            F.col("ingest_batch_id").cast("bigint").alias("ingest_batch_id"),
            unit.alias("unit"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def ann_ivfpq_topk_indexed(
    spark,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = ANN_NPROBE,
    rerank: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    where=None,
    before_batch: int | None = None,
) -> DataFrame:
    """Probe a persisted IVF-PQ index: rank the ``nprobe`` best cells
    by centroid dot driver-side, scan ONLY those cell directories
    (``PartitionFilters``) reading the CODE column only, score by
    residual ADC (``cell_dot + ordered table fold``), deterministic
    top-k by (adot desc, id). ``rerank=R`` re-ranks the top-R by exact
    cosine, reading embeddings for those R ids alone. ``where``
    filters inside the doubly-pruned scan over the index's stored
    ``extra_cols`` (pre-filter semantics)."""
    from ..sources.manifest import resolve_root

    path = resolve_root(spark, index_path)
    cents = _load_centroids(spark, path)
    _p, m, ksub, dim, cbs = _load_pq_index(spark, path)
    if len(query_vec) != dim:
        raise ValueError(f"query dim {len(query_vec)} != index dim {dim}")
    probes = _ivf_probe_cells(query_vec, cents, nprobe)
    cell_dots = []
    for _cid, cvec in cents:
        acc = 0.0
        for x, y in zip(query_vec, cvec):
            acc = acc + x * y
        cell_dots.append(acc)
    tbl = _flat_lit(_pq_query_table(query_vec, cbs))
    cd_lit = _flat_lit(cell_dots)
    idx = _before_batch(spark.read.parquet(path), before_batch)
    filt = _apply_where(
        idx.filter(F.col("cell").isin(probes)), where
    ).select(id_col, "cell", "code")
    adot = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.element_at(cd_lit, F.col("cell") + 1),
        lambda acc, j: acc
        + F.element_at(tbl, j * ksub + F.element_at(F.col("code"), j + 1) + 1),
    )
    take = k if rerank is None else rerank
    if rerank is not None and rerank < k:
        raise ValueError(f"rerank ({rerank}) must be >= k ({k})")
    ranked = (
        filt.withColumn("adot", adot)
        .orderBy(F.desc("adot"), F.col(id_col))
        .limit(take)
    )
    if rerank is None:
        w = Window.orderBy(F.desc("adot"), F.col(id_col))
        return ranked.select(
            id_col, F.row_number().over(w).alias("rank"), "adot"
        )
    cand = ranked.select(id_col)
    vecs = idx.select(id_col, vec_col).join(cand, id_col)
    return _rank_topk(vecs, query_vec, k, vec_col, id_col)


_INDEX_DRIVER_CACHE: dict = {}


def _cached_driver_read(spark, path: str, sub: str, load):
    """Driver-side cache for bounded index metadata (codebooks,
    centroid tables, meta rows) keyed by the metadata dir's publish
    mtime (VERDICT r12 item 8: the b31 adjudication located ~0.6 s of
    CONSTANT per-probe driver overhead in the codebook collect +
    literal construction — repeated probes against the same index
    generation now skip the collect).

    Staleness: every publish path replaces the metadata directory —
    the rename layout stages to a sibling and swaps whole dirs, the
    manifest layout resolves to a fresh ``gen-{k}`` path — so the
    (resolved path, sub) mtime changes on rebuild and a stale hit
    cannot survive a republish. Because directory mtimes are
    millisecond-granular and SYNTHETIC (often 0) on object stores
    like S3A (ADVICE r13), the generation stamp also folds in the
    dir's file listing (names + lengths): a rename-layout republish
    at the same resolved path swaps in differently-named part files
    (Spark part filenames embed the write's task/attempt UUID), so
    the listing changes even where the mtime does not. Appends never
    rewrite these dirs (codebooks/centroids are frozen by contract),
    so append-then-probe correctly reuses the cache. If the metadata
    dir is unreadable the load runs uncached (missing metadata keeps
    its loud error). One entry per (path, sub): a republish evicts
    the prior generation."""
    jfs = spark.sparkContext._jvm.org.apache.hadoop.fs.Path
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    try:
        fs = jfs(path).getFileSystem(conf)
        st = fs.getFileStatus(jfs(f"{path}/{sub}"))
        listing = tuple(
            sorted(
                (s.getPath().getName(), s.getLen())
                for s in fs.listStatus(jfs(f"{path}/{sub}"))
            )
        )
        gen = (st.getModificationTime(), listing)
    except Exception:
        return load()
    key = (path, sub)
    hit = _INDEX_DRIVER_CACHE.get(key)
    if hit is not None and hit[0] == gen:
        return hit[1]
    val = load()
    _INDEX_DRIVER_CACHE[key] = (gen, val)
    # manifest-layout eviction: a republish resolves to a NEW
    # ``{root}/gen-{k}`` path, so the rename-layout same-key
    # replacement above never fires — drop the prior generations of
    # the same root or a long-lived serving driver leaks one centroid
    # table/codebook set per nightly republish
    import re

    root = re.sub(r"/gen-\d+$", "", path)
    if root != path:
        for stale in [
            k2
            for k2 in _INDEX_DRIVER_CACHE
            if k2 != key
            and k2[1] == sub
            and re.sub(r"/gen-\d+$", "", k2[0]) == root
        ]:
            del _INDEX_DRIVER_CACHE[stale]
    return val


def _load_centroids(spark, path: str):
    """Cached ``(cent_id, vector)`` centroid table of a RESOLVED index
    path — the shared front door of every IVF-family probe (see
    :func:`_cached_driver_read` for the staleness contract; appends
    keep reading the table directly, uncached, since they also need
    its emptiness as a loud build-first error)."""

    def _load():
        # bounded-collect: nlist centroid rows from the index metadata
        rows = (
            spark.read.parquet(f"{path}/_centroids").orderBy("cell").collect()
        )
        return [(r.cent_id, [float(x) for x in r.centroid]) for r in rows]

    return _cached_driver_read(spark, path, "_centroids", _load)


def _load_sq_meta_dim(spark, path: str) -> int:
    """Cached SQ8 meta dim of a RESOLVED index path."""

    def _load():
        return int(spark.read.parquet(f"{path}/_sq_meta").head().dim)

    return _cached_driver_read(spark, path, "_sq_meta", _load)


def _load_pq_index(spark, path: str):
    from ..sources.manifest import resolve_root

    path = resolve_root(spark, path)

    def _load():
        # bounded-collect: one construction-parameter row
        meta = spark.read.parquet(f"{path}/_pq_meta").collect()
        if not meta:
            raise ValueError(f"{path!r} holds no _pq_meta; build first")
        m, ksub, dim = int(meta[0].m), int(meta[0].ksub), int(meta[0].dim)
        # bounded-collect: m*ksub codebook rows from the index metadata
        cb_rows = spark.read.parquet(f"{path}/_pq_codebooks").collect()
        cbs: list[list[list[float]]] = [
            [None] * ksub for _ in range(m)  # type: ignore[list-item]
        ]
        for r in cb_rows:
            cbs[int(r.j)][int(r.c)] = [float(x) for x in r.sub]
        return m, ksub, dim, cbs

    m, ksub, dim, cbs = _cached_driver_read(spark, path, "_pq_meta", _load)
    return path, m, ksub, dim, cbs


def ann_pq_topk_indexed(
    spark,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    rerank: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    where=None,
    before_batch: int | None = None,
) -> DataFrame:
    """Probe a persisted PQ index: ADC over the code column (the
    embedding column is pruned from the scan), identical output to
    ``ann_pq_topk`` with the same codebooks. ``rerank=R`` re-ranks the
    top-R ADC candidates by EXACT cosine (reads embeddings for those R
    ids only) and returns ``(id, rank, cos)`` — the standard
    compressed-scan-then-exact-tail pattern. ``where`` filters inside
    the scan over the index's stored ``extra_cols`` (pre-filter
    semantics, see :func:`ann_ivf_topk_indexed`)."""
    path, m, ksub, dim, cbs = _load_pq_index(spark, index_path)
    if len(query_vec) != dim:
        raise ValueError(
            f"query dim {len(query_vec)} != index dim {dim}"
        )
    idx = _apply_where(
        _before_batch(spark.read.parquet(f"{path}/codes"), before_batch),
        where,
    )
    coded = idx.select(id_col, "code")
    if rerank is None:
        return _pq_adc_rank(coded, query_vec, cbs, k, id_col)
    if rerank < k:
        raise ValueError(f"rerank ({rerank}) must be >= k ({k})")
    cand = _pq_adc_rank(coded, query_vec, cbs, rerank, id_col).select(id_col)
    vecs = idx.select(id_col, vec_col).join(cand, id_col)
    return _rank_topk(vecs, query_vec, k, vec_col, id_col)


def _check_corpus_dim(df: DataFrame, vec_col: str, dim: int, caller: str) -> None:
    """EAGER build-side half of the dim discipline (ADVICE r12):
    validate a small sample of corpus vectors against the dim about to
    be persisted in the index meta, BEFORE any work runs. A mislabeled
    dim written to meta is the silent-garbage mode the probe-side
    checks can't catch — every VALID query gets rejected at probe
    time, and a query matching the wrong meta dim passes validation
    and NULL-folds every score. The sample is 8 rows, not 1 (ADVICE
    r14): a one-row sample can land on the very minority-length row a
    seeded centroid pick adopted as the declared dim, passing the
    cross-check and leaving the per-row guard to fail the MAJORITY
    rows with a misleading message. A mixed corpus whose first 8
    non-null rows are ALL the minority length still slips through to
    the exact per-row complement, :func:`_dim_guard_col` in the
    builds' write paths (ADVICE r13)."""
    # bounded-collect: eight sampled rows for eager schema validation
    sample = df.filter(F.col(vec_col).isNotNull()).select(vec_col).head(8)
    if not sample:
        return  # empty / all-NULL corpus: nothing to validate against
    lens = sorted({len(r[0]) for r in sample})
    if lens == [dim]:
        return
    if len(lens) > 1:
        raise ValueError(
            f"{caller}: corpus {vec_col!r} holds MIXED vector lengths "
            f"{lens} (declared dim={dim}) — a mixed index would "
            "NULL-fold every minority-length row's scores; fix the "
            "corpus before building"
        )
    raise ValueError(
        f"{caller}: corpus {vec_col!r} has dim {lens[0]} but dim={dim} "
        "was declared — the meta would reject every valid query "
        "at probe time"
    )


def _dim_guard_wrap(out: Column, vec: Column, dim: int, msg: str) -> Column:
    """Shared per-row dim-guard shape: return ``out``, unless ``vec``
    is non-NULL with length != ``dim`` — then raise ``msg`` for that
    row. Wrapping an OUTPUT expression (a probe-cells array, a bucket
    projection) instead of the vector fed into it is the read-path
    form (ADVICE r14): expressions referenced inside interpreted HOF
    lambdas are re-evaluated per element (the r6 ``__bits`` note), so
    a guarded VECTOR would recompute the size() check per centroid or
    plane, while a guarded output evaluates it once per row."""
    return F.when(
        vec.isNotNull() & (F.size(vec) != dim),
        F.raise_error(F.lit(msg)),
    ).otherwise(out)


def _batch_dim_guard(out: Column, vec: Column, dim: int, caller: str) -> Column:
    """Read-path per-row dim guard for batch/query vectors joining a
    persisted index: the complement of the builds' write-path
    :func:`_dim_guard_col` — a MIXED-dim batch slips past the callers'
    eager one-row sample, and its wrong-length rows would NULL-fold
    every bucket/cell assignment and verify cosine, silently dropping
    exactly those rows' duplicate pairs (ADVICE r14: the silent-empty
    failure class)."""
    return _dim_guard_wrap(
        out,
        vec,
        dim,
        f"{caller}: batch vector with length != declared dim {dim} — "
        "a mismatched vector would NULL-fold its bucket/cell "
        "assignment and every verify cosine, silently dropping its "
        "duplicate pairs",
    )


def _dim_guard_col(vec: Column, dim: int, caller: str) -> Column:
    """EXACT write-path half of the dim discipline (ADVICE r13):
    :func:`_check_corpus_dim` samples ONE row, so a corpus with MIXED
    vector lengths can still build — every non-matching row would be
    persisted/encoded and NULL-fold at probe time, silently degrading
    recall. Wrapping the column an index build persists (or encodes)
    makes any non-NULL wrong-length row fail the BUILD loudly
    instead. NULL vectors pass through (probes already skip them via
    the norm filter). One size() comparison per row — noise next to
    the per-row encode/dot folds."""
    return _dim_guard_wrap(
        vec,
        vec,
        dim,
        f"{caller}: corpus vector with length != declared dim "
        f"{dim} — persisting it would NULL-fold at probe time "
        "with silently degraded recall",
    )


def _collect_query_batch(
    queries: DataFrame, query_id_col: str, query_vec_col: str, dim: int
):
    """Collect the retrieval workload for a batch probe and validate
    dimensions. Returns ``(qid_type, [(qid, [float...]), ...])`` — the
    shared front door of every ``*_join_indexed`` dense probe (the
    ``bm25_join_indexed`` discipline: the BATCH is bounded by
    definition; the corpus never moves)."""
    # bounded-collect: the query batch itself — the retrieval
    # workload, needed driver-side to build per-query probe plans
    qrows = queries.select(
        F.col(query_id_col), F.col(query_vec_col).cast("array<double>")
    ).collect()
    if not qrows:
        raise ValueError("query batch is empty")
    qid_type = queries.schema[query_id_col].dataType
    out = []
    for r in qrows:
        if r[1] is None or len(r[1]) != dim:
            got = "NULL" if r[1] is None else len(r[1])
            raise ValueError(
                f"query {r[0]!r} dim {got} != index dim {dim}: a "
                "mismatched vector would NULL-fold every score and "
                "silently return garbage ranks"
            )
        out.append((r[0], [float(x) for x in r[1]]))
    return qid_type, out


def _adc_topk_batch(
    scored_src: DataFrame,
    qtbl: DataFrame,
    init: Column,
    m: int,
    ksub: int,
    take: int,
    id_col: str,
    query_id_col: str,
) -> DataFrame:
    """Per-query ADC top-``take`` over a (query_id-joined) code
    relation: approximate dot = strict fold of per-subspace table
    lookups starting from ``init`` (0.0 for flat PQ, the per-cell
    centroid dot for IVF-PQ), deterministic (adot desc, id) window
    per query. ``qtbl`` is the broadcast (query_id, __tbl) relation
    (skipped when the source already carries ``__tbl`` — the flat-PQ
    cross form)."""
    from pyspark.sql import Window

    scored = (
        scored_src
        if "__tbl" in scored_src.columns
        else scored_src.join(F.broadcast(qtbl), query_id_col)
    )
    adot = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        init,
        lambda acc, j: acc
        + F.element_at(
            F.col("__tbl"),
            j * ksub + F.element_at(F.col("code"), j + 1) + 1,
        ),
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("adot").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("adot", adot)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= take)
        .select(query_id_col, id_col, "adot", "rank")
    )


def _batch_exact_rerank(
    cand: DataFrame,
    vecs: DataFrame,
    qvecs: DataFrame,
    k: int,
    vec_col: str,
    id_col: str,
    query_id_col: str,
) -> DataFrame:
    """Exact-cosine tail of a batch compressed probe: join embeddings
    for the candidate (query, id) pairs ALONE (the corpus embedding
    column stays on disk for everything else), score against the
    broadcast query vectors, re-window to the final top-``k``. Returns
    ``(query_id, id, cos, rank)`` — the ``cosine_join`` shape."""
    from pyspark.sql import Window

    scored = (
        cand.join(vecs, id_col)
        .join(F.broadcast(qvecs), query_id_col)
        .select(
            F.col(query_id_col),
            F.col(id_col),
            cosine(F.col(vec_col), F.col("__qv")).alias("cos"),
        )
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cos").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
    )


def ann_pq_join_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 10,
    rerank: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    where=None,
    before_batch: int | None = None,
) -> DataFrame:
    """Batch ANN against a persisted PQ index — the R-S form of
    :func:`ann_pq_topk_indexed`: score EVERY query of ``queries`` by
    ADC in one job over ONE code-column scan (the embedding column is
    pruned from the scan entirely — at the defaults the compressed
    read is ~16x less IO than exact ranking, amortized across the
    whole batch). Per-query ADC tables (m*ksub doubles each) are
    computed driver-side in the same strict IEEE fold order as the
    engine and ride back as one broadcast relation.

    Returns ``(query_id, id, adot, rank)`` with rank 1..k per query;
    ``rerank=R`` re-ranks each query's top-R ADC candidates by EXACT
    cosine — reading embeddings for those |queries|*R ids alone — and
    returns ``(query_id, id, cos, rank)`` (with ``R >= |corpus|`` the
    output is BITWISE :func:`cosine_join`; pinned in tests).

    Scale shape: flat PQ has no partition pruning (that is IVF-PQ's
    job — :func:`ann_ivfpq_join_indexed`); its 100 TB story is the
    columnar one: the scan reads m small ints per vector, scores the
    whole batch against each Arrow batch executor-side (broadcast
    tables, no shuffle before the per-query top-k window), and only
    the rerank tail ever touches float data."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        StructField,
        StructType,
    )

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rerank is not None and rerank < k:
        raise ValueError(f"rerank ({rerank}) must be >= k ({k})")
    path, m, ksub, dim, cbs = _load_pq_index(spark, index_path)
    qid_type, qbatch = _collect_query_batch(
        queries, query_id_col, query_vec_col, dim
    )
    qtbl = local_rows_df(
        spark,
        [(qid, _pq_query_table(vec, cbs)) for qid, vec in qbatch],
        StructType(
            [
                StructField(query_id_col, qid_type),
                StructField("__tbl", ArrayType(DoubleType())),
            ]
        ),
    )
    idx = _apply_where(
        _before_batch(spark.read.parquet(f"{path}/codes"), before_batch),
        where,
    )
    # declared-crossjoin: code scan x broadcast QUERY BATCH — the
    # batch is the retrieval workload (bounded), and the product is
    # the definitional ADC score relation (flat PQ scores every
    # query against every code; IVF-PQ is the pruned form)
    coded = idx.select(id_col, "code").crossJoin(F.broadcast(qtbl))
    take = k if rerank is None else rerank
    ranked = _adc_topk_batch(
        coded, qtbl, F.lit(0.0), m, ksub, take, id_col, query_id_col
    )
    if rerank is None:
        return ranked
    qvecs = local_rows_df(
        spark,
        qbatch,
        StructType(
            [
                StructField(query_id_col, qid_type),
                StructField("__qv", ArrayType(DoubleType())),
            ]
        ),
    )
    cand = ranked.select(query_id_col, id_col)
    return _batch_exact_rerank(
        cand, idx.select(id_col, vec_col), qvecs, k,
        vec_col, id_col, query_id_col,
    )


def ann_ivfpq_join_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = ANN_NPROBE,
    rerank: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    where=None,
    before_batch: int | None = None,
) -> DataFrame:
    """Batch ANN against a persisted IVF-PQ index — the R-S form of
    :func:`ann_ivfpq_topk_indexed` and the full 100 TB dense batch
    probe: every query's ``nprobe`` best cells are ranked driver-side
    against the bounded nlist-row centroid table, the index scan
    prunes to the UNION of the batch's probed cell directories at
    planning time (``PartitionFilters``) reading the CODE column only,
    and each (query, candidate) pair scores by residual ADC —
    ``dot(q, centroid(cell)) + ordered table fold`` — with the
    per-(query, cell) centroid dots and per-query tables riding in as
    broadcasts. Cell pruning x columnar pruning x batch amortization:
    no full-table scan, no embedding bytes read (until the optional
    rerank tail).

    Returns ``(query_id, id, adot, rank)`` rank 1..k per query;
    ``rerank=R`` re-ranks each query's top-R by exact cosine (reads
    embeddings for those ids alone) returning
    ``(query_id, id, cos, rank)``. With ``nprobe >= nlist`` and
    ``rerank >= |corpus|`` the output is BITWISE :func:`cosine_join`
    (pinned in tests).

    |Q| ceiling: the query batch (vectors + per-query ADC tables,
    8*(dim + m*ksub) bytes per query) is driver-materialized by
    design — 10^5 queries at the defaults is well under 1 GB;
    millions of queries should chunk the batch and union the outputs
    (per-query independence makes chunking semantics-free)."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    from ..sources.manifest import resolve_root

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    if rerank is not None and rerank < k:
        raise ValueError(f"rerank ({rerank}) must be >= k ({k})")
    path = resolve_root(spark, index_path)
    cents = _load_centroids(spark, path)
    _p, m, ksub, dim, cbs = _load_pq_index(spark, path)
    qid_type, qbatch = _collect_query_batch(
        queries, query_id_col, query_vec_col, dim
    )
    # per-(query, cell) probe pairs + centroid dots, driver-side in
    # the engine's strict fold order (the single-query probe's
    # cell_dots, batched)
    pairs = []
    for qid, vec in qbatch:
        for cell in _ivf_probe_cells(vec, cents, nprobe):
            pairs.append((qid, int(cell), dot_py(vec, cents[cell][1])))
    cells = sorted({c for _q, c, _d in pairs})
    qcells = local_rows_df(
        spark,
        pairs,
        StructType(
            [
                StructField(query_id_col, qid_type),
                StructField("cell", IntegerType()),
                StructField("__cd", DoubleType()),
            ]
        ),
    )
    qtbl = local_rows_df(
        spark,
        [(qid, _pq_query_table(vec, cbs)) for qid, vec in qbatch],
        StructType(
            [
                StructField(query_id_col, qid_type),
                StructField("__tbl", ArrayType(DoubleType())),
            ]
        ),
    )
    idx = _before_batch(spark.read.parquet(path), before_batch)
    coded = (
        _apply_where(idx.filter(F.col("cell").isin(cells)), where)
        .select(id_col, "cell", "code")
        .join(F.broadcast(qcells), "cell")
    )
    take = k if rerank is None else rerank
    ranked = _adc_topk_batch(
        coded, qtbl, F.col("__cd"), m, ksub, take, id_col, query_id_col
    )
    if rerank is None:
        return ranked
    qvecs = local_rows_df(
        spark,
        qbatch,
        StructType(
            [
                StructField(query_id_col, qid_type),
                StructField("__qv", ArrayType(DoubleType())),
            ]
        ),
    )
    cand = ranked.select(query_id_col, id_col)
    return _batch_exact_rerank(
        cand, idx.select(id_col, vec_col), qvecs, k,
        vec_col, id_col, query_id_col,
    )


def auto_planes(n: int, target_bucket: int = 32) -> int:
    """Banding depth derived from corpus count — the LSH analogue of
    the shuffle-partition heuristic. Bucket occupancy is
    ``n / 2^planes``, so fixing the depth makes candidate pairs (and
    the verify stage) grow quadratically with the corpus (measured:
    PARITY.md round-7 scaling rows — 10x corpus at fixed depth 4 was
    11.1x wall-clock; depth 7 restored 2.2x). This rule keeps expected
    occupancy near ``target_bucket``: ``ceil(log2(n/target_bucket))``,
    clamped to [4, 16] (floor: tiny corpora still spread across >= 16
    buckets; ceiling: per-table recall ``(1-θ/π)^planes`` must stay
    recoverable by the OR over tables)."""
    import math

    return min(16, max(4, math.ceil(math.log2(max(n, 1) / target_bucket))))


def _multi_table_buckets(
    df: DataFrame,
    n_planes: int,
    n_tables: int,
    dim: int,
    vec_col: str,
    id_col: str,
    probe_bits: int = 0,
    guard_caller: str | None = None,
) -> DataFrame:
    """(id, t, bucket) rows for the multi-table sign-bit LSH — table
    ``t`` buckets by the sign bits of planes ``t*n_planes ..
    t*n_planes+n_planes-1``. Shared bitwise-identically by
    ``cosine_neardup_pairs_lsh`` (self near-dup) and ``knn_join_lsh``
    (cross-corpus retrieval); the gate queries pin the construction
    against DuckDB's replay. ``probe_bits=m`` additionally emits, per
    table, the ``m`` buckets at one-bit flips of the least-confident
    planes — the query-side multiprobe expansion (1+m rows per
    (vector, table) instead of 1).

    The plane matrix rides in as ONE constant-folded literal
    (_planes_lit) instead of n_tables*n_planes*dim inlined F.lit()
    nodes. Measured (r6, sf0.1, 48 planes x 64 dims): the inlined
    tree cost ~4 s PER CALL of pure Python/py4j DataFrame
    construction before Spark ever saw the plan — 70%+ of b13's
    wall-clock was driver-side expression building, not execution.
    Worker-side math is untouched: same planes, same strict left-fold
    dot, bitwise-identical buckets.

    ``guard_caller`` (ADVICE r14) arms the per-row read-path dim
    guard: the ``__bits``/``__dots`` projection that materializes the
    sign construction is wrapped with :func:`_batch_dim_guard`, so a
    MIXED-dim input fails loudly at bucket time instead of NULL-
    folding its rows' buckets away. Riding the already-materialized
    column keeps the size() check at once per row (wrapping the
    VECTOR would re-evaluate it per plane inside the HOF lambdas)."""
    if probe_bits < 0:
        raise ValueError(f"probe_bits must be >= 0, got {probe_bits}")
    flat = [
        _hyperplane(t * n_planes + p, dim)
        for t in range(n_tables)
        for p in range(n_planes)
    ]
    planes = _planes_lit(flat)
    vec_d = F.col(vec_col).cast("array<double>")

    # sign bits of all planes in one pass, materialized as a REAL
    # column: element_at(<expr>, i) re-evaluates <expr> per lookup in
    # interpreted HOF context (no CSE inside lambdas), so referencing
    # the 48-dot transform by name is what keeps it evaluated once
    bits = F.transform(
        planes, lambda p: F.when(_dot_dbl(vec_d, p) >= 0, 1).otherwise(0)
    )
    if guard_caller is not None:
        bits = _batch_dim_guard(bits, F.col(vec_col), dim, guard_caller)
    pow2 = F.array(*[F.lit(1 << p) for p in range(n_planes)])
    bcol = F.col("__bits")

    def base_bucket(t):
        return F.aggregate(
            F.sequence(F.lit(0), F.lit(n_planes - 1)),
            F.lit(0),
            lambda acc, p: acc
            + F.element_at(bcol, t * n_planes + p + 1)
            * F.element_at(pow2, p + 1),
        )

    if probe_bits == 0:
        tb = F.transform(
            F.sequence(F.lit(0), F.lit(n_tables - 1)),
            lambda t: F.struct(t.alias("t"), base_bucket(t).alias("bucket")),
        )
        # bucket table carries IDS ONLY — the 8-way explode and the
        # (t, bucket) join never ship the 64-float embeddings (that
        # would push 8 copies of every vector through the shuffle);
        # embeddings are joined back exactly once per side for the verify.
        return (
            df.select(F.col(id_col), bits.alias("__bits"))
            .select(F.col(id_col), F.explode(tb).alias("tb"))
            .select(id_col, "tb.t", "tb.bucket")
        )

    # multiprobe: per table, also emit the buckets reached by flipping
    # each of the probe_bits LEAST-CONFIDENT sign bits (smallest |dot|
    # — the engine-side twin of the driver-side _multiprobe_buckets
    # heuristic; ties break on plane index via the struct sort). All
    # pure Catalyst array ops: dots are computed once per vector,
    # ranked per table with array_sort, and each flip is one XOR of
    # the base bucket with that plane's power of two.
    dots = F.transform(planes, lambda p: _dot_dbl(vec_d, p))
    if guard_caller is not None:
        dots = _batch_dim_guard(dots, F.col(vec_col), dim, guard_caller)
    dcol = F.col("__dots")
    bits_from_dots = F.transform(
        dcol, lambda d: F.when(d >= 0, 1).otherwise(0)
    )

    def probed(t):
        base = base_bucket(t)
        conf = F.array_sort(
            F.transform(
                F.sequence(F.lit(0), F.lit(n_planes - 1)),
                lambda p: F.struct(
                    F.abs(
                        F.element_at(dcol, t * n_planes + p + 1)
                    ).alias("a"),
                    p.alias("p"),
                ),
            )
        )
        flips = F.slice(conf, 1, min(probe_bits, n_planes))
        return F.concat(
            F.array(base),
            F.transform(
                flips,
                lambda s: base.bitwiseXOR(F.element_at(pow2, s["p"] + 1)),
            ),
        )

    tb = F.transform(
        F.sequence(F.lit(0), F.lit(n_tables - 1)),
        lambda t: F.struct(t.alias("t"), probed(t).alias("buckets")),
    )
    return (
        df.select(F.col(id_col), dots.alias("__dots"))
        .select(F.col(id_col), bits_from_dots.alias("__bits"), dcol)
        .select(F.col(id_col), F.explode(tb).alias("tb"))
        .select(id_col, "tb.t", F.explode("tb.buckets").alias("bucket"))
    )


def _occupancy_filter(
    b: DataFrame,
    max_bucket: int,
    keys: tuple = ("t", "bucket"),
    arg_name: str = "max_bucket",
    stats: DataFrame | None = None,
) -> DataFrame:
    """Drop ``keys`` groups holding more than ``max_bucket`` members —
    the degenerate-cluster guard shared by the self near-dup and
    knn-join constructions (``(t, bucket)``), the incremental LSH
    form (``("bucket",)``) and the IVF near-dup's ``max_cell``
    (``("cell",)``): ONE implementation so the guards can't diverge.
    Validates the bound centrally (round-14 review): ``0`` would drop
    EVERY bucket and silently report zero pairs — the silent-empty
    failure class the dim guards exist to prevent.

    ``stats`` (VERDICT r14 item 2): the persisted ``(key, occ_n)``
    delta rows from :func:`_load_occ_counts`. When given, the guard
    never aggregates ``b`` at all — at 10^10 index rows that groupBy
    is a corpus-scale shuffle paid per nightly guarded run. Instead
    the HOT keys (occupancy > ``max_bucket``: the rare degenerate
    ones, bounded above by the whole bucket/cell space — nlist cells
    or <= 2^16 LSH buckets, always broadcastable metadata) come from
    a metadata-scale sum of the side table and are removed with a
    broadcast ANTI join: a map-side filter over ``b``, no shuffle.
    The side table covers every row the write paths landed, so the
    surviving candidate pairs are identical to the recount's (pinned
    in tests/test_occ_stats.py; the one formal difference — an anti
    join keeps NULL-key rows the recount's inner join dropped — is
    invisible downstream, since a NULL key can never match the
    candidate equi-join). Callers pass ``None`` (recount) for ad-hoc
    relations with no persisted store."""
    if max_bucket < 1:
        raise ValueError(f"{arg_name} must be >= 1, got {max_bucket}")
    keys = list(keys)
    if stats is not None:
        hot = (
            stats.groupBy(*keys)
            .agg(F.sum("occ_n").alias("bn"))
            .filter(F.col("bn") > max_bucket)
            .drop("bn")
        )
        return b.join(F.broadcast(hot), on=keys, how="left_anti")
    occ = (
        b.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("bn"))
        .filter(F.col("bn") <= max_bucket)
        .drop("bn")
    )
    return b.join(occ, on=keys)


def knn_join_lsh(
    left: DataFrame,
    right: DataFrame,
    k: int,
    n_planes: int | None = None,
    n_tables: int = 8,
    dim: int = ANN_DIM,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_bucket: int | None = None,
    target_bucket: int = 32,
    exact_fallback: bool = False,
    probe_bits: int = 0,
) -> DataFrame:
    """Batch k-NN JOIN: for every left vector, its top-``k`` cosine
    neighbors among the right corpus that share at least one LSH
    bucket — the retrieval shape batch pipelines run (nearest training
    docs per eval prompt, cross-corpus contamination analysis,
    retrieval-augmented labeling), as one relational job instead of
    n_left separate ANN queries.

    Both sides bucket with the SAME seeded planes (multi-table
    OR-construction, shared with ``cosine_neardup_pairs_lsh``);
    candidates are the (t, bucket) equi-join projected to id pairs —
    never a cross join; the exact strict-fold cosine verifies each
    candidate once; ``row_number`` over (cos desc, right id) takes the
    deterministic top-k per left id. Like every LSH construction here,
    recall is the banding trade-off and precision of returned
    neighbors is exact.

    ``probe_bits=m`` is the recall knob the single-query ANN path has
    (:func:`ann_lsh_topk`): each left vector also probes, per table,
    the ``m`` buckets at one-bit flips of its least-confident planes —
    computed engine-side in pure Catalyst (dots ranked with
    array_sort, flips as XORs), so candidate lookups grow (1+m)x on
    the left side only while the right corpus is bucketed once.
    Compose with the auto depth: deeper banding for cost, probes to
    buy the recall back.

    Output: (left_id, right_id, cos, rank), rank 1..k. Left vectors
    with no bucket collision produce no rows by default;
    ``exact_fallback=True`` brute-forces ONLY those misses against the
    full right corpus (an anti-join finds them; their candidate set
    becomes miss x right, verified by the same exact cosine), making
    the join total over non-zero-norm lefts. Cost is
    |misses| * |right| verifies — safe when misses are the tail the
    OR-construction makes them (per-left miss probability is
    ``(1-p^n_planes)^n_tables``), which is why it is opt-in rather
    than the default at 100 TB.

    Scale: shuffle volume is ids-only until the verify; the per-left
    candidate count is bounded by n_tables x bucket occupancy
    (``max_bucket`` caps degenerate cells); the final rank is a
    per-left-id window over verified candidates only.

    SCALING — ``n_planes`` must grow with corpus size, like shuffle
    partition count: bucket occupancy is N / 2^n_planes, so candidate
    pairs grow ~|L||R|/2^n_planes. Measured (tools/scale_probe.py,
    PARITY.md round-7 scaling rows): 10x both sides at a FIXED
    n_planes=4 is 11.1x wall-clock (the quadratic term); deepening to
    n_planes=7 for the 10x corpus restores 2.2x. The default
    ``n_planes=None`` therefore derives the depth from the corpus:
    ``clamp(ceil(log2(max(|L|,|R|) / target_bucket)), 4, 16)`` — the
    same rule ``cosine_neardup_pairs_lsh`` uses, auto-applied so a
    fixed default can never become the 100 TB scale-killer. The two
    ``count()`` jobs it costs are metadata-cheap (column-pruned scans)
    next to the candidate join they right-size. Pass an explicit
    ``n_planes`` to pin the construction (the oracle-gated query pins
    4 so its DuckDB twin can mirror the exact bucket space).
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    from .dedup import spread_small_input

    if n_planes is None:
        n_planes = auto_planes(max(left.count(), right.count()), target_bucket)
    # zero-norm vectors have no defined cosine: the verify below drops
    # them anyway, so bucketing them is pure waste — and worse, a left
    # whose ONLY bucket collisions were zero-norm rights would not be
    # counted a miss by the exact_fallback anti-join (it HAD candidates,
    # all dropped at verify), silently voiding the documented totality
    # over non-zero-norm lefts (ADVICE r8). Exclude them BEFORE
    # candidate generation on both sides.
    nz = dot_strict(F.col(vec_col), F.col(vec_col)) > 0
    left = spread_small_input(left.filter(nz))
    right = spread_small_input(right.filter(nz))
    # probe_bits expands only the LEFT (query) side — the standard
    # query-side multiprobe: recall rises with (1 + probe_bits) bucket
    # lookups per table while the right corpus is bucketed exactly once
    lb = _multi_table_buckets(
        left, n_planes, n_tables, dim, vec_col, id_col, probe_bits
    )
    rb = _multi_table_buckets(right, n_planes, n_tables, dim, vec_col, id_col)
    if max_bucket is not None:
        rb = _occupancy_filter(rb, max_bucket)
    cand = (
        lb.select("t", "bucket", F.col(id_col).alias("left_id"))
        .join(
            rb.select("t", "bucket", F.col(id_col).alias("right_id")),
            on=["t", "bucket"],
        )
        .select("left_id", "right_id")
        .distinct()
    )
    if exact_fallback:
        # lefts with no collision in ANY table: their candidates are
        # the whole right side (ids only — the shared verify below
        # computes the cosines). The anti-join keys on ids, so this
        # adds zero cost when every left collides.
        misses = left.select(F.col(id_col).alias("left_id")).join(
            cand.select("left_id").distinct(), "left_id", "left_anti"
        )
        cand = cand.unionByName(
            # declared-crossjoin: opt-in exact fallback, misses only
            misses.crossJoin(right.select(F.col(id_col).alias("right_id")))
        )
    sc = left.sparkSession.sparkContext
    cand = cand.repartition(sc.defaultParallelism)
    vec_d = F.col(vec_col).cast("array<double>")
    # zero-norm vectors (empty documents) have no defined cosine and
    # under ANSI mode 1.0/0.0 aborts the whole job — exclude them from
    # the verify on BOTH sides (the oracle mirrors this filter)
    el = left.select(
        F.col(id_col).alias("left_id"),
        vec_d.alias("emb_l"),
        F.sqrt(dot_strict(F.col(vec_col), F.col(vec_col))).alias("norm_l"),
    ).filter(F.col("norm_l") > 0)
    er = right.select(
        F.col(id_col).alias("right_id"),
        vec_d.alias("emb_r"),
        F.sqrt(dot_strict(F.col(vec_col), F.col(vec_col))).alias("norm_r"),
    ).filter(F.col("norm_r") > 0)
    w = Window.partitionBy("left_id").orderBy(
        F.desc("cos"), F.asc("right_id")
    )
    return (
        cand.join(el, "left_id")
        .join(er, "right_id")
        .withColumn(
            "cos",
            _dot_dbl(F.col("emb_l"), F.col("emb_r"))
            / (F.col("norm_l") * F.col("norm_r")),
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("left_id", "right_id", "cos", "rank")
    )


def cosine_neardup_against_index(
    batch: DataFrame,
    index_path: str,
    threshold: float,
    n_planes: int | None = None,
    dim: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    probe_bits: int = 0,
    max_bucket: int | None = None,
) -> DataFrame:
    """Incremental embedding near-dup: new-batch vectors vs a
    PERSISTED LSH index (built by ``build_ann_lsh_index``, grown by
    ``append_to_ann_lsh_index`` / ``stream_index_embeddings``) — the
    embedding-modality twin of the text pipeline's
    ``dedup_against_store``. Per nightly batch the cost is O(batch
    buckets ⋈ index buckets): the batch is sign-bucketed with the
    SAME seeded planes the index stores, candidates are the bucket
    equi-join projected to id pairs (ids only through the shuffle),
    and the exact strict-fold cosine verifies each candidate once.
    The full index embedding column is read only for bucket-colliding
    rows.

    ``probe_bits`` lifts recall exactly as in :func:`knn_join_lsh`
    (measured there: 0.67 -> 0.96 @ 2 probes): the batch side also
    joins the buckets at one-bit flips of its least-confident planes.
    Exact duplicates are ALWAYS found at any ``probe_bits`` when
    ``max_bucket`` is unset (identical vectors share identical sign
    bits); with ``max_bucket`` set, an exact duplicate whose indexed
    copy sits in a dropped hot bucket is NOT reported — collapse
    identical-vector blobs with ``exact_dedup`` first. Precision is
    1.0 (exact verify).

    Returns ``(doc_old, doc_new, cos)`` — index id, batch id, cosine
    >= threshold — the same earlier-wins orientation as
    ``dedup_against_store``: drop/flag ``doc_new``. Assumes batch and
    index ids are distinct namespaces; identical ids are filtered
    defensively (a vector must not near-dup itself).

    ``max_bucket`` (optional) is the hot-bucket guard of the IVF
    twin's ``max_cell`` (round 14 — the incremental LSH form was the
    one remaining candidate join without a degenerate-blob bound):
    index buckets holding more than ``max_bucket`` vectors are
    dropped from candidate generation. Recall trade: pairs whose
    INDEXED member sits in a dropped hot bucket are not reported.
    Default ``None`` keeps the construction exact w.r.t. the bucket
    rule — the oracle-gated row relies on that."""
    spark = batch.sparkSession
    from ..sources.manifest import resolve_root
    from .dedup import spread_small_input

    if max_bucket is not None and max_bucket < 1:
        raise ValueError(f"max_bucket must be >= 1, got {max_bucket}")
    index_path = resolve_root(spark, index_path)
    n_planes, dim = _resolve_lsh_params(
        spark, index_path, n_planes, dim, "cosine_neardup_against_index"
    )
    # dim discipline (ADVICE r14 — the IVF twin's r13 contract): a
    # wrong-dim batch NULL-folds every sign-bit dot AND every verify
    # cosine, so the job would silently report ZERO duplicate pairs —
    # duplicates would survive the nightly dedup. Eager one-row check
    # against the resolved _lsh_meta dim first (fails before any
    # work); the per-row guard armed below (guard_caller) catches
    # MIXED-dim batches the sample can't see.
    # bounded-collect: one sampled row for eager dim validation
    sample = batch.filter(F.col(vec_col).isNotNull()).select(vec_col).head()
    if sample is not None and len(sample[0]) != dim:
        raise ValueError(
            f"cosine_neardup_against_index: batch {vec_col!r} has dim "
            f"{len(sample[0])} but the index at {index_path!r} holds "
            f"dim-{dim} buckets — a mismatched batch would NULL-fold "
            "every bucket assignment and silently return zero "
            "duplicate pairs"
        )
    batch = spread_small_input(batch)
    idx = spark.read.parquet(index_path)
    bb = _multi_table_buckets(
        batch,
        n_planes,
        1,
        dim,
        vec_col,
        id_col,
        probe_bits,
        guard_caller="cosine_neardup_against_index",
    ).select(F.col(id_col).alias("doc_new"), "bucket")
    idxb = idx.select(F.col(id_col).alias("doc_old"), "bucket")
    if max_bucket is not None:
        # hot-bucket guard: occupancy measured on the INDEX side (the
        # factor multiplying every colliding batch vector's candidate
        # count) — the shared _occupancy_filter, like the IVF twin.
        # The persisted _occ_counts side table (written by every
        # build/append/compact) makes the guard a metadata read; a
        # store whose stats are absent or stale recounts (r15).
        idxb = _occupancy_filter(
            idxb,
            max_bucket,
            keys=("bucket",),
            stats=_load_occ_counts(spark, index_path, "bucket"),
        )
    cand = (
        bb.join(idxb, on="bucket")
        .filter(F.col("doc_old") != F.col("doc_new"))
        .select("doc_old", "doc_new")
        .distinct()
    )
    cand = cand.repartition(spark.sparkContext.defaultParallelism)
    vec_d = F.col(vec_col).cast("array<double>")
    eb = batch.select(
        F.col(id_col).alias("doc_new"),
        vec_d.alias("emb_new"),
        F.sqrt(dot_strict(F.col(vec_col), F.col(vec_col))).alias("norm_new"),
    ).filter(F.col("norm_new") > 0)
    ei = idx.select(
        F.col(id_col).alias("doc_old"),
        vec_d.alias("emb_old"),
        F.sqrt(dot_strict(F.col(vec_col), F.col(vec_col))).alias("norm_old"),
    ).filter(F.col("norm_old") > 0)
    return (
        cand.join(eb, "doc_new")
        .join(ei, "doc_old")
        .withColumn(
            "cos",
            _dot_dbl(F.col("emb_old"), F.col("emb_new"))
            / (F.col("norm_old") * F.col("norm_new")),
        )
        .filter(F.col("cos") >= threshold)
        .select("doc_old", "doc_new", "cos")
    )


def cosine_neardup_against_ivf_index(
    batch: DataFrame,
    index_path: str,
    threshold: float,
    nprobe: int = ANN_NPROBE,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cell: int | None = None,
) -> DataFrame:
    """Incremental embedding near-dup against a persisted IVF-family
    index — ONE store serving both the ANN queries and the nightly
    dedup job (the operational win over keeping a separate LSH store
    just for :func:`cosine_neardup_against_index`): each new-batch
    vector joins only the index rows in its ``nprobe``
    nearest-centroid cells (the same native argmax/top-n cell rule
    the index build and probes use — ``_ivf_probe_cells_col``), and
    the exact strict-fold cosine verifies each candidate once.
    Works unchanged against every IVF-family layout — raw-float
    (``build_ann_ivf_index``), IVF-SQ8 (``build_ann_ivfsq8_index``)
    and IVF-PQ (``build_ann_ivfpq_index``) — all three store ``cell``
    plus the raw vector column the verify reads, and all three use
    the same seeded centroid pick, so the three layouts answer the
    dedup question row-identically (pinned in tests).

    Returns ``(doc_old, doc_new, cos)`` — index id, batch id, cosine
    >= threshold, the same earlier-wins orientation as the LSH twin:
    drop/flag ``doc_new``. Identical ids are filtered defensively.

    Recall contract: an EXACT duplicate of an indexed vector is
    always found at any ``nprobe`` (identical vectors share the same
    argmax cell); near-dups whose pair straddles a cell boundary need
    ``nprobe > 1``, the standard IVF trade (recall measured in
    tests). Scale shape: candidate generation touches only
    ``(id, cell)`` columns — batch cells x index cells equi-join —
    and the full vector column is joined back for candidate ids
    alone; cost per nightly batch is O(batch x cell occupancy), never
    O(corpus^2).

    ``max_cell`` (optional) is the hot-cell guard, mirroring the LSH
    twin's ``max_bucket`` and the MinHash family's hot-bucket bound:
    index cells holding more than ``max_cell`` vectors are dropped
    from candidate generation — the degenerate-blob bound for corpora
    where one boilerplate cluster lands in a single IVF cell and the
    batch x occupancy candidate set for that cell goes quadratic in
    the blob. Recall trade: pairs whose INDEXED member sits in a
    dropped hot cell are not reported (auto-nlist sizing keeps
    average occupancy near the target, so only degenerate cells hit
    the bound). Default ``None`` keeps the construction exact w.r.t.
    the ``nprobe`` probe rule — the oracle-gated row relies on
    that."""
    spark = batch.sparkSession
    from ..sources.manifest import resolve_root
    from .dedup import spread_small_input

    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    if max_cell is not None and max_cell < 1:
        raise ValueError(f"max_cell must be >= 1, got {max_cell}")
    path = resolve_root(spark, index_path)
    cents = _load_centroids(spark, path)
    if not cents:
        raise ValueError(
            f"{path!r} holds no centroid table; build the IVF/IVF-SQ8 "
            "index first"
        )
    # dim discipline (ADVICE r13): a wrong-dim batch vector NULL-folds
    # every centroid dot in _ivf_probe_cells_col AND every verify
    # cosine, so the job would silently report ZERO duplicate pairs —
    # duplicates would survive the nightly dedup. Eager one-row check
    # first (fails before any work, like the probes), then the exact
    # per-row _dim_guard_col below catches MIXED-dim batches the
    # sample can't see.
    # bounded-collect: one sampled row for eager dim validation
    cdim = len(cents[0][1])
    sample = batch.filter(F.col(vec_col).isNotNull()).select(vec_col).head()
    if sample is not None and len(sample[0]) != cdim:
        raise ValueError(
            f"cosine_neardup_against_ivf_index: batch {vec_col!r} has "
            f"dim {len(sample[0])} but the index at {path!r} holds "
            f"dim-{cdim} centroids — a mismatched batch "
            "would NULL-fold every cell assignment and silently "
            "return zero duplicate pairs"
        )
    batch = spread_small_input(batch)
    idx = spark.read.parquet(path)
    # the per-row guard wraps the probe OUTPUT, not the vector fed
    # into the HOF folds (ADVICE r14): expressions referenced inside
    # interpreted HOF lambdas are re-evaluated per element (the r6
    # __bits note), so a guarded VECTOR recomputes the size() check
    # per centroid; wrapping the probe-cells array evaluates it ONCE
    # per row — explode materializes its child a single time — while
    # the centroid folds reference the raw column attribute.
    probe_cells = _batch_dim_guard(
        _ivf_probe_cells_col(F.col(vec_col), cents, nprobe),
        F.col(vec_col),
        cdim,
        "cosine_neardup_against_ivf_index",
    )
    bb = batch.select(
        F.col(id_col).alias("doc_new"),
        F.explode(probe_cells).alias("cell"),
    )
    idxc = idx.select(F.col(id_col).alias("doc_old"), "cell")
    if max_cell is not None:
        # hot-cell guard (VERDICT r13 #1): occupancy is measured on
        # the INDEX side — that is the factor that multiplies every
        # colliding batch vector's candidate count. The persisted
        # _occ_counts side table (written by every build/append/
        # compact) makes the guard a metadata read; a store whose
        # stats are absent or stale recounts (r15).
        idxc = _occupancy_filter(
            idxc,
            max_cell,
            keys=("cell",),
            arg_name="max_cell",
            stats=_load_occ_counts(spark, path, "cell"),
        )
    cand = (
        bb.join(idxc, on="cell")
        .filter(F.col("doc_old") != F.col("doc_new"))
        .select("doc_old", "doc_new")
        .distinct()
    )
    cand = cand.repartition(spark.sparkContext.defaultParallelism)
    vec_d = F.col(vec_col).cast("array<double>")
    eb = batch.select(
        F.col(id_col).alias("doc_new"),
        vec_d.alias("emb_new"),
        F.sqrt(dot_strict(F.col(vec_col), F.col(vec_col))).alias("norm_new"),
    ).filter(F.col("norm_new") > 0)
    ei = idx.select(
        F.col(id_col).alias("doc_old"),
        vec_d.alias("emb_old"),
        F.sqrt(dot_strict(F.col(vec_col), F.col(vec_col))).alias("norm_old"),
    ).filter(F.col("norm_old") > 0)
    return (
        cand.join(eb, "doc_new")
        .join(ei, "doc_old")
        .withColumn(
            "cos",
            _dot_dbl(F.col("emb_old"), F.col("emb_new"))
            / (F.col("norm_old") * F.col("norm_new")),
        )
        .filter(F.col("cos") >= threshold)
        .select("doc_old", "doc_new", "cos")
    )


def cosine_neardup_pairs_lsh(
    df: DataFrame,
    threshold: float,
    n_planes: int | None = None,
    n_tables: int = 8,
    dim: int = ANN_DIM,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    target_bucket: int = 32,
    max_bucket: int | None = None,
) -> DataFrame:
    """Scale path for embedding near-dup: multi-table sign-bit LSH
    (OR-construction) then exact-cosine verify within buckets.

    ``max_bucket`` (optional) mirrors the dedup families' hot-bucket
    guard: (table, bucket) cells holding more than ``max_bucket``
    vectors are dropped from candidate generation — the degenerate-
    cluster bound for corpora where one sign pattern captures a huge
    blob. Default None keeps the construction exact w.r.t. the
    OR-construction (the oracle-gated query relies on that).

    ``n_planes=None`` sizes the bucket space to the corpus via
    ``auto_planes`` (clamp(ceil(log2(n / target_bucket)), 4, 16)) —
    bucket count must grow
    with n or the "scale path" degenerates toward all-pairs (at 16
    fixed buckets a 10^9-vector corpus would put ~6*10^7 vectors in
    every bucket). More planes per table lowers per-table recall by the
    standard ``(1-θ/π)^n_planes`` factor — the OR over ``n_tables``
    is the compensating knob. Pass an explicit ``n_planes`` to pin the
    construction (the oracle-gated query pins 4).

    Each of ``n_tables`` hash tables buckets every vector by the sign
    bits of ``n_planes`` seeded hyperplanes (table ``t`` uses planes
    ``t*n_planes .. t*n_planes+n_planes-1``); a pair is a candidate if
    it collides in ANY table (explode + equi-join on (table, bucket) +
    distinct), then candidates are verified with the exact strict-fold
    cosine. Collision probability per table for angle θ is
    ``(1-θ/π)^n_planes``; OR over tables lifts recall to
    ``1-(1-p)^n_tables`` while candidate generation stays a bucket
    equi-join — never the O(n^2) cross join of
    ``cosine_neardup_pairs``. Precision is 1.0 (exact verify)."""
    from .dedup import spread_small_input

    if n_planes is None:
        n_planes = auto_planes(df.count(), target_bucket)
    df = spread_small_input(df)

    vec_d = F.col(vec_col).cast("array<double>")
    # n_tables short rows per vector: materialize once instead of
    # running the sign-bit bucket construction on BOTH self-join
    # sides (same build-once rationale as minhash_lsh_pairs)
    b = _multi_table_buckets(
        df, n_planes, n_tables, dim, vec_col, id_col
    ).localCheckpoint(eager=True)
    if max_bucket is not None:
        b = _occupancy_filter(b, max_bucket)
    a1 = b.select("t", "bucket", F.col(id_col).alias("vec_a"))
    a2 = b.select("t", "bucket", F.col(id_col).alias("vec_b"))
    cand = (
        a1.join(a2, on=["t", "bucket"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b")
        .distinct()
    )
    # AQE sizes post-shuffle partitions by BYTES; the candidate rows are
    # two ids but each costs a 64-dim fold in the verify, so the
    # coalesced 1-2 partitions would serialize the CPU-heavy stage onto
    # as many cores. Re-spread explicitly — the id-pair shuffle is tiny.
    sc = df.sparkSession.sparkContext
    cand = cand.repartition(sc.defaultParallelism)
    # per-vector norms are computed ONCE here instead of twice per
    # candidate pair inside cosine() — sqrt(dot(v,v)) is the identical
    # fold either way, so cos stays bitwise-equal to the oracle's
    # inline cosine while the verify does 1 fold per pair, not 3.
    # Embeddings are likewise cast to array<double> ONCE per vector so
    # the per-pair fold skips dot_strict's two per-element cast
    # transforms (same products, same order — bitwise-identical cos).
    ea = df.select(
        F.col(id_col).alias("vec_a"),
        vec_d.alias("emb_a"),
        F.sqrt(dot_strict(F.col(vec_col), F.col(vec_col))).alias("norm_a"),
    )
    eb = df.select(
        F.col(id_col).alias("vec_b"),
        vec_d.alias("emb_b"),
        F.sqrt(dot_strict(F.col(vec_col), F.col(vec_col))).alias("norm_b"),
    )
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .withColumn(
            "cos",
            _dot_dbl(F.col("emb_a"), F.col("emb_b"))
            / (F.col("norm_a") * F.col("norm_b")),
        )
        .filter(F.col("cos") >= threshold)
        .select("vec_a", "vec_b")
    )


def semantic_dedup(
    df: DataFrame,
    tau: float = 0.4,
    nlist: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    lloyd_iters: int = 0,
    target_cell: int = 256,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by clustering embeddings and removing within-cluster
    near-duplicates, keeping the copy FURTHEST from the centroid (the
    paper's diversity-preserving pick).

    Procedure (the paper's, made deterministic and relational):

    1. cluster: the IVF assignment — seeded centroids (smallest
       ``(md5(id), id)``; ``lloyd_iters`` k-means steps optional),
       every vector to its max-dot cell;
    2. order each cell by cosine-to-centroid ASC, id ASC — rank 1 is
       the furthest-from-centroid item, the copy the paper's
       ``keep="hard"`` default retains;
    3. remove a vector iff some EARLIER vector in its cell has
       ``cos >= tau`` with it (the paper's upper-triangular max-sim
       test) — so each duplicate set's furthest-from-centroid member
       survives.

    Returns every input id with ``(id, cell, cent_rank, is_kept)`` —
    callers semi-join ``is_kept = 1`` to materialize the survivors.
    Zero-norm embeddings have no defined cosine: they are always kept
    and carry the sentinel ``cell = -1, cent_rank = 0`` (see the
    in-body comment; same contract as :func:`knn_join_lsh`).

    Scale shape: the deliberate cost is the within-cell pairwise
    verify, O(sum cell^2) — SemDeDup's own design trades global O(n^2)
    for per-cluster quadratic work, so cell size is the knob. The
    DEFAULT ``nlist=None`` auto-sizes it: ``ceil(n / target_cell)``
    cells, so expected pair work stays ~n * target_cell — LINEAR in
    corpus size (the paper scales clusters with data the same way:
    50k clusters at 1e9 items; a fixed nlist at 10x the data is 100x
    the pairs — the same trap the auto-sized LSH banding depth closed
    in round 8). Everything else is linear: one bounded nlist-row
    collect, a broadcast centroid join, one within-cell window, and
    the pair join keys on cell — no global shuffle of pairs.
    ``lloyd_iters=0`` keeps the whole construction
    seeded-deterministic (and DuckDB-replayable); refined centroids
    trade that for tighter cells like the IVF index does
    (`_lloyd_refine` notes the float-mean caveat).
    """
    if not 0.0 < float(tau) <= 1.0:
        raise ValueError(f"tau must be in (0, 1], got {tau}")
    from pyspark.sql import Window

    from .dedup import spread_small_input

    # zero-norm embeddings (empty documents) have no defined cosine to
    # ANYTHING — they can neither be duplicates nor remove others — so
    # exclude them BEFORE cell assignment (same contract as
    # knn_join_lsh; ADVICE r9). Left in, their NULL/NaN __cos_cent
    # desyncs cent_rank from the oracle (Spark's ascending window puts
    # NULLS FIRST, DuckDB NULLS LAST) and the NaN pair test silently
    # never fires. They return always-kept under the sentinel cell -1,
    # cent_rank 0 (outside the 1..n real ranks).
    zero_norm = df.filter(
        dot_strict(F.col(vec_col), F.col(vec_col)) <= 0
    ).select(
        F.col(id_col),
        F.lit(-1).cast("long").alias("cell"),
        F.lit(0).cast("long").alias("cent_rank"),
        F.lit(1).alias("is_kept"),
    )
    # round-15: a small parquet corpus arrives as one split, which
    # serialized the per-row assignment fold onto a single core
    # (profile: 3 consecutive 1-task ~1 s stages); no-op at corpus
    # scale where splits >= cores (guide §2.2)
    df = spread_small_input(
        df.filter(dot_strict(F.col(vec_col), F.col(vec_col)) > 0)
    )

    if nlist is None:
        # one count job; same pattern as auto_planes for the kNN join
        nlist = max(1, -(-df.count() // int(target_cell)))
    if nlist < 1:
        raise ValueError(f"nlist must be >= 1, got {nlist}")

    cents = _ivf_centroids(df, nlist, vec_col, id_col)
    if lloyd_iters:
        cents = _lloyd_refine(df, cents, lloyd_iters, vec_col)
    cent_df = local_rows_df(
        df.sparkSession,
        [(i, c) for i, (_cid, c) in enumerate(cents)],
        "cell int, __cent array<double>",
    )
    assigned = df.select(
        F.col(id_col),
        F.col(vec_col),
        _ivf_cell_col(F.col(vec_col), cents).alias("cell"),
    ).join(F.broadcast(cent_df), "cell")
    w_cell = Window.partitionBy("cell").orderBy(
        F.col("__cos_cent").asc(), F.col(id_col)
    )
    # per-vector norm and double-cast computed ONCE here — the pair
    # verify then does 1 fold per pair, not 3 (the cosine_neardup
    # lesson); same products, same left-fold order, so cos stays
    # bitwise-equal to the oracle's inline cosine
    ranked = (
        assigned.withColumn(
            "__cos_cent", cosine(F.col(vec_col), F.col("__cent"))
        )
        .withColumn("cent_rank", F.row_number().over(w_cell).cast("long"))
        .withColumn("__vd", _to_double(F.col(vec_col)))
        .withColumn(
            "__norm", F.sqrt(dot_strict(F.col(vec_col), F.col(vec_col)))
        )
        .drop("__cent")
    )
    p = ranked.select(
        F.col(id_col), F.col("__vd").alias("__vp"), "cell",
        F.col("cent_rank").alias("__rp"), F.col("__norm").alias("__np"),
    )
    q = ranked.select(
        F.col("__vd").alias("__vq"), "cell",
        F.col("cent_rank").alias("__rq"), F.col("__norm").alias("__nq"),
    )
    # round-15 (guide §2.3): the verify join keys on `cell`, so its
    # parallelism is capped at nlist — and AQE coalesces the tiny-BYTES
    # shuffle to ~1 partition while the PAIR work is quadratic CPU
    # (profile: the whole verify ran as one task). Salt the join: p
    # keeps one salt per row, q replicates salt_n ways, so the pair
    # multiset is IDENTICAL while the work spreads over nlist x salt_n
    # keys; the explicit numbered repartition is exempt from AQE's
    # byte-driven coalescing (which under-provisions CPU-quadratic
    # stages at ANY scale). salt_n = ceil(cores / nlist) capped at 8:
    # at corpus scale the auto-sized nlist >= cores, salt_n == 1 and
    # the salt column is a constant 0 — replication cost exists only
    # where it buys idle cores. The path is UNCONDITIONAL so the plan
    # shape (and the PLANS.md pin) is identical at every parallelism;
    # the join width is nlist-derived but capped at 4x cores so a
    # billion-cell corpus does not explode into nlist tasks.
    par = df.sparkSession.sparkContext.defaultParallelism
    salt_n = min(8, max(1, -(-par // int(nlist))))
    num_parts = salt_n * min(int(nlist), 4 * par)
    p = p.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_n)).cast("int"),
    ).repartition(num_parts, F.col("cell"), F.col("__salt"))
    q = q.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_n)])),
    )
    removed = (
        p.join(q, ["cell", "__salt"])
        .filter(F.col("__rq") < F.col("__rp"))
        .filter(
            _dot_dbl(F.col("__vp"), F.col("__vq"))
            / (F.col("__np") * F.col("__nq"))
            >= F.lit(float(tau))
        )
        .select(id_col)
        .distinct()
        .withColumn("__rm", F.lit(1))
    )
    return (
        ranked.join(removed, on=id_col, how="left")
        .withColumn(
            "is_kept", F.when(F.col("__rm").isNull(), 1).otherwise(0)
        )
        .select(
            id_col, F.col("cell").cast("long").alias("cell"),
            "cent_rank", "is_kept",
        )
        .unionByName(zero_norm)
    )


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric int8 scalar quantization of an embedding column — the
    storage-side compression a 100 TB vector corpus runs before
    anything else (4x less scan IO than float32, 8x less than the
    float64 the engine computes in; the standard SQ8 scheme of the
    FAISS/Milvus family). Per vector:

        scale   = max(|x_i|) / 127
        code_i  = floor(x_i / scale + 0.5)        (scale > 0)

    so every code lands in [-127, 127] by construction (|x|/scale <=
    127 exactly) — no clamp branch, and the rounding rule is floor(x +
    0.5) (half-towards-+inf), picked over banker's/HALF_UP rounding
    because ``floor`` is bit-identical across engines, which keeps the
    whole transform SQL-replayable. Zero vectors quantize to all-zero
    codes with ``scale = 0`` (the CASE guard — IEEE x/0 would poison
    the row with infinities).

    Returns ``(id, scale, codes array<int>)``. Reconstruction error is
    bounded per dimension by ``scale / 2`` (pinned in tests);
    :func:`dequantize_embeddings` inverts. Pure Catalyst (transform +
    aggregate folds) — JVM-side, no Python in the hot path, one
    narrow projection over the corpus."""
    vec_d = _to_double(F.col(vec_col))
    # scale materialized as a REAL column first so the codes transform
    # references it by name (one evaluation per row, not per dim);
    # the expressions are the SHARED _sq8_* helpers — the persisted
    # IVF-SQ8 index and this column op must stay bitwise-identical
    # (the probe==dequantize-compose equivalence is test-pinned)
    staged = df.select(
        F.col(id_col),
        vec_d.alias("__v"),
        _sq8_scale(vec_d).alias("scale"),
    )
    return staged.select(
        id_col,
        "scale",
        _sq8_codes(F.col("__v"), F.col("scale")).alias("codes"),
    )


def dequantize_embeddings(
    qdf: DataFrame,
    id_col: str = "vec_id",
    scale_col: str = "scale",
    codes_col: str = "codes",
    vec_col: str = "embedding",
) -> DataFrame:
    """Invert :func:`quantize_embeddings`: ``x_i ~ code_i * scale``
    (exact IEEE multiply of an integer by the stored scale — the
    reconstruction every SQ8 serving path performs at probe time).
    Returns ``(id, embedding array<double>)``; per-dimension error vs
    the original is <= scale/2 by the rounding rule (pinned)."""
    return qdf.select(
        F.col(id_col),
        _sq8_decode(F.col(codes_col), F.col(scale_col)).alias(vec_col),
    )


# ---------------------------------------------------------------------------
# IVF-SQ8 — the fifth persisted ANN layout, completing the quantized
# index family (LSH / IVF / PQ / IVF-PQ / IVF-SQ8): IVF cell pruning
# over vectors stored as per-vector int8 scalar-quantized codes (the
# scheme of :func:`quantize_embeddings`; the FAISS/Milvus "IVF,SQ8"
# middle ground between the exact IVF scan and the lossy PQ codes).
# A probe reads nprobe/nlist of the corpus at CODE width — 4x less
# scan IO than the IVF index's float32 (8x vs the float64 the engine
# computes in) — and reconstructs x_i ~ code_i * scale inline as a
# pure-Catalyst transform, ranking by exact cosine over the
# reconstructed vectors (per-dimension reconstruction error <=
# scale/2, so recall sits between IVF-exact and IVF-PQ's m-subspace
# codes). Unlike IVF-PQ there is NO trained codebook: quantization is
# per-vector arithmetic (scale = max|x_i| / 127, code = floor(x/scale
# + 0.5)), so appends never drift from a training sample and the
# whole construction — cell assignment, quantization, reconstruction,
# cosine fold — is bitwise-replayable by the DuckDB oracle.
# ---------------------------------------------------------------------------


def _sq8_scale(vec_d: Column) -> Column:
    """Per-vector SQ8 scale ``max(|x_i|) / 127`` — the
    :func:`quantize_embeddings` fold (greatest-fold from 0.0, so the
    oracle's ``list_reduce(list_prepend(0.0, ...), greatest)``
    replays it bitwise)."""
    absmax = F.aggregate(
        F.transform(vec_d, lambda x: F.abs(x)),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    return absmax / F.lit(127.0)


def _sq8_codes(vec_d: Column, scale: Column) -> Column:
    """SQ8 codes ``floor(x / scale + 0.5)`` in [-127, 127] (zero
    vectors -> all-zero codes; same CASE guard as
    :func:`quantize_embeddings`)."""
    return F.when(
        scale > 0,
        F.transform(
            vec_d, lambda x: F.floor(x / scale + F.lit(0.5)).cast("int")
        ),
    ).otherwise(F.transform(vec_d, lambda x: F.lit(0)))


def _sq8_decode(codes: Column, scale: Column) -> Column:
    """Reconstruct ``x_i ~ code_i * scale`` (exact IEEE multiply —
    the :func:`dequantize_embeddings` transform inlined at probe
    time; no Python, no shuffle)."""
    return F.transform(codes, lambda c: c.cast("double") * scale)


def _sq8_rows(
    df: DataFrame,
    cents: list[tuple],
    vec_col: str,
    id_col: str,
    extras: tuple[str, ...] | list[str],
    dim: int | None = None,
    caller: str = "_sq8_rows",
) -> DataFrame:
    """``(id, cell, scale, codes, vec, extras...)`` for every input
    vector — the row layout both the build and the append land: cell
    from the shared native argmax, scale/codes per vector. The raw
    vector column is KEPT (like the IVF-PQ index) so ``rerank=R`` can
    read exact embeddings for R ids alone; columnar pruning keeps it
    out of code-only probe scans. ``dim`` (when known) arms the exact
    write-path guard (:func:`_dim_guard_col`)."""
    vcol = (
        _dim_guard_col(F.col(vec_col), dim, caller).alias(vec_col)
        if dim is not None
        else F.col(vec_col)
    )
    staged = df.select(
        F.col(id_col),
        vcol,
        _to_double(F.col(vec_col)).alias("__v"),
        _ivf_cell_col(F.col(vec_col), cents).alias("cell"),
        *[F.col(c) for c in extras],
    ).withColumn("scale", _sq8_scale(F.col("__v")))
    return staged.select(
        F.col(id_col),
        F.col("cell"),
        F.col("scale"),
        _sq8_codes(F.col("__v"), F.col("scale")).alias("codes"),
        F.col(vec_col),
        *[F.col(c) for c in extras],
    )


def build_ann_ivfsq8_index(
    df: DataFrame,
    path: str,
    nlist: int | None = ANN_NLIST,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    lloyd_iters: int = 0,
    commit: str = "rename",
    extra_cols: tuple[str, ...] = (),
    target_cell: int = 256,
    dim: int = ANN_DIM,
) -> None:
    """Build a persisted IVF-SQ8 index: IVF cells (directory-
    partitioned like :func:`build_ann_ivf_index`, same seeded
    centroid pick / optional Lloyd refinement / auto ``nlist=None``
    sizing) holding per-vector SQ8 codes instead of raw floats.
    Layout: cell-partitioned rows ``(id, cell, scale, codes, vec,
    extra_cols...)`` under ``ingest_batch_id=-1``, the centroid table
    at ``<path>/_centroids``, and ``<path>/_sq_meta`` (dim + scheme)
    marking the layout for autodetection (compaction, stats, the
    maintenance planner). ``commit``/``extra_cols`` carry the shared
    storage and filtered-ANN contracts of the IVF build."""
    from ..sources.bucketed import write_partitioned
    from ..sources.manifest import begin_generation, commit_generation
    from .dedup import _rm_dir, spread_small_input

    if lloyd_iters < 0:
        raise ValueError(f"lloyd_iters must be >= 0, got {lloyd_iters}")
    if commit not in ("rename", "manifest"):
        raise ValueError(f"commit must be 'rename' or 'manifest', got {commit!r}")
    _check_extra_cols(extra_cols, id_col, vec_col)
    bad_sq8 = [c for c in extra_cols if c in _SQ8_RESERVED_COLS]
    if bad_sq8:
        raise ValueError(
            f"extra_cols {bad_sq8} collide with the IVF-SQ8 layout "
            f"columns {_SQ8_RESERVED_COLS}"
        )
    _check_corpus_dim(df, vec_col, dim, "build_ann_ivfsq8_index")
    if nlist is None:
        # auto-size cells (see build_ann_ivf_index — same rule, same
        # fixed-default-for-oracles / None-at-scale contract)
        nlist = max(1, -(-df.count() // int(target_cell)))
    cents = _ivf_centroids(df, nlist, vec_col, id_col)
    if lloyd_iters and cents:
        cents = _lloyd_refine(df, cents, lloyd_iters, vec_col)
    spark = df.sparkSession
    if commit == "manifest":
        staging = begin_generation(spark, path)
    else:
        staging = f"{path}.building"
        _rm_dir(spark, staging)  # stale staging from a crashed build
    df = spread_small_input(df)
    celled = _sq8_rows(
        df, cents, vec_col, id_col, extra_cols,
        dim=dim, caller="build_ann_ivfsq8_index",
    )
    write_partitioned(celled, f"{staging}/ingest_batch_id=-1", "cell")
    # occupancy side table (VERDICT r14 item 2): read-back, no data
    # columns touched (cell is the directory name)
    _write_occ_counts(
        _occ_read_back(spark, f"{staging}/ingest_batch_id=-1", "cell"),
        "cell",
        staging,
        -1,
        "overwrite",
    )
    cent_rows = [(i, cid, vec) for i, (cid, vec) in enumerate(cents)]
    local_rows_df(
        spark,
        cent_rows, "cell int, cent_id bigint, centroid array<double>"
    ).coalesce(1).write.mode("overwrite").parquet(f"{staging}/_centroids")
    local_rows_df(
        spark,
        [(int(dim), "sq8_pervec")], "dim int, scheme string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{staging}/_sq_meta")
    if commit == "manifest":
        commit_generation(spark, path, staging)
    else:
        _publish_index(spark, staging, path)


def append_to_ann_ivfsq8_index(
    df: DataFrame,
    path: str,
    batch_id: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Quantize a new corpus batch against a persisted IVF-SQ8 index's
    EXISTING centroids and land it in its own batch partition — the
    IVF append contract (:func:`append_to_ann_ivf_index`: centroids
    do not move; ``batch_id`` set -> overwrite-own-partition
    replay-safe, unset -> at-least-once base append). Because SQ8 has
    no trained codebook, appended batches quantize EXACTLY like the
    build — no quantizer drift, the property PQ appends give up."""
    from ..sources.bucketed import write_partitioned
    from ..sources.manifest import resolve_root
    from .dedup import spread_small_input

    if batch_id is not None and batch_id < 0:
        raise ValueError(
            f"batch_id must be >= 0, got {batch_id}: negative ids are "
            "reserved (ingest_batch_id=-1 is the base partition the "
            "build wrote)"
        )
    spark = df.sparkSession
    path = resolve_root(spark, path)
    jfs = spark.sparkContext._jvm.org.apache.hadoop.fs.Path
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    fs = jfs(path).getFileSystem(conf)
    if not fs.exists(jfs(f"{path}/_sq_meta")):
        raise ValueError(
            f"no IVF-SQ8 index at {path!r} (missing _sq_meta): build "
            "it first with build_ann_ivfsq8_index, or use the append "
            "matching the store's layout"
        )
    meta_dim = int(spark.read.parquet(f"{path}/_sq_meta").head().dim)
    _check_corpus_dim(df, vec_col, meta_dim, "append_to_ann_ivfsq8_index")
    # bounded-collect: nlist centroid rows from the index metadata
    cent_rows = (
        spark.read.parquet(f"{path}/_centroids").orderBy("cell").collect()
    )
    if not cent_rows:
        raise ValueError(f"{path!r} holds no centroid table; build first")
    cents = [(r.cent_id, [float(x) for x in r.centroid]) for r in cent_rows]
    extras = [
        c
        for c in _index_extra_cols(spark.read.parquet(path), id_col, vec_col)
        if c not in _SQ8_RESERVED_COLS
    ]
    df = spread_small_input(df)
    celled = _sq8_rows(
        df, cents, vec_col, id_col, extras,
        dim=meta_dim, caller="append_to_ann_ivfsq8_index",
    )
    part = -1 if batch_id is None else batch_id
    mode = "append" if batch_id is None else "overwrite"
    if mode == "overwrite":
        _invalidate_occ_counts(df.sparkSession, path, part)
    write_partitioned(
        celled, f"{path}/ingest_batch_id={part}", "cell", mode=mode
    )
    # occupancy delta for this batch (VERDICT r14 item 2): read-back
    # for batch-keyed writes; base appends count the assignment frame
    # (pruning keeps the SQ8 encode out of the aggregate)
    _append_occ_counts(celled, "cell", path, part, mode)


def ann_ivfsq8_topk_indexed(
    spark,
    index_path: str,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = ANN_NPROBE,
    rerank: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    where=None,
    before_batch: int | None = None,
) -> DataFrame:
    """Probe a persisted IVF-SQ8 index: rank the ``nprobe`` best cells
    by centroid dot driver-side, scan ONLY those cell directories
    reading ``(id, scale, codes)`` (columnar pruning skips the stored
    embedding), reconstruct ``code * scale`` inline, rank by exact
    cosine over the reconstructed vectors — deterministic (acos desc,
    id) top-k, returned as ``(id, rank, acos)``. ``rerank=R`` re-ranks
    the top-R by exact cosine over the TRUE embeddings (read for those
    R ids alone), returning ``(id, rank, cos)``. ``where`` filters
    inside the pruned scan over stored ``extra_cols``;
    ``before_batch`` fences the read to earlier batch partitions."""
    from ..sources.manifest import resolve_root

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    if rerank is not None and rerank < k:
        raise ValueError(f"rerank ({rerank}) must be >= k ({k})")
    path = resolve_root(spark, index_path)
    meta_dim = _load_sq_meta_dim(spark, path)
    if len(query_vec) != meta_dim:
        raise ValueError(f"query dim {len(query_vec)} != index dim {meta_dim}")
    cents = _load_centroids(spark, path)
    probes = _ivf_probe_cells(query_vec, cents, nprobe)
    idx = _before_batch(spark.read.parquet(path), before_batch)
    filt = _apply_where(idx.filter(F.col("cell").isin(probes)), where)
    dec = _sq8_decode(F.col("codes"), F.col("scale"))
    take = k if rerank is None else rerank
    # scale == 0 <=> the stored vector is all-zero: its reconstructed
    # cosine is 0/0 — NULL it explicitly (sorts last under DESC) so
    # ANSI mode never trips on the degenerate row
    acos = F.when(
        F.col("scale") > 0, cosine(dec, _vec_lit(query_vec))
    )
    ranked = (
        filt.select(F.col(id_col), acos.alias("acos"))
        .orderBy(F.desc("acos"), F.col(id_col))
        .limit(take)
    )
    if rerank is None:
        w = Window.orderBy(F.desc("acos"), F.col(id_col))
        return ranked.select(
            id_col, F.row_number().over(w).alias("rank"), "acos"
        )
    cand = ranked.select(id_col)
    vecs = idx.select(id_col, vec_col).join(cand, id_col)
    return _rank_topk(vecs, query_vec, k, vec_col, id_col)


def ann_ivfsq8_join_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = ANN_NPROBE,
    rerank: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
    where=None,
    before_batch: int | None = None,
) -> DataFrame:
    """Batch ANN against a persisted IVF-SQ8 index — the R-S form of
    :func:`ann_ivfsq8_topk_indexed` (per-query output identical to
    looping the single probe): probe the index for EVERY query of
    ``queries`` in one job, scanning only the union of the batch's
    probed cell directories at code width. Returns
    ``(query_id, id, acos, rank)``, rank 1..k per query by
    reconstructed cosine.

    ``rerank=R`` adds the per-query exact-cosine tail over each
    query's top-R reconstructed candidates (embeddings read for those
    (query, id) pairs alone), returning the ``cosine_join`` shape
    ``(query_id, id, cos, rank)``.

    Scale shape: same as :func:`ann_ivf_join_indexed` — per-query
    probe cells ranked driver-side against the bounded nlist-row
    centroid table, (query, cell) pairs + query vectors broadcast,
    candidate generation shuffle-free up to the per-query top-k
    window; the scan reads codes instead of floats (the SQ8 IO win).

    |Q| ceiling: the query batch is driver-materialized by design
    (8*dim bytes per vector — 10^5 queries at dim 64 is ~50 MB, far
    under driver memory); millions of queries should chunk the batch
    and union the outputs (per-query independence makes chunking
    semantics-free)."""
    from pyspark.sql import Window as W
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        IntegerType,
        StructField,
        StructType,
    )

    from ..sources.manifest import resolve_root

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if nprobe < 1:
        raise ValueError(f"nprobe must be >= 1, got {nprobe}")
    if rerank is not None and rerank < k:
        raise ValueError(f"rerank ({rerank}) must be >= k ({k})")
    path = resolve_root(spark, index_path)
    dim = _load_sq_meta_dim(spark, path)
    cents = _load_centroids(spark, path)
    # shared batch-probe front door (collect + empty check + NULL/dim
    # validation) — the same helper the IVF-PQ twin uses, so the dense
    # batch probes cannot drift apart (ADVICE r12)
    qid_type, qbatch = _collect_query_batch(
        queries, query_id_col, query_vec_col, dim
    )
    pairs = [
        (qid, int(cell))
        for qid, vec in qbatch
        for cell in _ivf_probe_cells(vec, cents, nprobe)
    ]
    cells = sorted({c for _, c in pairs})
    qcells = local_rows_df(
        spark,
        pairs,
        StructType(
            [
                StructField(query_id_col, qid_type),
                StructField("cell", IntegerType()),
            ]
        ),
    )
    qvecs = local_rows_df(
        spark,
        qbatch,
        StructType(
            [
                StructField(query_id_col, qid_type),
                StructField("__qv", ArrayType(DoubleType())),
            ]
        ),
    )
    idx = _apply_where(
        _before_batch(spark.read.parquet(path), before_batch)
        .filter(F.col("cell").isin(cells)),
        where,
    )
    dec = _sq8_decode(F.col("codes"), F.col("scale"))
    scored = (
        idx.join(F.broadcast(qcells), "cell")
        .join(F.broadcast(qvecs), query_id_col)
        .select(
            F.col(query_id_col),
            F.col(id_col),
            # NULL for all-zero stored vectors (scale == 0) — same
            # ANSI guard as the single probe
            F.when(
                F.col("scale") > 0, cosine(dec, F.col("__qv"))
            ).alias("acos"),
        )
    )
    w = W.partitionBy(query_id_col).orderBy(
        F.col("acos").desc(), F.col(id_col).asc()
    )
    take = k if rerank is None else rerank
    ranked = (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= take)
    )
    if rerank is None:
        return ranked
    cand = ranked.select(query_id_col, id_col)
    return _batch_exact_rerank(
        cand, idx.select(id_col, vec_col), qvecs, k,
        vec_col, id_col, query_id_col,
    )
