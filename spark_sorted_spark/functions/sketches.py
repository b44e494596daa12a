"""Portable sketches: approximate distinct counting whose result is
BIT-REPRODUCIBLE across engines.

``approx_count_distinct`` (Spark) and ``approx_count_distinct``
(DuckDB) both speak HyperLogLog but with incompatible hash functions
and register layouts — their estimates can't be compared, which
makes them untestable against an oracle and irreproducible across
stack upgrades. This module implements HLL from scratch on the
engine's own relational primitives so the SAME documents always
produce the SAME estimate, in Spark and in DuckDB:

* hash: the repo's portable md5-derived integer (60 bits);
* register index: low ``b`` bits; rank (rho): leading-zero count of
  the remaining window + 1, computed EXACTLY via the binary-string
  length (``F.bin`` / DuckDB ``bin`` agree bit for bit) — no
  float log2 anywhere;
* per-register max is an integer aggregate (order-insensitive by
  definition);
* the harmonic sum folds ``2^-M[j]`` in FIXED register order via a
  strict left fold — each term is an exact power of two
  (``1.0 / (1 << M[j])``, never ``pow``), so the float sum is the
  identical IEEE sequence on both engines;
* the final estimate is one constant multiply-divide
  (``alpha_m * m^2 / hsum`` with the constant folded in Python), so
  no libm call whose last ulp could differ between engines.

The standard small-range linear-counting correction needs ``ln``.
Historically this module returned only the RAW estimate plus
``zero_registers`` (Spark's JVM ``Math.log`` has no cross-engine bit
guarantee — the round-10 audit measured ~4.4% last-ulp disagreement
vs glibc); since ``exactmath.ln_libm`` routes ln through the SAME
libm the DuckDB oracle calls, ``hll_estimate(corrected=True)`` now
applies ``m * ln(m / V)`` in-engine, bitwise-reproducibly, on the
bounded one-row-per-group estimate relation (the sanctioned ln_libm
shape). The raw columns remain so callers can audit the branch.

Scale: one explode + one 2^b-register aggregate — the shuffle
carries at most m rows per partition after partial aggregation,
regardless of input size. That is the whole point of HLL at 100 TB:
count distinct shingles/tokens/urls with m registers of state
instead of a distinct shuffle of the values themselves.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_distinct",
    "hll_register_table",
    "hll_merge",
    "hll_estimate",
    "bloom_build",
    "bloom_members",
    "bloom_merge",
    "cms_build",
    "cms_estimate",
    "cms_merge",
    "cms_heavy_hitters",
    "histogram_sketch",
    "histogram_merge",
    "histogram_quantiles",
    "kmv_sketch",
    "kmv_merge",
    "kmv_estimate",
    "kmv_overlap",
    "kmv_overlap_matrix",
]

_HASH_BITS = 60  # md5-derived h60 (15 hex chars), nonnegative in int64


def _alpha_const(m: int) -> float:
    # alpha_m * m^2 folded to ONE Python-computed literal, embedded
    # identically in the Spark plan and the SQL oracle
    if m == 16:
        alpha = 0.673
    elif m == 32:
        alpha = 0.697
    elif m == 64:
        alpha = 0.709
    else:
        alpha = 0.7213 / (1 + 1.079 / m)
    return alpha * m * m


def hll_register_table(
    df: DataFrame, value: Column | str, b: int = 8, keys=()
) -> DataFrame:
    """The HLL SKETCH itself: ``(keys..., reg, max_rho)`` rows, at
    most ``m = 2^b`` per key group (registers never observed are
    absent = rank 0). This is the persistable, MERGEABLE artifact —
    build one per day/partition/source, store a few hundred integer
    rows each, and answer any union's distinct count later via
    :func:`hll_merge` + :func:`hll_estimate` without touching the
    data again. That composability is the whole reason to keep
    sketch state instead of a distinct shuffle at 100 TB.

    ``keys`` makes it a GROUPED sketch (one register set per key —
    the "distinct users per day" shape): m integer rows of state per
    key instead of a per-key distinct."""
    if not 4 <= b <= 16:
        raise ValueError(f"b must be in [4, 16], got {b}")
    keys = [keys] if isinstance(keys, str) else list(keys)
    if "ingest_batch_id" in keys:
        raise ValueError(
            "'ingest_batch_id' is reserved for the streaming register "
            "store's partition column and cannot be a sketch key; "
            "rename the column"
        )
    m = 1 << b
    window = _HASH_BITS - b  # rank window width
    v = F.col(value) if isinstance(value, str) else value
    h60 = F.conv(F.substring(F.md5(v), 1, 15), 16, 10).cast("bigint")
    bucket = h60 % m
    # rest = h60 div m via shiftright — m is 2^b and h60 is 60 bits,
    # so this stays exact where float division (h60 > 2^53) would not.
    # length(bin(rest)) = floor(log2(rest)) + 1 for rest > 0
    rest_int = F.shiftright(h60, b)
    rho = F.when(
        rest_int > 0, F.lit(window + 1) - F.length(F.bin(rest_int))
    ).otherwise(F.lit(window + 1))
    return (
        df.select(*keys, bucket.alias("reg"), rho.alias("rho"))
        .groupBy(*keys, "reg")
        .agg(F.max("rho").alias("max_rho"))
    )


def hll_merge(*reg_tables: DataFrame, keys=()) -> DataFrame:
    """Merge register tables built with the SAME ``b`` (and, for
    grouped sketches, the same ``keys``): element-wise register max.
    Exact by construction — ``max`` is associative and commutative,
    so ``hll_merge(sketch(A), sketch(B))`` is row-identical to
    ``sketch(A UNION ALL B)``, registers and estimate alike (pinned
    by test). Mixing different ``b`` values would silently alias
    registers; the caller owns that contract (the tables carry no
    parameter column by design — they are pure (reg, max_rho)
    state)."""
    if not reg_tables:
        raise ValueError("hll_merge needs at least one register table")
    keys = [keys] if isinstance(keys, str) else list(keys)
    merged = reg_tables[0]
    for t in reg_tables[1:]:
        merged = merged.unionByName(t)
    _check_register_keys(merged, keys, "hll_merge")
    return merged.groupBy(*keys, "reg").agg(
        F.max("max_rho").alias("max_rho")
    )


def _check_register_keys(
    regs: DataFrame, keys, caller: str, *, tolerate_batch_col: bool = False
) -> None:
    """A GROUPED register table processed without its ``keys=`` would
    silently merge registers ACROSS key groups — a wrong estimate
    with no error. Any column beyond (keys, reg, max_rho) means the
    caller forgot (or misspelled) the key list. Only the streaming
    STORE readers may tolerate an extra ``ingest_batch_id`` column
    (their partition key, merged away by design); tolerating it
    generically would let a user key that happens to bear that name
    slip past the guard and be silently merged across groups."""
    tolerated = {"ingest_batch_id"} if tolerate_batch_col else set()
    extra = set(regs.columns) - {"reg", "max_rho"} - tolerated - set(keys)
    if extra:
        raise ValueError(
            f"{caller}: register table carries key columns "
            f"{sorted(extra)} not listed in keys={keys}; merging or "
            "folding across them would silently mix key groups"
        )


def hll_estimate(
    regs: DataFrame, b: int = 8, keys=(), corrected: bool = False
) -> DataFrame:
    """Fold a register table into
    ``(keys..., zero_registers, harmonic_sum, estimate)`` — one row
    per key group (one row total without ``keys``) — with the same
    fixed-order, bitwise-reproducible fold :func:`hll_distinct`
    performs (see module docstring).

    ``corrected=True`` appends ``corrected_estimate``: the standard
    small-range linear-counting branch ``m * ln(m / zero_registers)``
    when the raw estimate is <= 2.5m and zero registers remain
    (Flajolet et al. 2007 §4), else the raw estimate. The ln runs
    through ``exactmath.ln_libm`` on this one-row-per-group relation
    — the bounded-aggregate shape that keeps the Python pass off the
    hot path — and the multiply/divide by ``m`` (a power of two) is
    exact scaling, so the corrected value is bitwise-reproducible
    against a DuckDB ``CASE WHEN ... ln(...)`` replay."""
    if not 4 <= b <= 16:
        raise ValueError(f"b must be in [4, 16], got {b}")
    keys = [keys] if isinstance(keys, str) else list(keys)
    _check_register_keys(regs, keys, "hll_estimate")
    m = 1 << b
    window = _HASH_BITS - b
    # per-group reduce: registers -> lookup map -> fixed-order fold.
    # 2^-M comes from a literal lookup table of exact powers of two
    # (Python doubles are exact for 2^-k), indexed by rank — no pow(),
    # no shift-by-column
    pows = F.array(*[F.lit(1.0 / (1 << k)) for k in range(window + 2)])
    reg_map = F.map_from_entries(F.collect_list(F.struct("reg", "max_rho")))
    const = _alpha_const(m)
    out = regs.groupBy(*keys).agg(
        (F.lit(m) - F.count(F.lit(1))).alias("zero_registers"),
        F.aggregate(
            F.sequence(F.lit(0), F.lit(m - 1)),
            F.lit(0.0),
            lambda acc, j: acc
            + F.element_at(
                pows,
                F.coalesce(F.element_at(reg_map, j.cast("bigint")), F.lit(0))
                + 1,
            ),
        ).alias("harmonic_sum"),
    ).withColumn("estimate", F.lit(const) / F.col("harmonic_sum"))
    if not corrected:
        return out
    from .exactmath import ln_libm

    # the ln argument is NULL when no registers are empty, so the
    # Arrow pass null-passes instead of raising on the dead branch
    lc = F.lit(float(m)) * ln_libm(
        F.when(
            F.col("zero_registers") > 0,
            F.lit(float(m)) / F.col("zero_registers"),
        )
    )
    return out.withColumn(
        "corrected_estimate",
        F.when(
            (F.col("estimate") <= F.lit(2.5 * m))
            & (F.col("zero_registers") > 0),
            lc,
        ).otherwise(F.col("estimate")),
    )


def hll_distinct(
    df: DataFrame, value: Column | str, b: int = 8, corrected: bool = False
) -> DataFrame:
    """One-row DataFrame ``(zero_registers, harmonic_sum, estimate,
    exact_distinct)`` estimating the distinct count of ``value`` with
    ``m = 2^b`` registers. ``exact_distinct`` (a plain distinct count)
    rides along so accuracy is auditable in the same result; at 100 TB
    drop it and keep only the sketch. ``corrected=True`` adds the
    linear-counting ``corrected_estimate`` (see :func:`hll_estimate`).

    Composed from :func:`hll_register_table` + :func:`hll_estimate`
    (sketch state is first-class and mergeable); the expressions are
    the ones this function always used, so the estimate stays
    bitwise-reproducible against the DuckDB oracle.
    """
    v = F.col(value) if isinstance(value, str) else value
    folded = hll_estimate(hll_register_table(df, value, b), b, corrected=corrected)
    exact = df.select(v.alias("__v")).agg(
        F.countDistinct("__v").alias("exact_distinct")
    )
    cols = ["zero_registers", "harmonic_sum", "estimate"]
    if corrected:
        cols.append("corrected_estimate")
    # declared-crossjoin: both sides are ONE-row aggregates
    return folded.crossJoin(exact).select(*cols, "exact_distinct")


# ---------------------------------------------------------------------------
# Portable Bloom filter: set-membership prefilter whose bit pattern is
# identical across Spark and DuckDB (native bloom_filter_agg / Spark's
# Bloom join hints use engine-private hashing — untestable against an
# oracle). Same design rules as the HLL above: md5-derived integer
# hashes, double hashing pos_i = (h1 + i*h2) mod m, 32-bit words so
# every bit constant fits int64, and bit_or integer aggregation —
# no floats anywhere.
#
# Scale: the built filter is m/32 rows (a few KB for m=2^15) — it
# BROADCASTS to the probe side, so membership is a scan + broadcast
# join with zero shuffle of the probed data. The decontamination
# prefilter use: build over the benchmark's shingles (small), probe
# 100 TB of corpus shingles at scan speed, and only bloom-positive
# docs proceed to the exact inverted-index join. No false negatives
# by construction; false-positive rate ~ (1 - e^{-kn/m})^k.
# ---------------------------------------------------------------------------

_BLOOM_WORD_BITS = 32


def _bloom_positions(v: Column, m_bits: int, k: int) -> Column:
    """Array of ``k`` bit positions for value ``v`` via double hashing
    over two independent 60-bit md5 windows (chars 1-15 and 16-30).
    All arithmetic stays under 2^62 in int64 for k <= 4."""
    h1 = F.conv(F.substring(F.md5(v), 1, 15), 16, 10).cast("bigint")
    h2 = F.conv(F.substring(F.md5(v), 16, 15), 16, 10).cast("bigint")
    return F.array(*[((h1 + F.lit(i) * h2) % m_bits) for i in range(k)])


def bloom_build(
    df: DataFrame, value: Column | str, m_bits: int = 1 << 15, k: int = 4
) -> DataFrame:
    """Build the filter: ``(word, bits)`` rows (32-bit words, absent
    word = 0). ``m_bits`` must be a power of two."""
    if m_bits & (m_bits - 1) or m_bits <= 0:
        raise ValueError(f"m_bits must be a power of two, got {m_bits}")
    if not 1 <= k <= 4:
        raise ValueError(f"k must be in [1, 4], got {k}")
    v = F.col(value) if isinstance(value, str) else value
    pow2 = F.array(*[F.lit(1 << b) for b in range(_BLOOM_WORD_BITS)])
    pos = F.explode(_bloom_positions(v, m_bits, k)).alias("pos")
    return (
        df.select(pos)
        .select(
            F.shiftright(F.col("pos"), 5).alias("word"),
            F.element_at(
                pow2, ((F.col("pos") % _BLOOM_WORD_BITS) + 1).cast("int")
            ).alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
        # parameter metadata rides IN the filter so a probe with
        # mismatched m_bits/k fails loudly instead of silently
        # reporting false negatives (positions computed mod a
        # different m map to words the filter never wrote)
        .withColumn("m_bits", F.lit(m_bits))
        .withColumn("k", F.lit(k))
    )


def _check_merge_params(tables, cols, kind):
    """Materialize each (tiny) sketch once, then require identical
    build parameters — merging sketches built in different parameter
    spaces silently corrupts state, the same failure mode the probe
    guards catch. Returns ``(materialized_tables, params)``; the
    eager checkpoint matters because the check is an action and the
    merged plan would otherwise rebuild every input sketch a second
    time."""
    tables = [t.localCheckpoint(eager=True) for t in tables]
    metas = []
    for t in tables:
        # bounded-collect: one parameter row per sketch (limit 1)
        rows = t.select(*cols).limit(1).collect()
        if rows:
            metas.append(tuple(rows[0]))
    if len(set(metas)) > 1:
        raise ValueError(
            f"{kind} merge across mismatched parameters {sorted(set(metas))}"
            f" ({'/'.join(cols)} must be identical)"
        )
    return tables, (metas[0] if metas else None)


def bloom_merge(*blooms: DataFrame) -> DataFrame:
    """Merge Bloom filters built with the SAME (m_bits, k): word-wise
    ``bit_or``. Exact: OR is associative, so
    ``bloom_merge(build(A), build(B))`` is row-identical to
    ``build(A UNION ALL B)`` (pinned by test) — build one filter per
    corpus shard/day, merge for any union, probe once. Raises on
    parameter mismatch (carried in the filters)."""
    if not blooms:
        raise ValueError("bloom_merge needs at least one filter")
    blooms, _ = _check_merge_params(blooms, ["m_bits", "k"], "bloom")
    # carry the param columns THROUGH the merge (verified identical
    # across inputs, so grouping by them changes nothing) rather than
    # re-attaching a collected value: an all-empty merge then still
    # emits the full (word, bits, m_bits, k) schema downstream probes
    # and future merges expect, instead of a schema-degraded sketch
    merged = blooms[0].select("word", "bits", "m_bits", "k")
    for b in blooms[1:]:
        merged = merged.unionByName(b.select("word", "bits", "m_bits", "k"))
    return (
        merged.groupBy("word", "m_bits", "k")
        .agg(F.bit_or("bits").alias("bits"))
        .select("word", "bits", "m_bits", "k")
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count-min sketches built with the SAME (width, depth):
    cell-wise counter sum. Exact for bag semantics:
    ``cms_merge(build(A), build(B))`` is row-identical to
    ``build(A UNION ALL B)`` (pinned by test). Raises on parameter
    mismatch (carried in the sketches)."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    sketches, _ = _check_merge_params(sketches, ["width", "depth"], "cms")
    # same schema-preserving trick as bloom_merge: params verified
    # identical, so grouping by them is free and an all-empty merge
    # keeps the full (row, col, cnt, width, depth) schema
    merged = sketches[0].select("row", "col", "cnt", "width", "depth")
    for s in sketches[1:]:
        merged = merged.unionByName(
            s.select("row", "col", "cnt", "width", "depth")
        )
    return (
        merged.groupBy("row", "col", "width", "depth")
        .agg(F.sum("cnt").alias("cnt"))
        .select("row", "col", "cnt", "width", "depth")
    )


def bloom_members(
    probe: DataFrame,
    value: Column | str,
    bloom: DataFrame,
    m_bits: int = 1 << 15,
    k: int = 4,
) -> DataFrame:
    """DISTINCT rows of ``probe`` whose ``value`` the filter MIGHT
    contain (all ``k`` probed bits set — no false negatives, bounded
    false positives). Membership is ``min(bit hit) == 1`` per group of
    probe columns, so duplicate probe rows are safe (they collapse to
    one output row). The filter broadcasts; the probe is never
    shuffled beyond the membership groupBy.

    Raises ``ValueError`` when ``m_bits``/``k`` disagree with the
    parameters the filter was BUILT with (carried in the filter
    itself) — a mismatched probe computes positions in a different
    bit space and would silently report false negatives otherwise.

    The filter is materialized once (eager localCheckpoint): the
    parameter check is an action, and the returned plan would
    otherwise rebuild the filter a second time when forced.
    """
    bloom = bloom.localCheckpoint(eager=True)
    # bounded-collect: one parameter row (limit 1)
    meta = bloom.select("m_bits", "k").limit(1).collect()
    if meta and (meta[0].m_bits != m_bits or meta[0].k != k):
        raise ValueError(
            f"bloom filter was built with m_bits={meta[0].m_bits}, "
            f"k={meta[0].k}; probing with m_bits={m_bits}, k={k} would "
            "produce false negatives"
        )
    bloom = bloom.select("word", "bits")
    v = F.col(value) if isinstance(value, str) else value
    pow2 = F.array(*[F.lit(1 << b) for b in range(_BLOOM_WORD_BITS)])
    probed = probe.select(
        "*", F.explode(_bloom_positions(v, m_bits, k)).alias("__pos")
    ).select(
        "*",
        F.shiftright(F.col("__pos"), 5).alias("__word"),
        F.element_at(
            pow2, ((F.col("__pos") % _BLOOM_WORD_BITS) + 1).cast("int")
        ).alias("__bit"),
    )
    hits = (
        probed.join(
            F.broadcast(bloom.withColumnRenamed("word", "__word")),
            on="__word",
            how="left",
        )
        .withColumn(
            "__hit",
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("__bit"))
                != 0
            ).cast("int"),
        )
        .groupBy(*[c for c in probe.columns])
        .agg(F.min("__hit").alias("__member"))
    )
    return hits.filter(F.col("__member") == 1).drop("__member")


# ---------------------------------------------------------------------------
# Portable count-min sketch: approximate frequency counting with the
# same cross-engine guarantees as the HLL and Bloom above. Counters
# are plain integer counts (order-insensitive aggregation), positions
# come from the same md5 double-hashing as the Bloom filter, so the
# whole sketch — and every estimate read from it — is reproducible in
# DuckDB.
#
# Guarantee: estimate >= true count always (never undercounts);
# overcount bounded by eps*N with prob 1-delta for w = ceil(e/eps),
# d = ceil(ln(1/delta)). Heavy-hitter use at 100 TB: d*w integer
# cells of state (a few KB) instead of a full groupBy over trillions
# of token occurrences; the sketch broadcasts to the estimate side.
# ---------------------------------------------------------------------------


def _cms_positions(v: Column, width: int, depth: int) -> Column:
    """Array of ``depth`` column positions (row i probes position i of
    the array) — same double-hashing family as the Bloom filter."""
    return _bloom_positions(v, width, depth)


def cms_build(
    df: DataFrame, value: Column | str, width: int = 1 << 12, depth: int = 4
) -> DataFrame:
    """Count-min sketch of ``value`` occurrences: ``(row, col, cnt)``
    cells (absent cell = 0). ``width`` must be a power of two;
    ``depth`` <= 4 (the double-hash family's int64 headroom)."""
    if width & (width - 1) or width <= 0:
        raise ValueError(f"width must be a power of two, got {width}")
    if not 1 <= depth <= 4:
        raise ValueError(f"depth must be in [1, 4], got {depth}")
    v = F.col(value) if isinstance(value, str) else value
    return (
        df.select(
            F.posexplode(_cms_positions(v, width, depth)).alias("row", "col")
        )
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("width", F.lit(width))
        .withColumn("depth", F.lit(depth))
    )


def cms_heavy_hitters(
    df: DataFrame,
    value: Column | str,
    min_count: int,
    width: int = 1 << 12,
    depth: int = 4,
) -> DataFrame:
    """Exact heavy hitters with a CMS prefilter: every distinct value
    whose TRUE occurrence count is >= ``min_count``, as
    ``(value, n_occurrences)`` — exact counts, not estimates.

    Scale story (the reason this beats a plain
    ``GROUP BY ... HAVING``): the sketch is depth x width integer
    cells built in one pass; each row's estimate is then read via
    ``depth`` BROADCAST hash joins (one per sketch row — map-side,
    no shuffle, no per-value aggregation), and only rows whose
    estimate clears ``min_count`` reach the exact count shuffle.
    CMS never underestimates, so no true heavy hitter is lost; the
    only cost of hash collisions is a few light values slipping into
    the exact pass, where the HAVING filter removes them. At 100 TB
    the groupBy shuffle carries just the heavy values' occurrences
    (plus collision noise) instead of every distinct value.

    The output column is named after ``value`` when it is a string,
    else ``value``.
    """
    if min_count <= 0:
        raise ValueError(f"min_count must be positive, got {min_count}")
    name = value if isinstance(value, str) else "value"
    v = F.col(value) if isinstance(value, str) else value
    cms = cms_build(df, value, width, depth).localCheckpoint(eager=True)
    pos = _cms_positions(v, width, depth)
    probed = df.select(
        v.alias("__v"),
        *[F.element_at(pos, i + 1).alias(f"__c{i}") for i in range(depth)],
    )
    for i in range(depth):
        cells = cms.filter(F.col("row") == i).select(
            F.col("col").alias(f"__c{i}"), F.col("cnt").alias(f"__n{i}")
        )
        probed = probed.join(F.broadcast(cells), on=f"__c{i}", how="left")
    probes = [F.coalesce(F.col(f"__n{i}"), F.lit(0)) for i in range(depth)]
    est = F.least(*probes) if depth > 1 else probes[0]
    return (
        probed.filter(est >= min_count)
        .groupBy(F.col("__v").alias(name))
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .filter(F.col("n_occurrences") >= min_count)
    )


def cms_estimate(
    probe: DataFrame,
    value: Column | str,
    cms: DataFrame,
    width: int = 1 << 12,
    depth: int = 4,
) -> DataFrame:
    """DISTINCT probe rows with an ``est_count`` column: the minimum
    of the ``depth`` probed counters (the classic CMS read — never
    under the true count). The sketch broadcasts; raises on
    ``width``/``depth`` mismatch with the sketch's build parameters
    (same loud-failure contract as ``bloom_members``).

    The sketch is materialized once (eager localCheckpoint) — the
    parameter check needs an action, and without the checkpoint that
    action plus the returned plan would each run the full build."""
    cms = cms.localCheckpoint(eager=True)
    # bounded-collect: one parameter row (limit 1)
    meta = cms.select("width", "depth").limit(1).collect()
    if meta and (meta[0].width != width or meta[0].depth != depth):
        raise ValueError(
            f"cms was built with width={meta[0].width}, "
            f"depth={meta[0].depth}; probing with width={width}, "
            f"depth={depth} would read the wrong counters"
        )
    # dunder working names so a probe column named row/col/cnt can't
    # collide (same convention as bloom_members)
    cells = cms.select(
        F.col("row").alias("__row"),
        F.col("col").alias("__col"),
        F.col("cnt").alias("__cnt"),
    )
    v = F.col(value) if isinstance(value, str) else value
    probed = probe.select(
        "*",
        F.posexplode(_cms_positions(v, width, depth)).alias("__row", "__col"),
    )
    return (
        probed.join(F.broadcast(cells), on=["__row", "__col"], how="left")
        .groupBy(*[c for c in probe.columns])
        .agg(F.min(F.coalesce(F.col("__cnt"), F.lit(0))).alias("est_count"))
    )


# ---------------------------------------------------------------------------
# Quantile sketch: HDR-style integer histogram. Completes the sketch
# family — HLL (distinct), Bloom (membership), CMS (frequency),
# histogram (DISTRIBUTION): "what's the p99 document length over
# 100 TB" as a few-thousand-row mergeable state table instead of a
# global sort. Engine-portable by the same rule as the others: the
# bucket function is PURE INTEGER ops (binary-string bit length +
# dynamic shifts, identical in Spark SQL and DuckDB — no log/pow
# whose last ulp could differ), so sketches built by either engine
# are row-identical.
# ---------------------------------------------------------------------------


def histogram_sketch(
    df: DataFrame,
    value: Column | str,
    sub_bits: int = 4,
    keys=(),
) -> DataFrame:
    """Build the histogram sketch: ``(keys..., bucket, cnt)`` with
    ``bucket`` the integer lower bound of the value's HDR bucket —
    all but the top ``1 + sub_bits`` significant bits dropped:
    ``b = (v >> s) << s`` with ``s = max(bitlen(v)-1-sub_bits, 0)``.
    Values below ``2^(sub_bits+1)`` are exact (s = 0); above,
    relative bucket width is ``2^-sub_bits``. Pure integer ops:
    bitlen via base-2 string length (``conv``/``bin``, identical in
    both engines), shifts via SQL shiftright/shiftleft with column
    shift counts — no log/pow anywhere, so the sketch is
    row-identical across engines. Requires v >= 0 and non-NULL
    (raises per-row — a silent wrap would corrupt the histogram, and
    a NULL slipping through ``v < 0``'s null-condition into the
    otherwise branch would land in a null bucket that inflates every
    quantile's denominator with no error).
    ~``(64 - sub_bits) * 2^sub_bits`` buckets
    max regardless of data size, mergeable by plain count addition
    (:func:`histogram_merge` of shard sketches is row-identical to
    building on the union — pinned by test, same contract as
    bloom/cms). Quantile answers come from
    :func:`histogram_quantiles`, with relative error <= 2^-sub_bits
    (values under 2^(sub_bits+1) are exact).

    Scale: one narrow projection + one bounded-key aggregate. The
    shuffle carries at most the bucket count per partition after
    map-side partial aggregation — constant state, like every sketch
    in this module."""
    if not 1 <= sub_bits <= 12:
        raise ValueError(f"sub_bits must be in [1, 12], got {sub_bits}")
    keys = [keys] if isinstance(keys, str) else list(keys)
    if "bucket" in keys or "cnt" in keys:
        raise ValueError("'bucket'/'cnt' are reserved output columns")
    v = (F.col(value) if isinstance(value, str) else value).cast("bigint")
    checked = F.when(
        v.isNull() | (v < 0),
        F.raise_error(F.lit("histogram_sketch requires non-NULL v >= 0")),
    ).otherwise(v)
    tmp = df.select(*keys, checked.alias("__v")).withColumn(
        "__s",
        F.greatest(
            F.length(F.conv(F.col("__v").cast("string"), 10, 2)).cast("int")
            - F.lit(1 + sub_bits),
            F.lit(0),
        ),
    )
    bucketed = tmp.withColumn(
        "bucket", F.expr("shiftleft(shiftright(__v, __s), __s)")
    )
    return bucketed.groupBy(*keys, "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def _check_histogram_keys(
    sk: DataFrame, keys, caller: str, *, tolerate_batch_col: bool = False
) -> None:
    """The histogram twin of ``_check_register_keys`` (ADVICE r7): a
    KEYED bucket table processed with ``keys`` omitted or misspelled
    would silently sum counts across key groups — a global answer
    where the caller meant per-key, with no error. Any column beyond
    (keys, bucket, cnt) means a forgotten key. Only the streaming
    store reader tolerates its ``ingest_batch_id`` partition column
    (merged away by design)."""
    tolerated = {"ingest_batch_id"} if tolerate_batch_col else set()
    extra = set(sk.columns) - {"bucket", "cnt"} - tolerated - set(keys)
    if extra:
        raise ValueError(
            f"{caller}: histogram sketch carries key columns "
            f"{sorted(extra)} not listed in keys={keys}; merging or "
            "walking quantiles across them would silently mix key groups"
        )


def histogram_merge(*sketches: DataFrame, keys=()) -> DataFrame:
    """Merge histogram sketches built with the SAME sub_bits:
    bucket-wise count addition. Exact:
    ``merge(build(A), build(B)) == build(A UNION ALL B)``
    row-identically (counts are integers; buckets are value-derived,
    not parameter-derived, so there is no parameter column to
    check — callers own the same-sub_bits contract, documented like
    hll_merge's)."""
    if not sketches:
        raise ValueError("histogram_merge needs at least one sketch")
    keys = [keys] if isinstance(keys, str) else list(keys)
    for s in sketches:
        _check_histogram_keys(s, keys, "histogram_merge")
    cols = [*keys, "bucket", "cnt"]
    merged = sketches[0].select(*cols)
    for s in sketches[1:]:
        merged = merged.unionByName(s.select(*cols))
    return merged.groupBy(*keys, "bucket").agg(
        F.sum("cnt").alias("cnt")
    )


def histogram_quantiles(
    sketch: DataFrame,
    qs: list[tuple[int, int, str]],
    keys=(),
) -> DataFrame:
    """Quantiles from a histogram sketch: for each ``(num, den,
    alias)`` in ``qs``, the smallest bucket whose cumulative count
    covers the quantile (``cum * den >= total * num`` — exact integer
    comparison, no float quantile arithmetic). Returns one row per
    key group with one column per requested quantile. The answer is
    the bucket LOWER bound: true_quantile is in [answer,
    answer * (1 + 2^-sub_bits)) for answers >= 2^(sub_bits+1), exact
    below."""
    if not qs:
        raise ValueError("histogram_quantiles needs at least one quantile")
    keys = [keys] if isinstance(keys, str) else list(keys)
    _check_histogram_keys(sketch, keys, "histogram_quantiles")
    from pyspark.sql import Window

    w_cum = Window.partitionBy(*keys).orderBy("bucket")
    w_tot = (
        Window.partitionBy(*keys)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    base = sketch.withColumn("__cum", F.sum("cnt").over(w_cum)).withColumn(
        "__tot", F.sum("cnt").over(w_tot)
    )
    aggs = [
        F.min(
            F.when(
                F.col("__cum") * F.lit(den) >= F.col("__tot") * F.lit(num),
                F.col("bucket"),
            )
        ).alias(alias)
        for num, den, alias in qs
    ]
    return base.groupBy(*keys).agg(*aggs)


# ---------------------------------------------------------------------------
# KMV (bottom-k / k-minimum-values) sketch [Bar-Yossef et al. 2002;
# Beyer et al., SIGMOD 2007] — the set-OPERATION sketch the HLL family
# cannot be: because the state is the k smallest distinct hash values
# themselves (not register ranks), two sketches support union,
# INTERSECTION, and Jaccard estimation — "how much does corpus A
# overlap corpus B?" answered from a few hundred integers per side,
# the decontamination-sizing / corpus-dedup-planning question at
# 100 TB. Same md5-h60 hash as the HLL registers, so the whole
# construction is deterministic and the DuckDB oracle replays every
# estimate BITWISE (the estimates are deterministic functions of the
# data — no RNG anywhere).
# ---------------------------------------------------------------------------


def _h60(v: Column) -> Column:
    """The shared 60-bit md5 hash (15 hex chars -> nonnegative int64)
    — identical expression in DuckDB: ('0x' || substr(md5(v), 1,
    15))::BIGINT."""
    return F.conv(F.substring(F.md5(v), 1, 15), 16, 10).cast("bigint")


def _kmv_bottomk(hashed: DataFrame, k: int, keys) -> DataFrame:
    """The shared bottom-k pipeline every KMV construction ends with:
    distinct hashes -> per-group window rank -> k smallest collected
    as one ascending array. ONE canonical implementation — sketch,
    merge, and the streaming store's read-side merge all call this,
    so a future tie/NULL-handling tweak cannot desynchronize them."""
    from pyspark.sql import Window

    ex = hashed.filter(F.col("__h").isNotNull()).distinct()
    w = Window.partitionBy(*keys).orderBy("__h")
    return (
        ex.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(*keys)
        .agg(F.sort_array(F.collect_list("__h")).alias("kmv"))
    )


def kmv_sketch(
    df: DataFrame, value: Column | str, k: int = 256, keys=()
) -> DataFrame:
    """The KMV sketch: ``(keys..., kmv array<bigint>)`` — the k
    SMALLEST distinct h60 hashes of ``value`` per key group, sorted
    ascending (fewer than k when the group has fewer distinct values
    — then the sketch is exact). Mergeable: the k smallest of two
    sketches' union IS the union's sketch (:func:`kmv_merge`, pinned
    row-identical to sketching the union).

    Scale shape: one distinct aggregate + a per-group bounded window
    — the same cost class as the grouped HLL build; state is <= k
    int64s per group. Deliberately NO collect_set-then-slice (that
    would buffer every distinct value of a group in one executor
    row); the window keeps memory at the sort buffer."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    keys = [keys] if isinstance(keys, str) else list(keys)
    v = F.col(value) if isinstance(value, str) else value
    # md5(NULL) is NULL; Spark sorts NULLs FIRST ascending while
    # DuckDB sorts them last, so an unfiltered NULL would both poison
    # the sketch and desynchronize the oracle — _kmv_bottomk drops it
    # (a NULL value is not a set member)
    return _kmv_bottomk(
        df.select(*keys, _h60(v).alias("__h")), k, keys
    )


def kmv_merge(*sketches: DataFrame, k: int, keys=()) -> DataFrame:
    """Merge KMV sketches built with the SAME ``k`` (and keys): the k
    smallest of the concatenated hash sets. Exact by construction —
    row-identical to :func:`kmv_sketch` over the unioned inputs
    (pinned by test), the same composability contract as
    :func:`hll_merge`."""
    if not sketches:
        raise ValueError("kmv_merge needs at least one sketch")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    keys = [keys] if isinstance(keys, str) else list(keys)
    merged = sketches[0]
    for t in sketches[1:]:
        merged = merged.unionByName(t)
    return _kmv_bottomk(
        merged.select(*keys, F.explode("kmv").alias("__h")), k, keys
    )


def _kmv_est(kmv: Column, k: int) -> Column:
    """Distinct-count estimate of one sketch column: exact when the
    group had fewer than k distinct values (the sketch holds ALL of
    them); else the classic (k-1) / normalized k-th minimum — written
    as ``(k-1)*2^60 / h_k`` with the numerator folded to one exact
    float literal so both engines evaluate the identical division."""
    num = float((k - 1) * (1 << 60))
    return F.when(
        F.size(kmv) < k, F.size(kmv).cast("double")
    ).otherwise(F.lit(num) / F.element_at(kmv, k).cast("double"))


def kmv_estimate(sk: DataFrame, k: int, keys=()) -> DataFrame:
    """``(keys..., est double)`` distinct-count estimate per group.
    Standard error ~ 1/sqrt(k-2) (~6% at k=256)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    keys = [keys] if isinstance(keys, str) else list(keys)
    return sk.select(*keys, _kmv_est(F.col("kmv"), k).alias("est"))


def _kmv_overlap_cols(staged: DataFrame, out_keys, k: int) -> DataFrame:
    """The shared estimator projection of both overlap forms: from a
    row holding ``__ka``/``__kb``/``__u`` arrays, emit the five
    estimate columns. ONE canonical implementation (kmv_overlap and
    kmv_overlap_matrix) so the estimators cannot diverge."""
    matched = F.size(
        F.array_intersect(
            F.array_intersect(F.col("__u"), F.col("__ka")), F.col("__kb")
        )
    )
    union_est = _kmv_est(F.col("__u"), k)
    jacc = matched.cast("double") / F.size(F.col("__u")).cast("double")
    return staged.select(
        *out_keys,
        _kmv_est(F.col("__ka"), k).alias("est_a"),
        _kmv_est(F.col("__kb"), k).alias("est_b"),
        union_est.alias("est_union"),
        jacc.alias("est_jaccard"),
        (jacc * union_est).alias("est_intersection"),
    )


def _kmv_union_col(k: int) -> Column:
    return F.slice(
        F.array_sort(F.array_union(F.col("__ka"), F.col("__kb"))), 1, k
    )


def kmv_overlap(
    a: DataFrame, b: DataFrame, k: int, keys=()
) -> DataFrame:
    """Set-overlap estimates between two KMV sketches (same ``k``;
    joined on ``keys``, or one row x one row when ``keys`` is empty):
    ``(keys..., est_a, est_b, est_union, est_jaccard,
    est_intersection)``.

    Construction [Beyer et al. 2007]: the union sketch is the k
    smallest of A ∪ B; the Jaccard estimate is the fraction of those
    union-sketch hashes present in BOTH sides (each union-sketch hash
    is a uniform sample of the union, so membership-in-both is a
    Bernoulli draw of the Jaccard); intersection = jaccard x union
    estimate. Everything is integer set algebra + two IEEE divisions
    — bitwise SQL-replayable, no randomness."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    keys = [keys] if isinstance(keys, str) else list(keys)
    al = a.select(*keys, F.col("kmv").alias("__ka"))
    bl = b.select(*keys, F.col("kmv").alias("__kb"))
    if keys:
        j = al.join(bl, keys)
    else:
        # declared-crossjoin: two ONE-ROW sketch relations (the
        # group-less overlap question) — a 1x1 product by contract
        j = al.crossJoin(F.broadcast(bl))
    staged = j.select(*keys, "__ka", "__kb", _kmv_union_col(k).alias("__u"))
    return _kmv_overlap_cols(staged, keys, k)


def kmv_overlap_matrix(sk: DataFrame, k: int, key: str) -> DataFrame:
    """Pairwise overlap report across ALL key groups of one grouped
    sketch (:func:`kmv_sketch` with ``keys=(key,)``): one row per
    unordered group pair ``(key_a < key_b)`` with the
    :func:`kmv_overlap` estimate columns — the corpus-mix overlap
    matrix ("which sources duplicate each other?") from sketch state
    alone. G groups -> G(G-1)/2 rows; the join is sketch x sketch
    (<= k int64s per row), never data x data."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    a = sk.select(
        F.col(key).alias(f"{key}_a"), F.col("kmv").alias("__ka")
    )
    b = sk.select(
        F.col(key).alias(f"{key}_b"), F.col("kmv").alias("__kb")
    )
    j = a.join(b, F.col(f"{key}_a") < F.col(f"{key}_b"))
    staged = j.select(
        f"{key}_a", f"{key}_b", "__ka", "__kb", _kmv_union_col(k).alias("__u")
    )
    return _kmv_overlap_cols(staged, [f"{key}_a", f"{key}_b"], k)
