"""Duplicate-cluster canonicalization: connected components over
near-dup pair edges, then one canonical document per cluster.

Pair-wise dedup (``minhash_lsh_pairs`` & friends) answers "which
documents are near-duplicates of each other"; a production corpus
clean needs the next step — group the pairs into transitive clusters
and KEEP exactly one representative per cluster. A near-dups B and
B near-dups C means {A, B, C} is one cluster even when A and C never
collide directly.

Algorithm: iterative min-label propagation. Every node starts
labelled with its own id; each round, every node takes the minimum
label among itself and its neighbours; at fixpoint every node carries
its component's minimum id, which becomes ``cluster_id``. Rounds
needed = component diameter. Near-dup clusters are dense and tiny in
diameter (a boilerplate family collides pairwise, diameter 1-2), so
convergence is 2-4 rounds in practice; ``max_iters`` bounds the
pathological chain case and failure is loud, not silent.

Scale design (100 TB corpus):
* The edge set is the OUTPUT of LSH dedup — orders of magnitude
  smaller than the corpus (only colliding documents appear). The
  iteration runs on (id, label) pairs, never on document text.
* Each round is one shuffle (edges ⋈ labels, groupBy dst) — the
  min-aggregate combines map-side, so traffic is bounded by the node
  count, not the edge count.
* ``localCheckpoint`` truncates the plan each round; without it the
  lineage doubles per iteration and the final plan is exponential.
* For adversarial long-chain graphs (diameter ~ n) the
  large-star/small-star alternating algorithm [Kiveris et al.,
  "Connected Components in MapReduce and Beyond", SoCC'14] converges
  in O(log n) rounds — available as ``algorithm="star"``. Near-dup
  graphs are tiny-diameter, so ``"propagation"`` stays the default;
  both raise loudly at the iteration cap and produce identical
  labellings (property-pinned).

Reference parity: the reference repo stops at pair emission
(spark-sorted has no clustering op); this module is the
training-data-pipeline extension SURVEY.md §6 scopes in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "connected_components",
    "merge_clusters",
    "canonical_docs",
    "select_representatives",
]


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    id_name: str = "doc_id",
    max_iters: int = 30,
    algorithm: str = "propagation",
    stats: dict | None = None,
) -> DataFrame:
    """Resolve ``edges`` into components.

    Returns one row per node that appears in at least one edge:
    ``(id_name, cluster_id)`` where ``cluster_id`` is the minimum
    node id in the component. Documents with no near-dup pair are
    singleton clusters by definition and are NOT emitted (joining
    them back is a left join on the corpus — cheap, and keeping the
    output proportional to the duplicate set is what you want when
    the corpus is 100 TB and duplicates are 1%).

    ``algorithm`` picks the iteration scheme; both produce the same
    labelling:

    * ``"propagation"`` (default) — min-label propagation, one
      shuffle per round, rounds = component diameter. Right for
      near-dup graphs (dense, diameter 2-4).
    * ``"star"`` — alternating large-star/small-star [Kiveris et
      al., SoCC'14], a few shuffles per round but O(log n) rounds
      regardless of diameter. Right when components can be
      chain-shaped (e.g. record-linkage graphs).

    Raises ``RuntimeError`` if ``max_iters`` rounds do not reach the
    fixpoint — never returns a partial labelling silently.

    ``stats``, if given a dict, receives ``{"rounds": N}`` — the
    number of iteration rounds actually run (including the final
    no-change detection round). The iteration executes EAGERLY
    (localCheckpoint per round), so static EXPLAIN of the returned
    frame cannot see it; this counter is how the plan-regression
    suite pins the iteration budget (tests/test_plan_regression.py).
    """
    if algorithm not in ("propagation", "star"):
        raise ValueError(
            f"unknown algorithm {algorithm!r}: expected 'propagation' or 'star'"
        )
    sym = (
        edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
        .union(edges.select(F.col(dst).alias("s"), F.col(src).alias("d")))
        .distinct()
        .localCheckpoint(eager=True)  # reused every round — pin it
    )
    if algorithm == "star":
        return _star_components(sym, id_name, max_iters, stats)
    labels = (
        sym.select(F.col("s").alias("id"))
        .distinct()
        .withColumn("lbl", F.col("id"))
        .localCheckpoint(eager=True)
    )
    # max_iters bounds CHANGE rounds: diameter-D propagation makes its
    # last change in round D and needs one further no-change round to
    # detect the fixpoint, so the loop runs until max_iters rounds have
    # actually changed something (a diameter == max_iters graph still
    # converges; max_iters + 1 total rounds worst case)
    change_rounds = 0
    total_rounds = 0
    while True:
        total_rounds += 1
        nbr_min = (
            sym.join(labels, sym["s"] == labels["id"])
            .groupBy(F.col("d").alias("id"))
            .agg(F.min("lbl").alias("nbr_lbl"))
        )
        # carry the previous label through the update so convergence
        # is a filter on the checkpointed frame, not another join
        stepped = (
            labels.join(nbr_min, on="id", how="left")
            .select(
                "id",
                F.col("lbl").alias("prev_lbl"),
                F.least(F.col("lbl"), F.coalesce("nbr_lbl", "lbl")).alias("lbl"),
            )
            .localCheckpoint(eager=True)  # truncate per-round lineage
        )
        changed = (
            stepped.filter(F.col("lbl") != F.col("prev_lbl")).limit(1).count()
        )
        # rebinding `labels` drops the only reference to the previous
        # round's checkpoint — its blocks are reclaimed by the
        # ContextCleaner on GC, so at most ~2 label tables are live
        # (plus `sym`, which every round reuses by design)
        labels = stepped.select("id", "lbl")
        if changed == 0:
            if stats is not None:
                stats["rounds"] = total_rounds
            return labels.select(
                F.col("id").alias(id_name), F.col("lbl").alias("cluster_id")
            )
        change_rounds += 1
        if change_rounds > max_iters:
            raise RuntimeError(
                f"connected_components did not converge in {max_iters} "
                "change rounds; component diameter exceeds the cap — "
                "raise max_iters or use an O(log n) alternating-star "
                "algorithm for chain-shaped graphs"
            )


def merge_clusters(
    prior_labels: DataFrame,
    new_edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    id_name: str = "doc_id",
    cluster_name: str = "cluster_id",
    max_iters: int = 30,
    algorithm: str = "propagation",
    stats: dict | None = None,
) -> DataFrame:
    """INCREMENTAL clustering: merge a new batch of near-dup edges
    into an existing labelling without re-clustering the full edge
    history — the clusters step of the nightly incremental loop
    (``dedup_against_store`` / ``cosine_neardup_against_index`` emit
    the new edges; this folds them in).

    Correctness is by graph identity, not approximation: a prior
    component is connected through its label (each member has a
    ``(id, cluster_id)`` row, and ``cluster_id`` is itself a member
    id), so components of ``new_edges ∪ prior-label-edges`` are
    EXACTLY the components of ``all-old-edges ∪ new_edges`` — the
    one-shot answer — while the propagation runs over
    ``|prior labels| + |new edges|`` rows instead of the full edge
    history. Prior components enter as stars (diameter <= 2), so
    convergence is governed by the NEW merges, not history depth.

    Returns the same ``(id_name, cluster_id)`` relation as
    :func:`connected_components` over the union graph: every node of
    any prior component or new edge appears; ``cluster_id`` is the
    component-minimum id (labels can CHANGE for prior members when a
    new edge bridges two old components — that is the point).

    Equality with the one-shot clustering is property-pinned in
    tests/test_pipeline_ops.py across random edge splits.
    """
    label_edges = prior_labels.select(
        F.col(id_name).alias(src), F.col(cluster_name).alias(dst)
    )
    combined = new_edges.select(src, dst).unionByName(label_edges)
    return connected_components(
        combined,
        src=src,
        dst=dst,
        id_name=id_name,
        max_iters=max_iters,
        algorithm=algorithm,
        stats=stats,
    )


def _star_components(
    sym: DataFrame, id_name: str, max_iters: int, stats: dict | None = None
) -> DataFrame:
    """Alternating large-star/small-star over the symmetric edge set.

    Each round rewrites the edge set toward stars whose center is the
    component minimum; the edge set is a fixpoint exactly when every
    non-root node points directly at its root. Rounds needed are
    O(log n) in the largest component size — a million-node chain
    converges in ~20 rounds where propagation would need a million.

    ``sym`` is the distinct symmetric (s, d) edge set, already
    checkpointed by the caller. Self-loop-only nodes fall out of the
    canonical (big, small) form; the final left join restores them as
    singletons, keeping the output identical to propagation's.
    """
    nodes = sym.select(F.col("s").alias("id")).distinct().localCheckpoint(
        eager=True
    )
    # canonical directed form: every edge points big -> small
    e = (
        sym.filter(F.col("s") > F.col("d"))
        .select(F.col("s").alias("u"), F.col("d").alias("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for round_no in range(1, max_iters + 1):
        # large-star: for every node, connect its LARGER neighbours to
        # the minimum of its closed neighbourhood. Output keeps the
        # big -> small invariant (new edge (v, m) has v > u >= m).
        both = e.select("u", "v").union(
            e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        lmins = (
            both.groupBy("u")
            .agg(F.min("v").alias("mn"))
            .select("u", F.least("mn", "u").alias("m"))
        )
        large = (
            both.join(lmins, on="u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        # small-star: within each node's SMALLER neighbourhood, hang
        # everything (the node included) off the minimum.
        smins = large.groupBy("u").agg(F.min("v").alias("m"))
        with_min = large.join(smins, on="u")
        stepped = (
            with_min.select(F.col("u").alias("a"), F.col("m").alias("b"))
            .union(
                with_min.filter(F.col("v") != F.col("m")).select(
                    F.col("v").alias("a"), F.col("m").alias("b")
                )
            )
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .select(F.col("a").alias("u"), F.col("b").alias("v"))
            .localCheckpoint(eager=True)  # truncate per-round lineage
        )
        changed = (
            stepped.exceptAll(e).limit(1).count()
            + e.exceptAll(stepped).limit(1).count()
        )
        e = stepped
        if changed == 0:
            if stats is not None:
                stats["rounds"] = round_no
            # fixpoint: e maps every non-root to its component min
            return nodes.join(
                e.select(F.col("u").alias("id"), F.col("v").alias("root")),
                on="id",
                how="left",
            ).select(
                F.col("id").alias(id_name),
                F.coalesce("root", "id").alias("cluster_id"),
            )
    raise RuntimeError(
        f"star connected_components did not converge in {max_iters} "
        "rounds — with O(log n) convergence this indicates a bug or an "
        "astronomically large component; raise max_iters to confirm"
    )


def canonical_docs(
    docs: DataFrame,
    clusters: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Drop every non-canonical duplicate from ``docs``.

    ``clusters`` is ``connected_components`` output. A document
    survives iff it is not in any cluster (no near-dup) or it IS its
    cluster's canonical representative (``id == cluster_id`` — the
    minimum id, a deterministic, join-free tie-break). One broadcast-
    friendly left anti join: the drop list is tiny next to the corpus.
    """
    drop = clusters.filter(F.col(id_col) != F.col("cluster_id")).select(id_col)
    return docs.join(drop, on=id_col, how="left_anti")


def select_representatives(
    docs: DataFrame,
    clusters: DataFrame,
    quality: DataFrame,
    id_col: str = "doc_id",
    cluster_col: str = "cluster_id",
    quality_col: str = "quality",
) -> DataFrame:
    """QUALITY-based survivor selection — the production upgrade of
    :func:`canonical_docs`' min-id rule: per near-dup cluster keep the
    HIGHEST-quality member (``quality_col`` DESC, ``id_col`` ASC as
    the deterministic tie-break), and every document outside any
    cluster survives as its own singleton representative. This is the
    step a corpus clean runs when duplicates differ in extraction
    quality — the min-id rule keeps whichever copy was crawled first,
    this keeps the best copy.

    ``clusters`` is ``connected_components`` output (``id, cluster``
    labelling over near-dup edges — only colliding docs appear);
    ``quality`` is any ``(id, quality)`` relation
    (:func:`functions.text.quality_score` is the in-repo producer).

    Returns one row per SURVIVOR: ``(id, cluster_id, n_members,
    quality)`` — singletons carry their own id as ``cluster_id`` and
    ``n_members = 1``.

    Scale shape: one left join labels the corpus (unlabelled docs
    coalesce to their own id — no second pass), the member count is a
    map-side-combining aggregate on the labelling, and the argmax is
    one window partitioned by cluster — per-partition state is one
    cluster's members, and near-dup clusters are tiny by
    construction. No driver collects, no text movement (only ids,
    labels, and the quality integers shuffle)."""
    from pyspark.sql import Window

    lab = (
        docs.select(F.col(id_col))
        .join(clusters.select(id_col, cluster_col), id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col(cluster_col), F.col(id_col)).alias(cluster_col),
        )
    )
    sized = lab.groupBy(cluster_col).agg(
        F.count(F.lit(1)).alias("n_members")
    )
    w = Window.partitionBy(cluster_col).orderBy(
        F.col(quality_col).desc(), F.col(id_col).asc()
    )
    return (
        lab.join(quality.select(id_col, quality_col), id_col)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .join(sized, cluster_col)
        .select(id_col, cluster_col, "n_members", quality_col)
    )
