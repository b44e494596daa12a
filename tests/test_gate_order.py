"""Pin the driver-gate window (the driver runs only the FIRST 50
registered queries — evidence in PARITY.md "Driver gate window").

These tests are Spark-free and fail the suite — rather than crashing
the queries module import and voiding a whole gate run — when the
registry and _GATE_ORDER drift apart.
"""

from spark_sorted_spark import queries as q


def test_every_registered_query_is_gate_ordered():
    # a new @query must be placed in _GATE_ORDER deliberately (inside
    # the 50-entry window, or in the documented overflow tail)
    assert q.UNORDERED_QUERIES == [], (
        f"queries registered but not in _GATE_ORDER: {q.UNORDERED_QUERIES}; "
        "add them to _GATE_ORDER (first 50 = driver-gated; past 50 needs "
        "PARITY.md overflow justification)"
    )


def test_gate_window_contents():
    names = list(q.QUERIES)
    gated = set(names[:50])
    # every name must have an oracle (full rows+schema+hash gate)
    assert set(q.ORACLE) == set(names)
    # the judge-required entries sit inside the window
    for must in (
        # §2 reference operators are PERMANENT residents: every one of
        # C1-C6/P1-P4/A1-A5/J1-J5/S1 must hold a driver row in every
        # round (first achieved by round-8 rotation #4)
        "groupsort_layout",
        "ema_fold",
        "reduce_concat",
        "combiner_agg",
        "top3_per_user",
        "sessionize_stream",
        "merge_join_inner",
        "merge_join_full",
        "merge_join_left",
        "merge_join_right",
        "merge_join_semi_anti",
        "merge_join_custom",
        "merge_union",
        "scan_running_sum",
        "projection_chain",
        # the multimodal family representative (sole multimodal query)
        "multimodal_features",
        # round-12 rotation #8 (CHURN-BASED, VERDICT r11 item 1): the
        # retrieval serving forms stay; the scan twins bm25_topk/
        # bm25_join/hybrid_topk/hybrid_join rotated out driver-green
        # (the PRF/RM3 rows below exercise the same scan-form code)
        "bm25_topk_indexed",
        "bm25_join_indexed",
        "bm25_topk_filtered",
        # round-12 PRF/RM3 registrations — straight into the window
        # (no-backlog policy; VERDICT r11 item 4); bm25_join_rm3
        # completes the relevance-feedback matrix (tpch_q13 rotates
        # out driver-green, TPC-H keeps q15/q17)
        "bm25_topk_prf",
        "bm25_topk_rm3",
        "bm25_join_rm3",
        # round-12 two-stage rerank (no-backlog policy;
        # stream_hll_by_source rotates out driver-green, sketches
        # keep stream_len_quantiles in-window)
        "retrieval_rerank",
        "hybrid_topk_indexed",
        "hybrid_join_indexed",
        "temperature_mix",
        "retrieval_eval",
        "decontaminate_verbatim_short",
        "dedup_repeated_spans",
        # round-12 KMV overlap sketch (no-backlog policy;
        # dedup_semantic rotates out driver-green, dedup keeps four
        # in-window reps)
        "kmv_shingle_overlap",
        # round-12 training-order assignment (no-backlog policy;
        # similarity_ann_pq rotates out driver-green — b31 watch
        # adjudicated, quantized family keeps ivfpq/ivfpq_join/ivfsq8)
        "training_order",
        "similarity_ann_ivfpq",
        "similarity_ann_ivfpq_join",
        "similarity_ann_filtered",
        # the rotation-#8 churn block: overflow rows whose underlying
        # files (similarity.py +830 LoC, band-store code) were
        # rewritten in round 11 AFTER their last driver row
        "similarity_topk",
        "similarity_ann_lsh",
        "similarity_ann_ivf",
        "embedding_neardup_lsh",
        "knn_join",
        "embedding_dedup_incremental",
        "dedup_minhash_lsh",
        # round-12 quality-based survivor selection (no-backlog
        # policy; dedup_clean_repeated_spans rotates out driver-green,
        # the spans family keeps dedup_repeated_spans)
        "dedup_survivors",
        # round-12 SQ8 embedding quantization (no-backlog policy;
        # dedup_exact_normalized rotates out driver-green)
        "embedding_quantize",
        # round-12 IVF-SQ8 persisted index (no-backlog policy;
        # tpch_q20 rotates out driver-green, TPC-H keeps q15/q17)
        "similarity_ann_ivfsq8",
        "unigram_logprob",
        "dedup_clusters_incremental",
        "stream_len_quantiles",
        "unpivot_measures",
    ):
        assert must in gated, f"{must} fell out of the driver gate window"
    # overflow: every rotated-out row was driver-green in the round it
    # left (dedup_semantic,
    # stream_hll_by_source, similarity_ann_pq, and tpch_q20 lead —
    # rotated out for the round-12 kmv_shingle_overlap,
    # retrieval_rerank, training_order, and IVF-SQ8 registrations —
    # then the nine
    # rotation-#8 rows, all green in
    # CORRECTNESS_r11); family representation justified in the
    # _GATE_ORDER comments. All overflow stays locally oracle-checked
    # per round.
    assert names[50:] == [
        "dedup_semantic",
        "stream_hll_by_source",
        "similarity_ann_pq",
        "tpch_q20_part_promotion",
        "tpch_q13_order_distribution",
        "dedup_clean_repeated_spans",
        "dedup_exact_normalized",
        "bm25_topk",
        "bm25_join",
        "hybrid_topk",
        "hybrid_join",
        "dsir_select",
        "decontaminate_verbatim",
        "embedding_clusters",
        "window_distribution",
        "tpch_q8_market_share",
        "hll_grouped_by_source",
        "build_vocab",
        "redact_pii",
        "doc_keywords",
        "negative_pairs",
        "cms_heavy_shingles",
        "tpch_q4_order_priority",
        "tpch_q6_forecast_revenue",
        "tpch_q7_volume_shipping",
        "tpch_q10_returned_items",
        "tpch_q12_late_shipments",
        "tpch_q14_promo_revenue",
        "tpch_q16_supplier_diversity",
        "tpch_q19_disjunctive_revenue",
        "tpch_q22_sales_opportunity",
        "text_stats",
        "quality_score",
        "normalize_text",
        "dedup_exact",
        "dedup_jaccard_prefix",
        "decontaminate_exact",
        "decontaminate_bloom",
        "stream_hourly_window",
        "stream_session_window",
        "stream_late_drop",
        "stream_ann_index",
        "asof_nearest",
        "range_join",
        "grouping_sets_agg",
        "window_rank_lag",
        "window_range_frame",
        "pipeline_clean_corpus",
        "stream_stream_join",
        "corpus_mix",
        "dedup_clusters",
        "dedup_incremental",
        "sessionize_native",
        "length_quantiles_sketch",
        "pack_sequences",
        "chunk_documents",
        "resample_daily",
        "tpch_q9_product_profit",
        "tpch_q18_large_orders",
        "tpch_q21_waiting_suppliers",
        "doc_fingerprint",
        "lang_id",
        "repetition_profile",
        "dedup_ngram_jaccard",
        "dedup_simhash_banded",
        "decontaminate",
        "asof_join",
        "set_ops",
        "interval_overlap",
        "json_extract",
        "zorder_values",
        "hll_distinct_shingles",
        "tpch_q1_pricing_summary",
        "distinct_agg",
        "cms_token_counts",
        "stream_fold_ema",
        "stream_dedup",
        "pivot_event_types",
        "stratified_sample",
        "tpch_q3_shipping_priority",
        "salted_agg",
        "percentile_per_user",
        "global_topk",
        "tpch_q5_local_supplier",
        "dedup_simhash",
        "embedding_neardup",
        "rollup_agg",
        "cube_agg",
    ]


def test_local_correctness_artifact_covers_full_registry():
    """The checked-in CORRECTNESS_LOCAL_r{N}.json (the per-round "full
    catalog all-PASS" artifact) must cover EXACTLY the registered
    queries — an end-of-round query addition without regenerating the
    artifact fails here instead of shipping a stale artifact (the r8
    artifact stopped at 104/105; VERDICT r8 item 3)."""
    import json
    import re
    from pathlib import Path

    repo = Path(__file__).resolve().parent.parent
    arts = sorted(
        repo.glob("CORRECTNESS_LOCAL_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )
    assert arts, "no CORRECTNESS_LOCAL_r*.json artifact checked in"
    latest = arts[-1]
    data = json.loads(latest.read_text())
    results = data.get("results", data)
    missing = sorted(set(q.QUERIES) - set(results))
    extra = sorted(set(results) - set(q.QUERIES))
    assert not missing, (
        f"{latest.name} is stale: registered queries missing from the "
        f"artifact: {missing}; regenerate with "
        "`python tools/check_correctness.py /root/testdata/sf0.01 "
        f"--json {latest.name}`"
    )
    assert not extra, f"{latest.name} holds unregistered queries: {extra}"
    bad = sorted(
        n for n, r in results.items() if r.get("status") != "PASS"
    )
    assert not bad, f"{latest.name} records non-PASS rows: {bad}"
