"""Query registry: every implemented operator exposed as a
(spark, sf_dir) -> DataFrame callable plus (where SQL-expressible) a
DuckDB oracle — the correctness gate of SURVEY §2.

Float discipline: monetary aggregates run through exact DECIMAL
accumulation and only convert to DOUBLE at the end, so Spark and
DuckDB produce bit-identical values regardless of summation order.
"""

from a2b_spark.queries import analytic, pipeline, relational

QUERIES: dict = {}
ORACLES: dict = {}

for mod in (relational, pipeline, analytic):
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)

# Registry ORDER is part of the driver contract: the correctness
# harness checks the first 50 registered queries (CORRECTNESS_r03 kept
# exactly the first 50 insertion-order entries and silently dropped the
# rest). Order by coverage debt so any cap lands on queries with the
# MOST prior driver-green rounds: first the six that fell out of r3,
# then everything else, and last a tail of simple relational queries
# that were driver-green in rounds 1, 2 AND 3 (each also stays covered
# by pytest + tools/check_oracle.py every round).
_PRIORITIZED = [
    # never driver-checked yet (new this round) — first in line
    "q78_kmv_distinct",
    "q82_reservoir_per_group",
    "q83_train_val_test_split",
    "q84_length_buckets",
    "q85_table_fingerprint",
    "q81_window_frames",
    "q79_retention_cohorts",
    "q80_event_funnel",
    "q71_correlated_scalar_subquery",
    "q72_exists_correlated",
    "q73_not_exists_threshold",
    "q74_grouping_sets",
    "q75_time_rollup_cascade",
    "q76_pack_sequences",
    "q77_mixture_rebalance",
    "q66_chunk_documents",
    "q67_dup_ngram_spans",
    "q68_dedup_keep_best",
    "q69_weighted_sample",
    "q70_remove_dup_spans",
    "q57_session_window",
    "q58_repetition_stats",
    "q59_decontaminate",
    "q60_pii_redact",
    "q61_bpe_token_budget",
    "q62_media_resize",
    "q63_media_features",
    "q64_knn_ivf_pq",
    "q65_embedding_quantize",
    # fell out of the round-3 driver file
    "q32_tumbling_window",
    "q33_sliding_window",
    "q34_media_decode",
    "q35_frame_sample",
    "q42_range_join",
    "q43_hash_sample",
    # single driver-green round so far — keep inside the cap until
    # they accumulate two (the cap-eviction bar test_registry pins)
    "q54_normalize_text",
    "q55_corpus_datasheet",
    "q56_embedding_dup_clusters",
    "q50_knn_pq",
    "q51_stratified_sample",
    "q52_corpus_curation",
    "q53_unigram_surprisal",
    "q49_dedup_apply",
]
# all driver-green in at least two rounds (see CORRECTNESS_r0*.json)
_DEPRIORITIZED = [
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q04_region_revenue",
    "q23_token_stats",
    "q24_lang_id",
    "q25_near_dup_exact_jaccard",
    "q26_near_dup_minhash_lsh",
    "q28_knn_bruteforce",
    "q29_embedding_dups",
    "q31_multimodal_meta",
    "q06_rollup_orders",
    "q09_merge_upsert",
    "q18_cube_orders",
    "q19_pivot_status_by_priority",
    "q02_filter_project",
    "q05_top_customers_per_nation",
    "q07_customers_without_orders",
    "q08_customers_with_orders",
    "q10_orphan_diff",
    "q11_idmap_lookup",
    "q12_point_lookup",
    "q13_event_gaps",
    "q17_agg_stats",
    "q20_dedup_exact_keys",
    "q21_dedup_fingerprint",
    "q22_text_quality",
    "q14_sessionize",
    "q15_events_json",
    "q16_set_ops",
]


def _reorder() -> None:
    global QUERIES, ORACLES
    mid = [
        n for n in QUERIES if n not in _PRIORITIZED and n not in _DEPRIORITIZED
    ]
    order = (
        [n for n in _PRIORITIZED if n in QUERIES]
        + mid
        + [n for n in _DEPRIORITIZED if n in QUERIES]
    )
    QUERIES = {n: QUERIES[n] for n in order}
    ORACLES = {n: ORACLES[n] for n in order if n in ORACLES}


_reorder()


def register(mod) -> None:
    QUERIES.update(mod.QUERIES)
    ORACLES.update(mod.ORACLES)
