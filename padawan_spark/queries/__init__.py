"""Driver-facing query registry.

Importing this package registers every query suite; ``QUERIES`` maps a
name to ``fn(spark, sf_dir) -> DataFrame`` and ``ORACLE`` to the
equivalent DuckDB SQL (absent for non-SQL-expressible ops).
"""

from .registry import ORACLE, QUERIES, load  # noqa: F401

from . import relational  # noqa: E402,F401

import importlib as _importlib
import importlib.util as _ilu

_SUITES = ["operators", "analytics", "dedup", "similarity", "text", "events",
           "streamingq", "multimodal", "advanced", "udfs", "scale",
           "pipeline", "graph"]
for _m in _SUITES:
    if _ilu.find_spec(f"{__name__}.{_m}") is not None:
        _importlib.import_module(f"{__name__}.{_m}")

# ---------------------------------------------------------------------------
# Registry ordering: external correctness harnesses check a prefix of this
# dict (the driver verifies the first 50 entries in insertion order), so the
# head must SPAN every component family — relational, partition operators,
# window/analytics, dedup, similarity search, text analysis, events,
# streaming, multimodal, advanced joins/formats, UDF surface, scale patterns,
# SQL frontend — not just whichever suite imported first.  All queries stay
# registered; this is a stable re-ordering, not a filter.
# ---------------------------------------------------------------------------

# Round-3 rotation: rounds 1+2 drove 87 distinct queries green; this head
# is 46 never-driver-checked entries (graph/pipe/scale/streaming/udf/sql/
# ev/dedup/sim/mm/text remainders) plus sentinels over code paths that
# CHANGED this round (spread()-widened loads, dataset.py concat/map/
# repartition fixes) so regressions in touched code stay driver-visible.
#
# ROUND-4 ROTATION PLAN — the 46 still-unchecked entries, all green in
# the tri-scale harness; next round's head should be these plus ~4
# sentinels over whatever round 4 changes:
#   ana_: json_extract topk_global unpivot win_ntile win_range_frame
#     array_funcs stats_moments histogram posexplode string_agg
#     filtered_agg set_ops_all null_semantics map_funcs win_first_last
#     bitwise_agg percent_of_total gaps_islands try_functions
#     islands_runs string_funcs_ext date_funcs_ext math_funcs
#     xml_roundtrip variant_extract top_percent corr_matrix  (27)
#   adv_: salted_agg percentiles approx_distinct json_roundtrip
#     orc_roundtrip union_evolved profile_summary approx_quantile
#     salted_join asof_forward merge_schema_read percentile_disc
#     scd2_dimension csv_roundtrip  (14)  [+ ana_grouping_id — both
#     displaced from the r3 head by late-round changed-code sentinels]
#   round-3 additions: dedup_minhash_estimate text_repetition_metrics
#     ev_bot_detection mm_chunk_manifest scale_skew_metrics
#     text_pseudonymize graph_triangle_count ev_session_concurrency
#     sim_pq_encode sim_pq_adc_topk adv_text_roundtrip
#     streaming_outer_join pipe_length_batching text_bigram_logprob
#     sim_kmeans_train graph_transition_matrix dedup_segments
#     dedup_semantic sim_ann_ivfpq pipe_shard_manifest
#     graph_bfs_distance text_cooccurrence pipe_dataset_card
#     dedup_incremental graph_community_lpa ev_seasonal_baseline
#     streaming_custom_source sql_scalar_udf mm_binaryfile_ingest
#     udf_window_agg udf_grouped_map_arrow pipe_epoch_shuffle
#     scale_approx_topk scale_theta_rollup scale_theta_retention
#     pipe_feature_hashing ev_downsample_lttb adv_constraint_audit
#     op_time_travel op_incremental_read streaming_manifest_tail  (41)
_HEAD = [
    # graph suite (never checked; _users = scale-honest vertex set)
    "graph_pagerank", "graph_pagerank_users", "graph_degree_stats",
    # dataloader-prep pipeline (never checked)
    "pipe_hash_split", "pipe_sequence_packing", "pipe_weighted_mixture",
    "text_chunk_windows",
    # scale patterns remainder (never checked)
    "scale_cms_topk", "scale_bucketed_join_read", "scale_rollup_compose",
    "scale_partitioned_write", "scale_hash_sample", "scale_zorder_layout",
    "scale_stratified_sample", "scale_incremental_rollup",
    # structured streaming remainder (never checked, env-sensitive)
    "streaming_sessionize", "streaming_dedup_watermark",
    "streaming_static_join", "streaming_foreach_batch",
    # UDF surface remainder (never checked)
    "udf_grouped_map", "udf_batch_score",
    # SQL frontend remainder (never checked)
    "sql_lateral_topn", "sql_recursive_cte",
    # events / time series remainder (never checked)
    "ev_tumbling_window", "ev_sliding_window", "ev_gapfill", "ev_ohlc",
    "ev_rolling_actives", "ev_funnel_steps", "ev_journey_similarity",
    # dedup remainder (never checked)
    "dedup_minhash_signatures", "dedup_simhash", "dedup_levenshtein",
    "dedup_latest_version", "dedup_blocking_stats",
    # similarity / multimodal remainder (never checked)
    "sim_label_centroids", "mm_binary_stats",
    # text analysis remainder (never checked)
    "text_lang_id", "text_fingerprint", "text_bpe_tokens", "text_wordcount",
    "text_pii_scrub", "text_ngram_freq",
    # sentinels: dataset.py ops changed this round
    "op_concat_union", "op_map_partitions", "op_repartition_range",
    # sentinels: spread()-widened hot pipelines
    "dedup_minhash_lsh", "text_quality_score",
    # sentinels: late-round changes — the CC loop now iterates the
    # connected subgraph only, and write_parquet gained the append
    # lock + snapshot archiving (regressions must stay driver-visible)
    "scale_dedup_clusters", "op_write_roundtrip",
]


def _reorder() -> None:
    missing = [n for n in _HEAD if n not in QUERIES]
    assert not missing, f"registry head references unknown queries: {missing}"
    tail = [n for n in QUERIES if n not in set(_HEAD)]
    ordered = {n: QUERIES[n] for n in [*_HEAD, *tail]}
    QUERIES.clear()
    QUERIES.update(ordered)


_reorder()

__all__ = ["QUERIES", "ORACLE", "load"]
