"""Query registry — the driver-facing catalog of implemented operators.

Every operator from SURVEY.md §2 (plus the LLM-pipeline additions) gets
a named entry here: a Spark callable ``(spark, sf_dir) -> DataFrame``
and, when SQL-expressible, a DuckDB oracle string over the same parquet
tables. ``__spark_entry__.py`` exposes the registry to the driver.

Column-name contract: every computed column is aliased identically in
the Spark plan and the oracle SQL (the driver hash-compares values
after sorting columns by name). Floating-point aggregates are rounded
on both sides so cross-engine summation-order differences cannot flip
the hash.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None  # DuckDB SQL; None -> rows-only check


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        REGISTRY[name] = QueryDef(name=name, fn=fn, oracle=oracle)
        return fn

    return deco


# Driver-window rotation schedule
# ---------------------------------
# The driver oracle-checks only the FIRST 50 registered queries each
# round, so registration order is the correctness-coverage schedule.
# ``_WINDOW_PRIORITY`` pins the current round's 50-slot window; every
# other registered query follows in import order (rows 51+ are still
# exposed, just not driver-checked this round).
#
# Round-10 window (evidence ages going in: 50 r9-green, 44 r8-green,
# 32 r7-green, 9 never-checked; registry = 135), in priority order:
#   1. the nine round-10 registrations (never checked — the standing
#      rule: new queries take slots in their landing round);
#   2. ALL 32 queries whose last driver-green row is round 7 — the
#      oldest evidence anywhere, exactly the list round 9's boundary
#      comment scheduled as this round's head (this includes
#      streaming_hll_ingest, whose write path changed this round);
#   3. the first 9 r8-greens in import order, filling slot 50.
# Round-10 code changes (dataset/manifest grace window, fills cmidx
# checks, asof NTZ cast, multimodal decoder guard) all sit under
# r9-green queries — each was re-verified green locally via
# tools/driver_check.py this round, so rotation order stays purely
# evidence-age-driven.
# Below the boundary: the remaining 35 r8-greens (listed, in order)
# are the head of round 11's window, followed by the 50 r9-greens in
# import order. Full-rotation cadence at 135 queries / 50 slots is
# ~2.5 rounds; tests/test_window_schedule.py COMPUTES the boundary
# from the CORRECTNESS_r*.json history and fails if any query's
# evidence would age past 2 rounds outside the window — the
# arithmetic this comment used to do by hand (and round 8 got wrong).
_WINDOW_PRIORITY = [
    # (1) round-10 registrations
    "streaming_countmin_ingest",
    "streaming_quantile_ingest",
    "csv_ingest_roundtrip",
    "orc_ingest_roundtrip",
    "cdc_incremental_minmax",
    "bpe_token_counts",
    "bpe_merges",
    "store_bloom_skipping",
    "streaming_native_snapshots",
    # (2) all 32 r7-stale queries (round 9's scheduled head)
    "asof_click_before_purchase",
    "embedding_cosine_topk",
    "range_join_first_week",
    "text_stats",
    "dedup_exact",
    "minhash_lsh_neardup_pairs",
    "kmeans_clusters",
    "countmin_heavy_hitters",
    "histogram_quantiles_by_type",
    "bloom_decontamination",
    "hll_source_overlap",
    "ann_ivf_topk",
    "mmr_diverse_topk",
    "cohort_retention_weekly",
    "ewma_user_values",
    "text_feature_vectors",
    "source_quota_twophase",
    "corpus_pipeline_end2end",
    "topic_clusters",
    "segment_bins_explicit_edges",
    "sliding_window_1h_15m",
    "dsir_importance_weights",
    "dsir_gumbel_topk",
    "semdedup_prune",
    "streaming_native_hourly",
    "streaming_interval_join",
    "streaming_hll_ingest",
    "volume_bars_10k",
    "aggstream_filter_fanout",
    "intersections_bucket_align",
    "rollup_pricing",
    "twap_hourly",
    # (3) first 9 r8-greens, import order — fills slot 50
    "asof_nearest_tolerance",
    "lang_id",
    "ngram_jaccard_pairs",
    "neardup_clusters",
    "ann_lsh_topk",
    "repetition_stats",
    "decontamination_overlap",
    "pii_scan",
    "embedding_quantize",
    # --- slot-50 boundary: the window ends at embedding_quantize
    # (slot 50, counted: 9 + 32 + 9 — and count-asserted by
    # tests/test_window_schedule.py). Round 11's window head = the
    # 35 remaining r8-greens below, oldest evidence after this round:
    "label_centroids",
    "lm_quality_score",
    "ccnet_quality_buckets",
    "quality_classifier_scores",
    "hll_distinct_tokens",
    "gopher_quality_rules",
    "domain_url_stats",
    "corpus_curation",
    "token_pack_assignment",
    "stratified_sample_mix",
    "ann_pq_topk",
    "incremental_neardup_ingest",
    "neardup_keep_best",
    "leakage_safe_splits",
    "neardup_pagerank",
    "lsh_recall_eval",
    "crossencoder_rerank_topk",
    "bm25_topk",
    "deterministic_shuffle",
    "source_quota_topk",
    "segment_bins_4h_right",
    "segment_bins_month_right",
    "segment_bins_quarter_right",
    "segment_bins_4h_0930_offset",
    "snapshot_1y_1ms",
    "snapshot_irregular_edges",
    "duplicate_span_removal",
    "temperature_source_mix",
    "packed_training_sequences",
    "weighted_sample_wor",
    "weighted_sample_by_source",
    "zorder_box_scan",
    "streaming_native_sessions",
    "streaming_stateful_ffill",
    "streaming_sliding_hourly",
]


def load_all_query_modules() -> None:
    """Import every query module so registration side-effects run.

    After the imports, REGISTRY is rebuilt so ``_WINDOW_PRIORITY``
    queries come first (the driver's 50-slot correctness window),
    followed by every other registered query in import order.
    """
    from oups_spark.queries import (  # noqa: F401
        core,
        join_ops,
        llm_ops,
        misc_ops,
        quality_ops,
        retrieval_ops,
        segment_ops,
        selection_ops,
        store_ops,
        stream_ops,
        window_ops,
    )

    ordered = [n for n in _WINDOW_PRIORITY if n in REGISTRY]
    ordered += [n for n in REGISTRY if n not in _WINDOW_PRIORITY]
    reordered = {n: REGISTRY[n] for n in ordered}
    REGISTRY.clear()
    REGISTRY.update(reordered)
