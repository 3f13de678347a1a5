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
# Round-8 window (executing the plan documented in round 7's
# boundary note below slot 50), in priority order:
#   1. round-8 registrations — never-checked first, the standing
#      rule: new queries take slots in their landing round (they are
#      PREPENDED to this list as they land);
#   2. the 9 queries whose last driver-green row is round 5 (three
#      rounds stale — the oldest evidence anywhere): the calendar-bin
#      / snapshot siblings and the three native-streaming variants
#      that sat just past round 7's slot-50 boundary;
#   3. round-6-green queries over code CHANGED in round 7
#      (classifier.py, selection.py, similarity.py, sketch.py —
#      commit 80ed790): the classifier/curation pair, the
#      selection-layer queries, the ANN/embedding family, and the
#      two sketch queries round 7's window did not already re-check;
#   4. remaining round-6-greens, oldest-evidence-first with family
#      representatives ahead of siblings; the cheap stable TPC-H
#      shapes (core.py, untouched since round 4) sit at the BOTTOM so
#      new round-8 registrations displace those first — they spill to
#      round 9's window head.
# With 109+ registered queries and a 50-slot window the full rotation
# cadence is ~2.2 rounds; whatever falls past slot 50 here is the
# head of round 9's window.
_WINDOW_PRIORITY = [
    # (1) round-8 registrations land here, newest first
    "weighted_sample_by_source",
    "lsh_recall_eval",
    "neardup_pagerank",
    "cdc_incremental_agg",
    "zorder_box_scan",
    "interpolate_resample_6h",
    "cdc_upsert_stream",
    "weighted_sample_wor",
    "gopher_quality_rules",
    "asof_nearest_tolerance",
    "crossencoder_rerank_topk",
    "domain_url_stats",
    "bucketed_colocated_join",
    # (2) last green r5 — three rounds stale
    "segment_bins_4h_right",
    "segment_bins_4h_0930_offset",
    "segment_bins_month_right",
    "segment_bins_quarter_right",
    "snapshot_1y_1ms",
    "snapshot_irregular_edges",
    "streaming_native_sessions",
    "streaming_sliding_hourly",
    "streaming_stateful_ffill",
    # (3) r6-greens over code changed in round 7 (80ed790)
    "quality_classifier_scores",
    "corpus_curation",
    "duplicate_span_removal",
    "temperature_source_mix",
    "neardup_keep_best",
    "leakage_safe_splits",
    "ann_lsh_topk",
    "ann_pq_topk",
    "embedding_neardup_pairs",
    "embedding_quantize",
    "label_centroids",
    "incremental_neardup_ingest",
    "hll_distinct_tokens",
    "decontamination_overlap",
    # (4) remaining r6-greens, family reps first, stable TPC-H last
    "packed_training_sequences",
    "ccnet_quality_buckets",
    "token_pack_assignment",
    "source_quota_topk",
    "stratified_sample_mix",
    "deterministic_shuffle",
    "neardup_clusters",
    "ngram_jaccard_pairs",
    "simhash_neardup_pairs",
    "lang_id",
    "pii_scan",
    "repetition_stats",
    "lm_quality_score",
    "bm25_topk",
    "doc_chunk_overlap",
    "json_props_extract",
    "multimodal_features",
    "conversion_funnel",
    "duplicated_windows",
    "trailing_24h_per_user",
    "moving_avg_per_user",
    "ffill_bfill_user_values",
    "calendar_floor_ceil",
    "value_percentiles_by_type",
    "salted_join_order_customer",
    # --- slot-50 boundary: with 12 round-8 registrations at the
    # head, the window ends at doc_chunk_overlap (slot 50);
    # json_props_extract sits at slot 51, unchecked this round.
    # Head of round 9's window = json_props_extract + the 9 displaced
    # section-4 r6-greens (multimodal_features ..
    # salted_join_order_customer), then the names below (r6-green
    # siblings + stable core.py TPC-H shapes), then the r7-green
    # queries oldest-first:
    "minhash_signatures",
    "simhash_signatures",
    "multimodal_frame_sample",
    "top_customers",
    "revenue_by_nation",
    "daily_type_pivot",
    "promo_revenue_monthly",
    "regional_supplier_volume",
    "customers_without_orders",
    "order_priority_counts",
    "shipping_priority",
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
