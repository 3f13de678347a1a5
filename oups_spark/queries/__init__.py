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
# Round-9 window (evidence ages going in: 50 r8-green, 50 r7-green,
# 22 r6-green, 4 never-checked), in priority order:
#   1. the 4 round-9 registrations (never checked — the standing
#      rule: new queries take slots in their landing round; PREPENDED
#      as they land);
#   2. ALL 22 queries whose last driver-green row is round 6 — the
#      oldest evidence anywhere and the judge's round-9 ask (this
#      includes doc_chunk_overlap, which round 8's boundary note
#      miscounted as inside that window — it was slot 51);
#   3. r8-greens over code CHANGED this round: interpolate_resample
#      bounds fix (fills.py), integer-grid sums (join_ops.py), the
#      distributed IVM merge (ivm.py), the dedup.py bits= extension,
#      and embedding_neardup_pairs (unchanged behavior, but the
#      round-8 bench flagged it — keep its evidence fresh);
#   4. r7-greens over changed code next — the store family + the
#      aggstream/ingest writers all commit through the new flock'd
#      manifest CAS (manifest.py/dataset.py) — then r7-green family
#      representatives (flagship pricing_summary, DNF filter,
#      segment/snapshot/session/asof/ANN reps) to fill 50.
# Below the boundary: the remaining 30 r7-greens (listed, in order)
# are the head of round 10's window, followed by the 44 r8-greens
# (import order). Full-rotation cadence at 124 queries / 50 slots is
# ~2.5 rounds; no query's evidence should ever age past 3 rounds.
_WINDOW_PRIORITY = [
    # (1) round-9 registrations, newest first
    "knn_graph_topk",
    "interval_overlap_pairs",
    "simhash_neardup_pairs_64",
    "store_cmidx_roundtrip",
    # (2) all 22 r6-stale queries
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
    # (3) r8-greens over round-9 code changes
    "interpolate_resample_6h",
    "bucketed_colocated_join",
    "cdc_incremental_agg",
    "cdc_upsert_stream",
    "simhash_neardup_pairs",
    "embedding_neardup_pairs",
    # (4) r7-greens: changed-code families first, then family reps
    "store_merge_keep_last",
    "store_append_range_read",
    "store_compact_roundtrip",
    "store_time_travel",
    "store_schema_evolution",
    "store_stats_skipping",
    "jsonl_ingest_roundtrip",
    "aggstream_hourly_restart",
    "aggstream_snapshots_restart",
    "aggstream_edge_bins_restart",
    "streaming_dedup_ingest",
    "incremental_hll_ingest",
    "pricing_summary",
    "dnf_filter_events",
    "segment_bins_1h",
    "row_count_bins_500",
    "snapshot_1d_6h",
    "session_windows",
    # --- slot-50 boundary: the window ends at session_windows
    # (slot 50, counted: 4 + 22 + 6 + 18). Round 10's window head =
    # the 32 r7-greens below (the two displaced reps first), oldest
    # evidence after this round:
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
