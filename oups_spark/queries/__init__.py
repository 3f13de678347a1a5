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
# Two-round rotation covering every registered query (96 after the
# round-5 additions):
#   round 5 window = A ∪ B ∪ R5   (this list)
#   round 6 window = C ∪ R6       (swap _WINDOW_PRIORITY for the
#                                  complement — exactly the 46 queries
#                                  past slot 50 this round: the 38
#                                  r4-green queries displaced by A ∪ B
#                                  and the 8 round-5 registrations
#                                  beyond the window, among them
#                                  duplicate_span_removal,
#                                  temperature_source_mix,
#                                  packed_training_sequences,
#                                  neardup_keep_best,
#                                  ccnet_quality_buckets — plus 4
#                                  slack re-greens)
# where
#   A = 17 queries that had never had a driver correctness row
#       through round 4,
#   B = 21 oups-core queries green in round 3 but pushed out of
#       round 4's window,
#   C = the r4-green queries displaced by A ∪ B,
#   R5/R6 = rotation picks (R5 includes the first 3 round-5 additions
#       and kmeans_clusters, re-verified after its oracle change).
_WINDOW_PRIORITY = [
    # A: never driver-checked through round 4 (17)
    "store_time_travel",
    "store_schema_evolution",
    "store_stats_skipping",
    "jsonl_ingest_roundtrip",
    "aggstream_edge_bins_restart",
    "streaming_native_sessions",
    "streaming_stateful_ffill",
    "streaming_dedup_ingest",
    "streaming_interval_join",
    "streaming_sliding_hourly",
    "twap_hourly",
    "snapshot_irregular_edges",
    "sliding_window_1h_15m",
    "text_feature_vectors",
    "source_quota_twophase",
    "corpus_pipeline_end2end",
    "topic_clusters",
    # B: oups-core, green in r3 but outside r4's window (21)
    "segment_bins_1h",
    "segment_bins_4h_right",
    "segment_bins_month_right",
    "segment_bins_quarter_right",
    "segment_bins_4h_0930_offset",
    "segment_bins_explicit_edges",
    "row_count_bins_500",
    "snapshot_1d_6h",
    "snapshot_1y_1ms",
    "store_merge_keep_last",
    "store_append_range_read",
    "store_compact_roundtrip",
    "dnf_filter_events",
    "aggstream_hourly_restart",
    "aggstream_snapshots_restart",
    "streaming_native_hourly",
    "session_windows",
    "volume_bars_10k",
    "aggstream_filter_fanout",
    "intersections_bucket_align",
    "rollup_pricing",
    # R5: rotation picks (12) — the 3 NEW round-5 selection queries
    # (never checked by definition), kmeans_clusters to re-verify
    # after the persist + oracle change, and re-greens from r4
    "dsir_importance_weights",
    "dsir_gumbel_topk",
    "semdedup_prune",
    "pricing_summary",
    "kmeans_clusters",
    "asof_click_before_purchase",
    "range_join_first_week",
    "dedup_exact",
    "minhash_lsh_neardup_pairs",
    "embedding_cosine_topk",
    "ann_ivf_topk",
    "text_stats",
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
