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
# Round-7 window (executing the plan documented in round 6), in
# priority order:
#   1. round-7 registrations — never-checked first, the standing
#      rule: new queries take slots in their landing round (they are
#      PREPENDED to this list as they land);
#   2. the 9 round-6 registrations that landed after round 6's
#      window filled (locally green at sf0.001/0.01/0.1, never
#      driver-checked) — the whole sketch layer, made more urgent by
#      the round-6 advisor's histogram NULL finding (fixed this
#      round: nulls filtered before bucketing on both engines);
#   3. the two round-6-displaced re-greens (ann_ivf_topk,
#      store_merge_keep_last — last green r5, and the pure-SQL IVF
#      oracle / driver-merge byte gate changed since);
#   4. the round-5-green queries whose CODE changed this round
#      (dsir cache → localCheckpoint, kmeans_lloyd unpersist,
#      topic_clusters/semdedup share those paths);
#   5. remaining round-5-green queries, oldest-evidence-first, one
#      representative per shared code path ahead of its siblings
#      (e.g. segment_bins_1h before the other calendar-bin variants)
#      so a truncated window still touches every operator family.
# With 109+ registered queries and a 50-slot window the full rotation
# cadence is ~2.2 rounds; whatever falls past slot 50 here is the
# head of round 8's window.
_WINDOW_PRIORITY = [
    # (1) round-7 registrations land here, newest first
    # (2) never driver-checked round-6 sketch/stream registrations (9)
    "countmin_heavy_hitters",
    "histogram_quantiles_by_type",
    "incremental_hll_ingest",
    "bloom_decontamination",
    "cohort_retention_weekly",
    "streaming_hll_ingest",
    "hll_source_overlap",
    "mmr_diverse_topk",
    "ewma_user_values",
    # (3) displaced re-greens, last green r5, code changed in r6
    "ann_ivf_topk",
    "store_merge_keep_last",
    # (4) r5-green queries over code changed THIS round
    "dsir_importance_weights",
    "dsir_gumbel_topk",
    "kmeans_clusters",
    "topic_clusters",
    "semdedup_prune",
    # (5) remaining r5-greens, family representatives first
    "pricing_summary",
    "segment_bins_1h",
    "segment_bins_explicit_edges",
    "snapshot_1d_6h",
    "aggstream_hourly_restart",
    "aggstream_snapshots_restart",
    "store_append_range_read",
    "store_stats_skipping",
    "store_compact_roundtrip",
    "intersections_bucket_align",
    "dedup_exact",
    "minhash_lsh_neardup_pairs",
    "embedding_cosine_topk",
    "text_stats",
    "text_feature_vectors",
    "session_windows",
    "row_count_bins_500",
    "volume_bars_10k",
    "rollup_pricing",
    "dnf_filter_events",
    "asof_click_before_purchase",
    "range_join_first_week",
    "twap_hourly",
    "sliding_window_1h_15m",
    "streaming_native_hourly",
    "streaming_dedup_ingest",
    "streaming_interval_join",
    "jsonl_ingest_roundtrip",
    "corpus_pipeline_end2end",
    "source_quota_twophase",
    "store_schema_evolution",
    "store_time_travel",
    "aggstream_filter_fanout",
    "aggstream_edge_bins_restart",
    # --- slot-50 boundary lands near here; below this line = head of
    # round 8's window (all r5-green, siblings of families already
    # re-checked above): segment_bins_4h_right,
    # segment_bins_4h_0930_offset, segment_bins_month_right,
    # segment_bins_quarter_right, snapshot_1y_1ms,
    # snapshot_irregular_edges, streaming_native_sessions,
    # streaming_sliding_hourly, streaming_stateful_ffill — plus the 50
    # r6-green queries.
    "segment_bins_4h_right",
    "segment_bins_4h_0930_offset",
    "segment_bins_month_right",
    "segment_bins_quarter_right",
    "snapshot_1y_1ms",
    "snapshot_irregular_edges",
    "streaming_native_sessions",
    "streaming_sliding_hourly",
    "streaming_stateful_ffill",
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
