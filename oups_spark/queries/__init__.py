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
# Round-6 window (executed as documented in round 5): the complement
# of round 5's window — exactly the 46 queries that sat past slot 50
# in round 5 (the 41 r4-green queries displaced by round 5's A ∪ B
# rotation plus the 5 round-5 registrations that have never had a
# driver correctness row: neardup_keep_best, ccnet_quality_buckets,
# duplicate_span_removal, temperature_source_mix,
# packed_training_sequences) — plus 4 slack re-greens picked to
# re-verify code changed this round (kmeans init-collect fold,
# SemDeDup k default, IVF oracle rewrite, driver-merge byte gate).
# With this window, every registered query has a driver-green row
# within rounds 5–6 (97th = leakage_safe_splits, landing this round
# with a slot per the round-5 lesson: never-checked first).
#
# Round-7 window plan, in priority order:
#   1. any round-7 registrations (never-checked first — the rule);
#   2. the 9 round-6 registrations that landed after this window
#      filled — countmin_heavy_hitters, histogram_quantiles_by_type,
#      incremental_hll_ingest, bloom_decontamination,
#      cohort_retention_weekly, streaming_hll_ingest,
#      hll_source_overlap, mmr_diverse_topk, ewma_user_values —
#      locally green at sf0.001/0.01/0.1 but never driver-checked;
#   3. the two displaced re-greens (ann_ivf_topk,
#      store_merge_keep_last);
#   4. the remaining round-5-window queries (oldest driver row
#      first), so no query's last green row ages past two rounds
#      where slots allow.
_WINDOW_PRIORITY = [
    # Never driver-checked round-5 registrations (5) — first priority
    "neardup_keep_best",
    "ccnet_quality_buckets",
    "duplicate_span_removal",
    "temperature_source_mix",
    "packed_training_sequences",
    # r4-green queries displaced by round 5's window (41), in their
    # round-5 import order
    "revenue_by_nation",
    "top_customers",
    "order_priority_counts",
    "shipping_priority",
    "promo_revenue_monthly",
    "regional_supplier_volume",
    "salted_join_order_customer",
    "lang_id",
    "ngram_jaccard_pairs",
    "minhash_signatures",
    "neardup_clusters",
    "simhash_signatures",
    "embedding_neardup_pairs",
    "ann_lsh_topk",
    "multimodal_features",
    "corpus_curation",
    "token_pack_assignment",
    "stratified_sample_mix",
    "multimodal_frame_sample",
    "simhash_neardup_pairs",
    "ann_pq_topk",
    "incremental_neardup_ingest",
    "ffill_bfill_user_values",
    "customers_without_orders",
    "calendar_floor_ceil",
    "moving_avg_per_user",
    "value_percentiles_by_type",
    "daily_type_pivot",
    "trailing_24h_per_user",
    "repetition_stats",
    "decontamination_overlap",
    "pii_scan",
    "embedding_quantize",
    "label_centroids",
    "json_props_extract",
    "duplicated_windows",
    "lm_quality_score",
    "doc_chunk_overlap",
    "bm25_topk",
    "deterministic_shuffle",
    "source_quota_topk",
    # New round-6 registrations — never checked, so they take window
    # slots in their landing round (the round-5 lesson). The last two
    # displaced the originally-planned slack re-greens (ann_ivf_topk,
    # store_merge_keep_last): both re-greens were green in ROUND 5's
    # window, so every registered query still has a driver-green row
    # within rounds 5–6, and never-checked-first beats re-verifying
    # locally-validated code changes (the pure-SQL IVF oracle and the
    # driver-merge byte gate are pytest- and local-oracle-covered;
    # they get driver rows again in round 7's swap-back).
    "leakage_safe_splits",
    "quality_classifier_scores",
    "hll_distinct_tokens",
    "conversion_funnel",
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
