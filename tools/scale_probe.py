#!/usr/bin/env python
"""Scale-up probe: materialize a k×-scaled copy of the sf0.1 dataset
(events/documents/embeddings unioned k times with shifted ids /
timestamps; identical text copies — a deliberately dup-heavy corpus
that stresses the dedup family), run a subset of heavy registry
queries at 1× and k×, and report the wall-time ratio per query.

A bucketed/blocked/broadcast operator should scale ~linearly in rows
(ratio ≈ k on CPU-bound work, much less when fixed job overhead
dominates at this toy scale); a ratio ≫ k exposes quadratic pair
volume or a driver bottleneck before a cluster run would.

Usage: python tools/scale_probe.py [k] [query ...]
Writes nothing outside .scratch/; prints one line per query.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
SMALL_TABLES = (
    "region nation customer supplier part orders lineitem".split()
)

DEFAULT_QUERIES = [
    "dedup_exact",
    "minhash_signatures",
    "minhash_lsh_neardup_pairs",
    "neardup_clusters",
    "leakage_safe_splits",
    "simhash_neardup_pairs",
    "duplicate_span_removal",
    "semdedup_prune",
    "packed_training_sequences",
    "dsir_importance_weights",
    "lm_quality_score",
    "bm25_topk",
    "kmeans_clusters",
    "ann_ivf_topk",
    "segment_bins_1h",
    "session_windows",
    "row_count_bins_500",
    "snapshot_1d_6h",
    "aggstream_hourly_restart",
    "store_merge_keep_last",
]


def build_scaled(spark, out_dir: str, k: int) -> None:
    import pyspark.sql.functions as F

    os.makedirs(out_dir, exist_ok=True)
    for t in SMALL_TABLES:
        src = os.path.join(BASE, f"{t}.parquet")
        if os.path.exists(src):
            shutil.copy(src, os.path.join(out_dir, f"{t}.parquet"))

    from oups_spark.tables import load as load_table

    # go through load(): it normalizes the ns-long ts to a true
    # timestamp, so the scaled copy round-trips as timestamp[us]
    ev = load_table(spark, BASE, "events")
    n_ev = ev.agg(F.max("event_id")).collect()[0][0] + 1
    span_days = 40
    parts = []
    for i in range(k):
        parts.append(
            ev.select(
                (F.col("event_id") + i * n_ev).alias("event_id"),
                (F.col("ts") + F.expr(f"INTERVAL {i * span_days} DAYS")).alias("ts"),
                (F.col("user_id") + i * 100_000).alias("user_id"),
                "event_type", "value", "props",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    # the driver's events file is globally ts-sorted and single-file;
    # store queries rely on that (validate_monotonic) — reproduce it
    out.orderBy("ts").coalesce(1).write.mode("overwrite").parquet(
        os.path.join(out_dir, "events.parquet")
    )

    docs = spark.read.parquet(os.path.join(BASE, "documents.parquet"))
    n_d = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = [
        docs.select(
            (F.col("doc_id") + i * n_d).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
        for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.coalesce(8).write.mode("overwrite").parquet(os.path.join(out_dir, "documents.parquet"))

    emb = spark.read.parquet(os.path.join(BASE, "embeddings.parquet"))
    n_e = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    parts = [
        emb.select(
            (F.col("vec_id") + i * n_e).alias("vec_id"), "embedding", "label"
        )
        for i in range(k)
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out.coalesce(4).write.mode("overwrite").parquet(os.path.join(out_dir, "embeddings.parquet"))


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    names = sys.argv[2:] or DEFAULT_QUERIES

    from oups_spark.queries import REGISTRY, load_all_query_modules
    from oups_spark.session import get_spark

    load_all_query_modules()
    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    root = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".scratch", f"scaleprobe_x{k}",
    )
    if not os.path.exists(os.path.join(root, "embeddings.parquet")):
        print(f"[probe] building {k}x dataset at {root} ...", flush=True)
        build_scaled(spark, root, k)

    def run(name, sf_dir):
        t0 = time.time()
        REGISTRY[name].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        spark.catalog.clearCache()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()
        return dt

    def out_rows(name, sf_dir):
        n = REGISTRY[name].fn(spark, sf_dir).count()
        spark.catalog.clearCache()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()
        return n

    # A dup-heavy k× corpus (k identical copies per doc) has
    # quadratically more TRUE pairs per group — wall ratio alone
    # cannot separate candidate waste from contractual output growth,
    # so report the output-row ratio next to it: wall <= output
    # growth means the operator is output-bound, not wasteful.
    hdr_rows = f"rows@1x rows@{k}x o-ratio"
    print(f"{'query':34s} {'1x':>7s} {'%dx' % k:>8s} {'ratio':>6s}  {hdr_rows}")
    for name in names:
        if name not in REGISTRY:
            continue
        try:
            run(name, BASE)  # warm plan shape
            t1 = min(run(name, BASE), run(name, BASE))
            tk = min(run(name, root), run(name, root))
            r1 = out_rows(name, BASE)
            rk = out_rows(name, root)
            orat = (rk / r1) if r1 else float("inf")
            print(
                f"{name:34s} {t1:7.2f} {tk:8.2f} {tk / t1:6.2f}"
                f"  {r1} {rk} {orat:.1f}",
                flush=True,
            )
        except Exception as exc:  # noqa: BLE001
            print(f"{name:34s} FAILED: {type(exc).__name__}: {exc}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
