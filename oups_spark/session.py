"""SparkSession factory tuned for the oups-spark engine.

Defaults target the driver harness (``local[32]``, 128 GiB box) but the
same knobs are what a 1000-executor cluster deployment would set:
AQE on (runtime re-plan, skew-join handling, partition coalescing),
Arrow for any pandas-UDF exchange, UTC session time zone so timestamp
semantics match the DuckDB oracle, and a bounded
``spark.sql.shuffle.partitions`` sized to the local core count.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "oups-spark",
    *,
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) the shared SparkSession.

    Parameters
    ----------
    cpus : local parallelism; defaults to ``$SPARK_GRAFT_CPUS`` or 32.
    shuffle_partitions : defaults to ``cpus`` — at cluster scale this is
        instead sized to ~2-3x total executor cores (AQE coalesces down).
    """
    cpus = str(cpus or os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        # µs-precision timestamps on write: interop-friendly and,
        # unlike the INT96 legacy default, carries footer min/max
        # stats (the ordered store's file pruning reads them).
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # The store reads explicit live-file path lists from its
        # manifest; above this many paths Spark launches a distributed
        # listing job, which on a local/POSIX transport costs far more
        # than the driver stat-ing the files itself (a ~0.6 s job for
        # 143 paths vs ~ms driver-side). High-latency object-store
        # deployments set this back down via the env knob so listing
        # parallelises across the cluster.
        .config(
            "spark.sql.sources.parallelPartitionDiscovery.threshold",
            os.environ.get("OUPS_PARALLEL_DISCOVERY_THRESHOLD", "10000"),
        )
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # PySpark 4's per-API-call origin capture (call-site info for
        # error messages) costs ~3 py4j round-trips + a Python stack
        # walk on EVERY DataFrame/Column call — measured 1.3 s of the
        # 2.2 s plan-construction time of a 60-column expression
        # builder (simhash votes). Pure driver-side debugging nicety;
        # production pipelines turn it off. Scale-independent: py4j
        # chatter is per-plan-node, not per-row.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.ansi.enabled", "false")
        # Some source tables carry timestamp[ns] parquet columns
        # (e.g. events.ts); Spark reads them as long nanos under this
        # flag and oups_spark.tables converts to microsecond
        # timestamps (same truncation DuckDB applies).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()
