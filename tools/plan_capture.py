#!/usr/bin/env python
"""Capture `.explain("formatted")` of registered queries to files.

Usage: python tools/plan_capture.py <outdir> <suffix> <query> [...]
Writes <outdir>/<query>_<suffix>.txt for each query.
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    from oups_spark.queries import REGISTRY, load_all_query_modules
    from oups_spark.session import get_spark

    load_all_query_modules()
    spark = get_spark("plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        try:
            df = REGISTRY[name].fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001
            plan = f"(plan unavailable: {exc})"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(plan)
        print(f"[plan] {name} -> {name}_{suffix}.txt")
        spark.catalog.clearCache()
        for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
            rdd.unpersist()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
