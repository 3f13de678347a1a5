#!/usr/bin/env python
"""Time a subset of registered queries (args = query names) at
$SPARK_GRAFT_SF_DIR, same protocol as bench.py. Dev tool."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]
    reps = int(os.environ.get("MINIBENCH_REPS", "1"))

    from oups_spark.queries import REGISTRY, load_all_query_modules
    from oups_spark.session import get_spark

    load_all_query_modules()
    spark = get_spark("oups-spark-minibench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    timings: dict[str, list[float]] = {}
    for _ in range(reps):
        for name in names:
            q = REGISTRY[name]
            t0 = time.time()
            df = q.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            timings.setdefault(name, []).append(round(time.time() - t0, 3))
            spark.catalog.clearCache()
            for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
                rdd.unpersist()
    print(json.dumps(timings))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
