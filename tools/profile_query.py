#!/usr/bin/env python
"""Profile registered queries: run each (noop sink) with the Spark UI
enabled, then dump per-job and per-stage wall/metrics from the UI REST
API so the slow part is identifiable without a browser (guide §1/§7).

Usage: python tools/profile_query.py <query> [<query> ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _get(port: int, path: str):
    with urllib.request.urlopen(f"http://localhost:{port}/api/v1/{path}") as r:
        return json.load(r)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    names = sys.argv[1:]

    from oups_spark.queries import REGISTRY, load_all_query_modules
    from oups_spark.session import get_spark

    load_all_query_modules()
    spark = get_spark("oups-profile", extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    port = int(spark.sparkContext.uiWebUrl.rsplit(":", 1)[-1])
    app = _get(port, "applications")[0]["id"]
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    for name in names:
        q = REGISTRY[name]
        # warm rep first (codegen/compile), profile the second
        for rep in range(2):
            jobs_before = {j["jobId"] for j in _get(port, f"applications/{app}/jobs?status=succeeded")}
            spark.sparkContext.setJobDescription(f"{name} rep{rep}")
            t0 = time.time()
            df = q.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            spark.catalog.clearCache()
            for rdd in list(spark.sparkContext._jsc.getPersistentRDDs().values()):
                rdd.unpersist()
        jobs = [
            j
            for j in _get(port, f"applications/{app}/jobs?status=succeeded")
            if j["jobId"] not in jobs_before
        ]
        jobs.sort(key=lambda j: j["jobId"])
        njobs = len(jobs)
        tot_job = 0.0
        rows = []
        for j in jobs:
            t_sub = time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            t_end = time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S")
            # sub-second resolution from the GMT strings' millis
            ms_sub = float(j["submissionTime"][20:23] or 0) / 1000
            ms_end = float(j["completionTime"][20:23] or 0) / 1000
            dur = (time.mktime(t_end) + ms_end) - (time.mktime(t_sub) + ms_sub)
            tot_job += dur
            rows.append((dur, j["jobId"], j.get("description") or j["name"][:90], j["numTasks"]))
        rows.sort(reverse=True)
        print(f"\n== {name}: wall {wall:.2f}s, {njobs} jobs, sum(job_wall) {tot_job:.2f}s (gaps = driver time {wall - tot_job:.2f}s)")
        for dur, jid, desc, ntasks in rows[:14]:
            print(f"   {dur:6.2f}s  job {jid:<5} tasks={ntasks:<4} {desc[:110]}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
