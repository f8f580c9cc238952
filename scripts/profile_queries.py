#!/usr/bin/env python
"""Per-query profiler for the optimization round: for each named query
(default: the top-N slowest from the committed bench_results.json), run it
in isolation and split the wall into

* ``plan_s``   — Python-side DataFrame construction (py4j plan building,
  artifact stat checks, any driver-side collects the builder fn does);
* ``exec_s``   — the terminal ``collect()`` (Catalyst analysis through
  result fetch);
* ``jobs``     — Spark jobs launched by the WHOLE call (status tracker
  delta), a direct count of action round-trips / AQE stage waves;
* ``stages``   — completed stage count delta;
* ``tasks``    — completed task count delta.

Usage: python scripts/profile_queries.py [--top N] [--runs K] [name ...]
Writes nothing; prints a table to stdout.  Run it ALONE (timing).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    top_n = 0
    runs = 3
    if "--top" in args:
        i = args.index("--top")
        top_n = int(args[i + 1])
        del args[i:i + 2]
    if "--runs" in args:
        i = args.index("--runs")
        runs = int(args[i + 1])
        del args[i:i + 2]
    names = list(args)

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if top_n:
        with open(os.path.join(here, "bench_results.json")) as fh:
            base = json.load(fh)["queries"]
        names += [
            n for n, _ in sorted(base.items(), key=lambda kv: -kv[1])[:top_n]
            if n not in names
        ]

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.environ["PARQUERY_SPARK_MASTER"] = f"local[{cpus}]"
    os.environ.setdefault("PARQUERY_SPARK_SHUFFLE_PARTITIONS", cpus)

    from parquery_spark.queries import QUERIES
    from parquery_spark.session import get_spark

    spark = get_spark("profile_queries")
    sc = spark.sparkContext
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    li.groupBy("l_returnflag").agg(F.sum("l_quantity")).collect()
    spark.range(int(cpus) * 4).repartition(int(cpus)).mapInPandas(
        lambda it: it, schema="id long"
    ).collect()

    tracker = sc.statusTracker()

    def job_ids():
        return set(tracker.getJobIdsForGroup(None) or [])

    print(f"# sf_dir={sf_dir} cpus={cpus} runs={runs} (reporting min)")
    print(f"{'query':40s} {'total':>7s} {'plan':>7s} {'exec':>7s} "
          f"{'jobs':>5s} {'stages':>7s} {'tasks':>6s} {'rows':>6s}")
    for name in names:
        fn = QUERIES[name][0]
        best = None
        for _ in range(runs):
            sc.setJobDescription(f"profile:{name}")
            j0 = job_ids()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            rows = df.collect()
            t2 = time.perf_counter()
            j1 = job_ids()
            new_jobs = j1 - j0
            n_stages = n_tasks = 0
            for j in new_jobs:
                ji = tracker.getJobInfo(j)
                if ji is None:
                    continue
                for s in ji.stageIds:
                    si = tracker.getStageInfo(s)
                    if si is not None:
                        n_stages += 1
                        n_tasks += si.numCompletedTasks
            rec = (t2 - t0, t1 - t0, t2 - t1, len(new_jobs), n_stages,
                   n_tasks, len(rows))
            if best is None or rec[0] < best[0]:
                best = rec
        sc.setJobDescription(None)
        tot, plan, ex, nj, ns, nt, nr = best
        print(f"{name:40s} {tot:7.3f} {plan:7.3f} {ex:7.3f} "
              f"{nj:5d} {ns:7d} {nt:6d} {nr:6d}")


if __name__ == "__main__":
    main()
