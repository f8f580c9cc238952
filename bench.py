#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing excludes session startup and the one-time JVM/codegen warmup (a
trivial count over lineitem) but includes full plan + execution + collect
per query — the end-to-end latency a caller of the engine sees.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", str(os.cpu_count() or 8))
    os.environ["PARQUERY_SPARK_MASTER"] = f"local[{cpus}]"
    os.environ.setdefault("PARQUERY_SPARK_SHUFFLE_PARTITIONS", cpus)

    import __spark_entry__ as entrymod
    from parquery_spark.session import get_spark

    spark = get_spark("parquery_spark_bench")

    # warm up JVM, parquet reader, codegen, shuffle, and Python-worker paths
    # once — one-time process costs, not per-query costs
    from pyspark.sql import functions as F

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    li.groupBy("l_returnflag").agg(F.sum("l_quantity")).collect()
    spark.range(8).repartition(2).mapInPandas(
        lambda it: it, schema="id long"
    ).collect()

    timings: dict[str, float] = {}
    for name, fn in entrymod.queries().items():
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = len(df.collect())
        timings[name] = round(time.perf_counter() - t0, 4)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    print(json.dumps({
        "metric": "total_query_wall_seconds",
        "value": round(sum(timings.values()), 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": int(cpus),
        "n_queries": len(timings),
    }))


if __name__ == "__main__":
    main()
