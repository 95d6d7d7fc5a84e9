#!/usr/bin/env python3
"""Isolated per-query timing + plan capture for the optimization
rounds (guide §1: measure first, label jobs, keep before/after
evidence).

Usage:
  python tools/qtime.py [--reps N] [--sf DIR] [--explain-dir DIR]
                        [--suffix _before] [--noop] query [query ...]

For each query name: run ``reps`` timed repetitions (same timed
action as bench.py — ``.count()`` — so numbers are comparable with
BENCH_DETAIL.json; ``--noop`` additionally times a
``write.format("noop")`` pass per guide §1.4, which computes every
column) and print min/median.  With --explain-dir, write
``<dir>/<query><suffix>.txt`` containing ``explain("formatted")``.

Prints one JSON line per query and a final summary line.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import statistics
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="")
    ap.add_argument("--noop", action="store_true")
    args = ap.parse_args()

    from car_insurance_data_pipeline_spark_spark.plans.catalog import (
        all_queries,
    )
    from car_insurance_data_pipeline_spark_spark.session import get_session

    spark = get_session(app_name="qtime")
    qs = all_queries()
    # same warmup as bench.py so the first query isn't charged
    # JIT/classloading or Python-worker fork startup
    qs["q02_market_segment_revenue"](spark, "/root/testdata/sf0.001").count()
    qs["q41_embedding_dup_pairs"](spark, "/root/testdata/sf0.001").count()

    def release_blocks() -> None:
        m = spark.sparkContext._jsc.getPersistentRDDs()
        for jrdd in m.values():
            jrdd.unpersist(False)
        spark.catalog.clearCache()
        gc.collect()

    results = {}
    for name in args.queries:
        samples, noop_samples = [], []
        for _ in range(args.reps):
            spark.sparkContext.setJobDescription(f"qtime:{name}")
            t0 = time.perf_counter()
            qs[name](spark, args.sf).count()
            samples.append(time.perf_counter() - t0)
            release_blocks()
            if args.noop:
                t0 = time.perf_counter()
                qs[name](spark, args.sf).write.format("noop").mode(
                    "overwrite"
                ).save()
                noop_samples.append(time.perf_counter() - t0)
                release_blocks()
            spark.sparkContext.setJobDescription(None)
        row = {
            "query": name,
            "min": round(min(samples), 3),
            "median": round(statistics.median(samples), 3),
            "reps": args.reps,
            "sf": args.sf,
        }
        if noop_samples:
            row["noop_min"] = round(min(noop_samples), 3)
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = qs[name](spark, args.sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(
                args.explain_dir, f"{name}{args.suffix}.txt"
            )
            with open(path, "w") as f:
                f.write(txt)
            row["explain"] = path
            release_blocks()
        print(json.dumps(row), flush=True)
        results[name] = row["min"]
    print(json.dumps({"metric": "qtime_total_min_sec",
                      "value": round(sum(results.values()), 3),
                      "queries": results}))
    spark.stop()


if __name__ == "__main__":
    main()
