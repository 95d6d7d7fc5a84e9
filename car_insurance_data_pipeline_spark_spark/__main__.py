"""Command-line entry point.

The reference is driven as numbered scripts (python scripts/01_*.py
... 11_*.py); this engine's equivalent surface is one CLI over the
query catalog and the insurance pipeline:

    python -m car_insurance_data_pipeline_spark_spark list
    python -m car_insurance_data_pipeline_spark_spark run q01_pricing_summary \
        --sf-dir /root/testdata/sf0.01 --limit 10 [--explain]
    python -m car_insurance_data_pipeline_spark_spark oracle q01_pricing_summary
    python -m car_insurance_data_pipeline_spark_spark pipeline RAW_DIR OUT_DIR
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="car_insurance_data_pipeline_spark_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list catalog queries")

    runp = sub.add_parser("run", help="run a catalog query")
    runp.add_argument("query")
    runp.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    runp.add_argument("--limit", type=int, default=20)
    runp.add_argument(
        "--explain", action="store_true", help="print the formatted plan"
    )

    orap = sub.add_parser("oracle", help="print a query's DuckDB oracle SQL")
    orap.add_argument("query")

    pipp = sub.add_parser(
        "pipeline", help="run the full insurance warehouse pipeline"
    )
    pipp.add_argument("raw_dir")
    pipp.add_argument("out_dir")

    args = p.parse_args(argv)

    from car_insurance_data_pipeline_spark_spark.plans.catalog import specs

    if args.cmd == "list":
        for name, s in specs().items():
            tag = "oracle" if s.oracle else "rows-only"
            head = s.doc.splitlines()[0] if s.doc else ""
            print(f"{name:36s} [{tag}] {head}")
        return 0

    if args.cmd == "oracle":
        s = specs().get(args.query)
        if s is None:
            print(f"unknown query: {args.query}", file=sys.stderr)
            return 2
        if s.oracle is None:
            print(f"{args.query} is rows-only (no oracle)", file=sys.stderr)
            return 1
        print(s.oracle.strip())
        return 0

    from car_insurance_data_pipeline_spark_spark.session import get_session

    if args.cmd == "run":
        s = specs().get(args.query)
        if s is None:
            print(f"unknown query: {args.query}", file=sys.stderr)
            return 2
        spark = get_session(app_name=f"cli-{args.query}")
        try:
            df = s.fn(spark, args.sf_dir)
            if args.explain:
                df.explain("formatted")
            df.show(args.limit, truncate=False)
            print(f"rows: {df.count()}")
        finally:
            spark.stop()
        return 0

    if args.cmd == "pipeline":
        from car_insurance_data_pipeline_spark_spark.plans.insurance import (
            run_pipeline,
        )

        spark = get_session(app_name="cli-pipeline")
        try:
            out = run_pipeline(spark, args.raw_dir, args.out_dir)
            for name, df in out.items():
                print(f"{name}: {df.count()} rows")
        finally:
            spark.stop()
        return 0

    return 2


if __name__ == "__main__":
    raise SystemExit(main())
