#!/usr/bin/env python
"""Capture .explain("formatted") for named queries into plans/<outdir>/.

Usage: python tools/planq.py [--sf DIR] [--tag before|after] [--outdir r13] name...

Builds each registered query (builder side effects — scratch writes,
snapshots — run as they would in the bench) and writes the FORMATTED
plan of the returned frame to plans/<outdir>/<name>_<tag>.txt.
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--tag", default="after")
    ap.add_argument("--outdir", default="r13")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from takuan_spark.queries import REGISTRY, _load
    from takuan_spark.session import get_spark

    _load()
    spark = get_spark(app_name="takuan-planq")
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(REPO, "plans", args.outdir)
    os.makedirs(outdir, exist_ok=True)
    for name in args.names:
        df = REGISTRY[name].builder(spark, args.sf)
        txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"{name}: {len(txt)} bytes -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
