#!/usr/bin/env python
"""Time individual registered queries (median of N noop-sink runs).

Usage: python tools/timeq.py [--sf DIR] [--repeats N] name [name ...]
Prints one JSON line {name: median_sec}. Mirrors bench.py's protocol
(noop sink, clearCache between runs, warmed JVM/worker pool).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from takuan_spark.queries import REGISTRY, _load
    from takuan_spark.session import get_spark

    _load()
    spark = get_spark(app_name="takuan-timeq")
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY["q1_pricing_summary"].builder(spark, args.sf).count()
    spark.range(1000, numPartitions=32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    runs: dict[str, list[float]] = {n: [] for n in args.names}
    for _ in range(args.repeats):
        for n in args.names:
            t0 = time.perf_counter()
            REGISTRY[n].builder(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
            runs[n].append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
    med = {
        n: sorted(v)[len(v) // 2] for n, v in runs.items()
    }
    print("RAW " + json.dumps(runs))
    print(json.dumps(med))


if __name__ == "__main__":
    main()
