#!/usr/bin/env python
"""Is codegen.maxFields=500 a per-row win or a compile-time loss?

The r12 change compiled the 64-buffer MinHash signature aggregate
(>100 fields, interpreted at the default). The r13 A/Bs show maxFields
=100 FASTER on the sf0.1 cluster — hypothesis: janino compile time per
(query, session) exceeds the interpreted-execution penalty at sf0.1 row
counts, while at scale the per-row win dominates. This probe separates
the two: time the signature build at 1x and Kx the corpus under both
settings. Compile cost is constant per plan; per-row cost scales with
K. If mf500 loses at 1x but wins at Kx, the setting is scale-correct
and the sf0.1 delta is the floor price.

Usage: python tools/mfprobe.py [--sf DIR] [--repeats N] [--scales 1,8]
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
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--scales", default="1,8")
    args = ap.parse_args()
    scales = [int(s) for s in args.scales.split(",")]

    from pyspark.sql import functions as F

    from takuan_spark.operators.dedup import minhash_signatures
    from takuan_spark.session import get_spark
    from takuan_spark.tables import load_table

    spark = get_spark(app_name="takuan-mfprobe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, args.sf, "documents").select("doc_id", "text")
    docs.count()  # warm

    def build(k: int):
        if k == 1:
            d = docs
        else:
            d = docs.withColumn(
                "_r", F.explode(F.array(*[F.lit(i) for i in range(k)]))
            ).select(
                (F.col("doc_id") * k + F.col("_r")).alias("doc_id"), "text"
            )
        return minhash_signatures(d, num_hashes=64)

    variants = ["100", "500"]
    runs: dict[tuple[int, str], list[float]] = {
        (k, v): [] for k in scales for v in variants
    }
    for rep in range(args.repeats):
        rot = rep % len(variants)
        for k in scales:
            for v in variants[rot:] + variants[:rot]:
                spark.conf.set("spark.sql.codegen.maxFields", v)
                t0 = time.perf_counter()
                build(k).write.format("noop").mode("overwrite").save()
                runs[(k, v)].append(round(time.perf_counter() - t0, 3))
    spark.conf.set("spark.sql.codegen.maxFields", "500")
    print("RAW " + json.dumps({f"x{k}|mf{v}": r for (k, v), r in runs.items()}))
    for k in scales:
        med = {
            v: sorted(runs[(k, v)])[len(runs[(k, v)]) // 2] for v in variants
        }
        print(f"x{k}", json.dumps(med))


if __name__ == "__main__":
    main()
