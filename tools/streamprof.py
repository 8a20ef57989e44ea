#!/usr/bin/env python
"""Phase decomposition of the real-engine streaming rows.

Usage: python tools/streamprof.py [--sf DIR] [--runs N] name [name ...]

For each named query: runs it noop-timed with a StreamingQueryListener
attached and splits the wall time into
  setup      builder time before the first stream starts (feed
             derivation + epoch-file writes)
  stream     sum over micro-batches of triggerExecution, further split
             by the engine's own durationMs accounting (addBatch,
             queryPlanning, walCommit, commitOffsets, getBatch,
             latestOffset)
  gap        wall - setup - stream - readback: scheduler/trigger idle
             time between batches plus stop/teardown
  readback   time after the last stream terminates (sink read + guard
             asserts + the noop write of the returned frame)
Prints one JSON line per query and a per-batch table; writes
plans/r13/<name>_streamprof.json.
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
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from pyspark.sql.streaming import StreamingQueryListener

    from takuan_spark.operators.skew import release_materialized
    from takuan_spark.queries import REGISTRY, _load
    from takuan_spark.session import get_spark

    _load()
    spark = get_spark(app_name="takuan-streamprof")
    spark.sparkContext.setLogLevel("ERROR")

    progresses: list[dict] = []
    started: list[float] = []
    terminated: list[float] = []

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            started.append(time.perf_counter())

        def onQueryProgress(self, event):
            progresses.append(json.loads(event.progress.json))

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            terminated.append(time.perf_counter())

    spark.streams.addListener(Capture())

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # bench-identical warmup
    REGISTRY["q1_pricing_summary"].builder(spark, args.sf).count()
    spark.range(1000, numPartitions=32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    noop(REGISTRY[args.names[0]].builder(spark, args.sf))

    os.makedirs(os.path.join(REPO, "plans", "r13"), exist_ok=True)
    for name in args.names:
        per_run = []
        for _ in range(args.runs):
            progresses.clear()
            started.clear()
            terminated.clear()
            t0 = time.perf_counter()
            noop(REGISTRY[name].builder(spark, args.sf))
            wall = time.perf_counter() - t0
            release_materialized()
            spark.catalog.clearCache()
            setup = (started[0] - t0) if started else None
            readback = (
                (t0 + wall - terminated[-1]) if terminated else None
            )
            phases: dict[str, float] = {}
            batches = []
            for p in progresses:
                dm = p.get("durationMs", {})
                for k, v in dm.items():
                    phases[k] = phases.get(k, 0) + v / 1000.0
                batches.append(
                    {
                        "batchId": p.get("batchId"),
                        "numInputRows": p.get("numInputRows"),
                        "durationMs": dm,
                        "stateOperators": [
                            {
                                k: op.get(k)
                                for k in (
                                    "operatorName",
                                    "numRowsTotal",
                                    "commitTimeMs",
                                    "allUpdatesTimeMs",
                                    "allRemovalsTimeMs",
                                    "timeTakenMs",
                                )
                            }
                            for op in p.get("stateOperators", [])
                        ],
                    }
                )
            trig = phases.get("triggerExecution", 0.0)
            per_run.append(
                {
                    "wall_s": round(wall, 3),
                    "setup_s": round(setup, 3) if setup else None,
                    "stream_trigger_s": round(trig, 3),
                    "gap_s": round(
                        wall - (setup or 0) - trig - (readback or 0), 3
                    ),
                    "readback_s": round(readback, 3) if readback else None,
                    "n_batches": len(batches),
                    "n_streams": len(started),
                    "phases_s": {
                        k: round(v, 3) for k, v in sorted(phases.items())
                    },
                    "batches": batches,
                }
            )
        med = sorted(per_run, key=lambda r: r["wall_s"])[len(per_run) // 2]
        out = {"name": name, "runs": per_run, "median_run": med}
        with open(
            os.path.join(REPO, "plans", "r13", f"{name}_streamprof.json"),
            "w",
        ) as fh:
            json.dump(out, fh, indent=1)
        print(
            json.dumps(
                {
                    "name": name,
                    "walls": [r["wall_s"] for r in per_run],
                    "median": {
                        k: med[k]
                        for k in (
                            "wall_s",
                            "setup_s",
                            "stream_trigger_s",
                            "gap_s",
                            "readback_s",
                            "n_batches",
                            "n_streams",
                        )
                    },
                    "phases_s": med["phases_s"],
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
