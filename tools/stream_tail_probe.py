#!/usr/bin/env python
"""Root-cause probe for the real-engine streaming bench tail (r8
verdict, "What's wrong #1"): one run in three of q_stream_window_fold /
q_stream_session_window lands at 1.6-1.7x the median while every other
family spreads ~1.1x.

Runs each real-engine streaming query N times in one session (the bench
protocol's shape) with a StreamingQueryListener attached, so every
micro-batch's engine-reported phase durations (durationMs: addBatch,
getBatch, latestOffset, queryPlanning, walCommit, commitOffsets,
triggerExecution) land in a per-run breakdown. The outlier's slow phase
is then named from the engine's own accounting instead of guessed.

Usage: python tools/stream_tail_probe.py [runs_per_query]
Writes /tmp/stream_tail_probe.json and prints a per-run phase table.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = ["q_stream_window_fold", "q_stream_session_window", "q_stream_late_drop"]


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 9

    from pyspark.sql.streaming import StreamingQueryListener

    from takuan_spark.queries import REGISTRY, _load
    from takuan_spark.session import get_spark

    _load()
    spark = get_spark(app_name="takuan-stream-tail-probe")
    spark.sparkContext.setLogLevel("ERROR")

    progresses: list[dict] = []

    class Capture(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            progresses.append(json.loads(event.progress.json))

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    spark.streams.addListener(Capture())

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # one warm pass of each (JIT/codegen/python-worker warmup, exactly
    # like bench.py's warmup) before measuring
    for name in QUERIES:
        noop(REGISTRY[name].builder(spark, SF_DIR))
    progresses.clear()

    report: dict[str, list[dict]] = {n: [] for n in QUERIES}
    for r in range(runs):
        for name in QUERIES:
            progresses.clear()
            t0 = time.perf_counter()
            noop(REGISTRY[name].builder(spark, SF_DIR))
            wall = time.perf_counter() - t0
            from takuan_spark.operators.skew import release_materialized

            release_materialized()
            spark.catalog.clearCache()
            # listener events arrive async; give the tail a beat
            time.sleep(0.3)
            phases: dict[str, float] = {}
            state: dict[str, float] = {}
            for p in progresses:
                for k, v in (p.get("durationMs") or {}).items():
                    phases[k] = phases.get(k, 0.0) + v / 1000.0
                for op in p.get("stateOperators") or []:
                    for k in (
                        "commitTimeMs",
                        "allUpdatesTimeMs",
                        "allRemovalsTimeMs",
                    ):
                        state[k] = state.get(k, 0.0) + op.get(k, 0) / 1000.0
            report[name].append(
                {
                    "wall_sec": round(wall, 3),
                    "n_batches": len(progresses),
                    "phases_sec": {k: round(v, 3) for k, v in phases.items()},
                    "state_sec": {k: round(v, 3) for k, v in state.items()},
                }
            )
            print(
                f"run {r} {name}: {wall:.2f}s batches={len(progresses)} "
                f"phases={ {k: round(v, 2) for k, v in sorted(phases.items(), key=lambda kv: -kv[1])[:4]} }",
                flush=True,
            )

    with open("/tmp/stream_tail_probe.json", "w") as fh:
        json.dump(report, fh, indent=1)
    # summary: per query, median vs max wall and the phase that moves
    for name, rows in report.items():
        walls = sorted(x["wall_sec"] for x in rows)
        med = walls[len(walls) // 2]
        print(f"\n{name}: median {med:.2f}s max {walls[-1]:.2f}s "
              f"(max/med {walls[-1] / med:.2f}x)")
        slow = max(rows, key=lambda x: x["wall_sec"])
        fast = min(rows, key=lambda x: x["wall_sec"])
        keys = set(slow["phases_sec"]) | set(fast["phases_sec"])
        for k in sorted(keys, key=lambda k: -(slow["phases_sec"].get(k, 0) - fast["phases_sec"].get(k, 0))):
            d = slow["phases_sec"].get(k, 0) - fast["phases_sec"].get(k, 0)
            if abs(d) > 0.05:
                print(f"  {k}: slow {slow['phases_sec'].get(k, 0):.2f}s vs "
                      f"fast {fast['phases_sec'].get(k, 0):.2f}s (delta {d:+.2f}s)")
        un = slow["wall_sec"] - sum(slow["phases_sec"].get(k, 0) for k in ("triggerExecution",))
        print(f"  outside-trigger time in slow run: {un:.2f}s "
              f"(driver-side file writes, plan build, sink read)")
    spark.stop()


if __name__ == "__main__":
    main()
