#!/usr/bin/env python
"""Per-query empirical profiler (guide §1/§7): run a registered query
against the noop sink with the Spark UI enabled, then pull per-job /
per-stage wall-clock and shuffle metrics from the UI REST API and dump
the FINAL (post-AQE) executed plan.

Usage: python tools/profileq.py [--sf DIR] [--runs N] name [name ...]

Writes, per query, ``plans/r12/<name>_profile.json`` with:
  wall_s            median noop-sink wall time across runs
  jobs              [{jobId, name, duration_ms, stages: [...]}]
  stages            [{stageId, name, duration_ms, numTasks,
                      shuffle_read_mb, shuffle_write_mb, input_mb}]
and prints a compact summary to stdout. The executed plan (what AQE
actually ran, not the initial estimate) goes next to it as
``plans/r12/<name>_executed.txt``.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--outdir", default="r13")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from takuan_spark.operators.skew import release_materialized
    from takuan_spark.queries import REGISTRY, _load
    from takuan_spark.session import get_spark

    _load()
    spark = get_spark(
        app_name="takuan-profileq", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    ui = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId

    def rest(path: str):
        with urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}{path}") as r:
            return json.load(r)

    # warm JVM / python workers as bench.py does
    REGISTRY["q1_pricing_summary"].builder(spark, args.sf).count()
    spark.range(1000, numPartitions=32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    os.makedirs(os.path.join(REPO, "plans", args.outdir), exist_ok=True)
    for name in args.names:
        walls = []
        first_jobs: list[int] = []
        plan_txt = ""
        for i in range(args.runs):
            release_materialized()
            spark.catalog.clearCache()
            jobs_before = {j["jobId"] for j in rest("/jobs")}
            spark.sparkContext.setJobDescription(f"profile:{name}")
            t0 = time.perf_counter()
            df = REGISTRY[name].builder(spark, args.sf)
            df.write.format("noop").mode("overwrite").save()
            walls.append(round(time.perf_counter() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            if i == args.runs - 1:
                first_jobs = sorted(
                    j["jobId"] for j in rest("/jobs") if j["jobId"] not in jobs_before
                )
                try:
                    plan_txt = df._jdf.queryExecution().executedPlan().toString()
                except Exception as e:  # plan of the last action
                    plan_txt = f"<failed: {e!r}>"
        jobs = []
        stage_ids = set()
        for jid in first_jobs:
            j = rest(f"/jobs/{jid}")
            dur = None
            if j.get("completionTime") and j.get("submissionTime"):
                from datetime import datetime

                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                try:
                    dur = (
                        datetime.strptime(j["completionTime"], fmt)
                        - datetime.strptime(j["submissionTime"], fmt)
                    ).total_seconds() * 1000
                except ValueError:
                    dur = None
            jobs.append(
                {
                    "jobId": jid,
                    "name": (j.get("name") or "")[:100],
                    "duration_ms": round(dur, 1) if dur else None,
                    "stages": j.get("stageIds", []),
                }
            )
            stage_ids.update(j.get("stageIds", []))
        stages = []
        for s in rest("/stages?status=complete"):
            if s["stageId"] not in stage_ids:
                continue
            stages.append(
                {
                    "stageId": s["stageId"],
                    "name": (s.get("name") or "")[:80],
                    "duration_ms": s.get("executorRunTime"),
                    "numTasks": s.get("numTasks"),
                    "input_mb": round(s.get("inputBytes", 0) / 1e6, 2),
                    "shuffle_read_mb": round(s.get("shuffleReadBytes", 0) / 1e6, 2),
                    "shuffle_write_mb": round(s.get("shuffleWriteBytes", 0) / 1e6, 2),
                }
            )
        stages.sort(key=lambda s: -(s["duration_ms"] or 0))
        out = {
            "name": name,
            "wall_s": sorted(walls)[len(walls) // 2],
            "runs": walls,
            "n_jobs": len(jobs),
            "n_stages": len(stages),
            "sum_stage_executor_ms": sum(s["duration_ms"] or 0 for s in stages),
            "jobs": jobs,
            "stages": stages,
        }
        with open(
            os.path.join(REPO, "plans", args.outdir, f"{name}_profile.json"), "w"
        ) as fh:
            json.dump(out, fh, indent=1)
        with open(
            os.path.join(REPO, "plans", args.outdir, f"{name}_executed.txt"), "w"
        ) as fh:
            fh.write(plan_txt)
        print(
            json.dumps(
                {
                    "name": name,
                    "wall_s": out["wall_s"],
                    "runs": walls,
                    "n_jobs": out["n_jobs"],
                    "n_stages": out["n_stages"],
                    "executor_core_s": round(out["sum_stage_executor_ms"] / 1000, 2),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
