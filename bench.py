#!/usr/bin/env python
"""Benchmark harness: runs every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract: the LAST stdout line is one compact JSON summary
{"metric", "value": total_sec, "unit": "sec", "sf", "n_queries",
"mean_sec", "queries": {15 slowest}, "queries_truncated": true,
"detail": "BENCH_DETAIL.json"} sized to fit the driver's ~2000-char
tail capture (the full >100-entry per-query map cannot). The complete
map is written to BENCH_DETAIL.json at the repo root and also printed
as an earlier stdout line.

Queries execute against the noop sink — full plan execution (scan →
shuffle → result) without driver-side collection, so the measured time is
engine time, not toPandas serialization. A synthetic log-pipeline case
(200k sshd/nginx lines through the config-compiled parse→rules→report
plan) is included as `log_pipeline` since that is the reference's actual
hot path.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_LOG_LINES = int(os.environ.get("TAKUAN_BENCH_LOG_LINES", "200000"))


def _gen_logs(tmp: str) -> dict[str, str]:
    """Deterministic synthetic auth.log/access.log chunks."""
    ssh_dir = os.path.join(tmp, "ssh")
    http_dir = os.path.join(tmp, "http")
    os.makedirs(ssh_dir)
    os.makedirs(http_dir)
    msgs = [
        "Authentication failed for invalid user admin",
        "Invalid user oracle",
        "Accepted password for root",  # no rule -> dropped
    ]
    n_ssh = N_LOG_LINES // 2
    with open(os.path.join(ssh_dir, "auth.log"), "w") as fh:
        for i in range(n_ssh):
            ip = f"203.0.{(i // 251) % 256}.{i % 251}"
            fh.write(
                f"Aug {1 + i % 28:2d} 06:{i % 60:02d}:{i % 60:02d} host1 "
                f"sshd[{1000 + i}]: {msgs[i % 3]} from {ip} port 22\n"
            )
    uas = ["python-requests/2.31", "Mozilla/5.0", "curl/8.1"]
    paths = ["/index.php", "/", "/api/v1", "/wp-login.php"]
    n_http = N_LOG_LINES - n_ssh
    with open(os.path.join(http_dir, "access.log"), "w") as fh:
        for i in range(n_http):
            ip = f"198.51.{(i // 251) % 256}.{i % 251}"
            fh.write(
                f'{ip} - - [{1 + i % 28:02d}/Aug/2026:06:{i % 60:02d}:{i % 60:02d} +0000] '
                f'"GET {paths[i % 4]} HTTP/1.1" 200 {100 + i % 900} "-" "{uas[i % 3]}"\n'
            )
    return {"ssh": ssh_dir, "http": http_dir}


def main() -> None:
    from takuan_spark.config import load_config
    from takuan_spark.operators.reports import address_report
    from takuan_spark.plans.compiler import compile_batch
    from takuan_spark.queries import REGISTRY, _load
    from takuan_spark.session import get_spark

    _load()
    spark = get_spark(app_name="takuan-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def execute(df):
        df.write.format("noop").mode("overwrite").save()

    timings: dict[str, float] = {}

    # warm the JVM/codegen paths and the Python-UDF worker pool once so
    # per-query numbers measure the engine, not first-call JIT or
    # worker spawn.
    REGISTRY["q1_pricing_summary"].builder(spark, SF_DIR).count()
    spark.range(1000, numPartitions=32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    for name, spec in REGISTRY.items():
        t0 = time.perf_counter()
        execute(spec.builder(spark, SF_DIR))
        timings[name] = round(time.perf_counter() - t0, 3)
        # operators that materialize sketch frames persist them; drop
        # between queries so memory stays flat across the suite.
        spark.catalog.clearCache()

    with tempfile.TemporaryDirectory() as tmp:
        paths = _gen_logs(tmp)
        conf = load_config(os.path.join(REPO, "configs", "takuan.yml"), year=2026)
        t0 = time.perf_counter()
        events = compile_batch(spark, conf, paths=paths)
        execute(address_report(events, country_cols=None))
        timings["log_pipeline"] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Full per-query detail: one dump to a repo file (the per-round
    # artifact tail-captures ~2000 chars of stdout, which >100 query
    # names cannot fit) plus an early stdout line for log readers.
    detail = {
        "metric": "takuan_spark full query suite, sec (noop sink)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    with open(os.path.join(REPO, "BENCH_DETAIL.json"), "w") as fh:
        json.dump(detail, fh)
    print(json.dumps(detail))
    # LAST line: the compact parseable summary, sized to survive tail
    # capture — total, count, mean, and the slowest queries; the full
    # map lives in BENCH_DETAIL.json (committed with the repo).
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:15]
    )
    print(
        json.dumps(
            {
                "metric": "takuan_spark full query suite, sec (noop sink)",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(timings),
                "mean_sec": round(total / len(timings), 3),
                "queries": slowest,
                "queries_truncated": True,
                "detail": "BENCH_DETAIL.json",
            },
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
