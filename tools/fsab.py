#!/usr/bin/env python
"""A/B a session-level (non-runtime-togglable) config across fresh
processes — e.g. the Hadoop local-filesystem implementation, which is
baked into cached FileSystem/FileContext objects and cannot be swapped
safely inside a live session.

Usage:
  python tools/fsab.py --env TAKUAN_LOCAL_FS_RAW --values 1,0 \
      --repeats 4 name [name ...]

Each measurement is one fresh subprocess: build session, bench-identical
warmup, run the named query noop-timed once, print the seconds. The
parent interleaves (variant-inner, rotated per repeat like tools/abq.py)
so both variants share each host window, and reports per-(query,variant)
raw runs + medians. Costly (one JVM per point) but unimpeachable on a
config that only applies at session construction.
"""
from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = r"""
import os, sys, time
sys.path.insert(0, {repo!r})
from takuan_spark.queries import REGISTRY, _load
from takuan_spark.session import get_spark
_load()
spark = get_spark(app_name="takuan-fsab")
spark.sparkContext.setLogLevel("ERROR")
REGISTRY["q1_pricing_summary"].builder(spark, {sf!r}).count()
spark.range(1000, numPartitions=32).mapInPandas(
    lambda it: it, schema="id long"
).write.format("noop").mode("overwrite").save()
t0 = time.perf_counter()
REGISTRY[{name!r}].builder(spark, {sf!r}).write.format("noop").mode(
    "overwrite"
).save()
print("FSAB_SECS", round(time.perf_counter() - t0, 3))
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--env", default="TAKUAN_LOCAL_FS_RAW")
    ap.add_argument("--values", default="1,0")
    ap.add_argument("--repeats", type=int, default=4)
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    values = args.values.split(",")

    runs: dict[tuple[str, str], list[float]] = {
        (n, v): [] for n in args.names for v in values
    }
    for rep in range(args.repeats):
        rot = rep % len(values)
        for n in args.names:
            for v in values[rot:] + values[:rot]:
                env = dict(os.environ, **{args.env: v})
                out = subprocess.run(
                    [
                        sys.executable,
                        "-c",
                        _CHILD.format(repo=REPO, sf=args.sf, name=n),
                    ],
                    env=env,
                    capture_output=True,
                    text=True,
                    timeout=1200,
                )
                secs = None
                for line in out.stdout.splitlines():
                    if line.startswith("FSAB_SECS"):
                        secs = float(line.split()[1])
                if secs is None:
                    print(
                        f"CHILD FAILED {n} {args.env}={v}\n{out.stdout[-2000:]}"
                        f"\n{out.stderr[-4000:]}",
                        flush=True,
                    )
                    sys.exit(1)
                runs[(n, v)].append(secs)
                print(f"rep{rep} {n} {args.env}={v}: {secs}", flush=True)

    print("RAW " + json.dumps({f"{n}|{v}": r for (n, v), r in runs.items()}))
    for n in args.names:
        med = {
            v: sorted(runs[(n, v)])[len(runs[(n, v)]) // 2] for v in values
        }
        print(n, json.dumps(med))


if __name__ == "__main__":
    main()
