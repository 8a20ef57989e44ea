#!/usr/bin/env python
"""Interleaved single-variable A/B timing of registered queries.

Usage:
  python tools/abq.py --variants base,persist,mf100,smj --repeats 5 name [name ...]

Runs every (query, variant) pair noop-sink-timed, INTERLEAVED at the
innermost level (variant-inner, query-middle, repeat-outer) so each
variant pair shares the same host window — the honest protocol on this
burst-noisy host (see OPTIMIZATION_r12.md's measurement section).

Variants (all runtime-togglable in one session, so the A/B really is
single-variable):
  base     current repo defaults
  persist  TAKUAN_MATERIALIZE_MODE=persist for the run (materialize()
           call sites fall back to persist(MEMORY_AND_DISK))
  nosnap   dedup.py's direct snapshot() sites become identity (no
           materialization of the nd/bp hash sets)
  mf100    spark.sql.codegen.maxFields=100 (r11 value)
  smj      spark.sql.join.preferSortMergeJoin=true and the AQE
           SMJ->SHJ threshold off (r11 values)

Prints RAW runs and a median table per (query, variant).
"""
from __future__ import annotations

import argparse
import contextlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


@contextlib.contextmanager
def _variant(spark, name: str):
    import takuan_spark.operators.dedup as dedup_mod

    if name == "base":
        yield
    elif name == "persist":
        os.environ["TAKUAN_MATERIALIZE_MODE"] = "persist"
        try:
            yield
        finally:
            os.environ.pop("TAKUAN_MATERIALIZE_MODE", None)
    elif name == "nosnap":
        orig = dedup_mod.snapshot
        dedup_mod.snapshot = lambda df, **kw: df
        try:
            yield
        finally:
            dedup_mod.snapshot = orig
    elif name == "mf100":
        spark.conf.set("spark.sql.codegen.maxFields", "100")
        try:
            yield
        finally:
            spark.conf.set("spark.sql.codegen.maxFields", "500")
    elif name == "smj":
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
        spark.conf.set(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "0"
        )
        try:
            yield
        finally:
            spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
            spark.conf.set(
                "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                str(128 * 1024 * 1024),
            )
    elif name == "pyfold":
        # restore the pre-r13 per-element Python paths of the stateful
        # update fns (the update closures resolve these module globals
        # at CALL time, so patching applies to queries built after):
        # per-Timestamp epoch conversion, per-event gap fold, and
        # list-of-dicts alert frames with one pd.Timestamp per field.
        import pandas as _pd

        import takuan_spark.streaming.stateful as st_mod

        def _old_epoch_secs(col):
            return [int(t.timestamp()) for t in _pd.to_datetime(col)]

        def _old_fold_gap(first_us, last_us, max_gap_us, n, sorted_times):
            for t in sorted_times:
                t = int(t)
                if last_us is not None:
                    gap = t - last_us
                    if max_gap_us is None or gap > max_gap_us:
                        max_gap_us = gap
                if first_us is None:
                    first_us = t
                last_us = t
                n += 1
            return first_us, last_us, max_gap_us, n

        def _old_alerts_frame(alerts):
            return _pd.DataFrame(
                [
                    {
                        "address": a,
                        "n_events": ne,
                        "window_start": _pd.Timestamp(ws, unit="s"),
                        "window_end": _pd.Timestamp(we, unit="s"),
                    }
                    for a, ne, ws, we in alerts
                ]
            )

        saved = (st_mod._epoch_secs, st_mod._fold_gap, st_mod._alerts_frame)
        st_mod._epoch_secs = _old_epoch_secs
        st_mod._fold_gap = _old_fold_gap
        st_mod._alerts_frame = _old_alerts_frame
        try:
            yield
        finally:
            (
                st_mod._epoch_secs,
                st_mod._fold_gap,
                st_mod._alerts_frame,
            ) = saved
    elif name == "smjaqe":
        # static planner prefers SMJ (no misestimate-driven SHJ, the
        # r12 ADVICE scale-safety concern) but AQE may still convert
        # SMJ->SHJ per partition from REAL post-shuffle sizes
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "true")
        try:
            yield
        finally:
            spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")
    else:
        raise ValueError(f"unknown variant {name!r}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--variants", default="base,persist,mf100,smj")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()
    variants = args.variants.split(",")

    from takuan_spark.operators.skew import release_materialized
    from takuan_spark.queries import REGISTRY, _load
    from takuan_spark.session import get_spark

    _load()
    spark = get_spark(app_name="takuan-abq")
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY["q1_pricing_summary"].builder(spark, args.sf).count()
    spark.range(1000, numPartitions=32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()

    runs: dict[tuple[str, str], list[float]] = {
        (n, v): [] for n in args.names for v in variants
    }
    for rep in range(args.repeats):
        # rotate variant order per rep: a fixed order would let a
        # within-block warming/cooling trend masquerade as a variant
        # effect (observed in the first r13 A/B: position-1 runs were
        # systematically slowest regardless of variant)
        rot = rep % len(variants)
        for n in args.names:
            for v in variants[rot:] + variants[:rot]:
                with _variant(spark, v):
                    spark.sparkContext.setJobDescription(f"{n}/{v}/r{rep}")
                    t0 = time.perf_counter()
                    REGISTRY[n].builder(spark, args.sf).write.format(
                        "noop"
                    ).mode("overwrite").save()
                    runs[(n, v)].append(
                        round(time.perf_counter() - t0, 3)
                    )
                release_materialized()
                spark.catalog.clearCache()

    print("RAW " + json.dumps({f"{n}|{v}": r for (n, v), r in runs.items()}))
    med = {
        f"{n}|{v}": sorted(r)[len(r) // 2] for (n, v), r in runs.items()
    }
    for n in args.names:
        row = {v: med[f"{n}|{v}"] for v in variants}
        print(n, json.dumps(row))


if __name__ == "__main__":
    main()
