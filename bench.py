#!/usr/bin/env python
"""Benchmark harness: runs every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Each query runs TAKUAN_BENCH_REPEATS times (default 3) and reports the
MEDIAN, so one-off JIT/GC hiccups cannot masquerade as plan regressions
(round-3 saw a 2.2x same-query swing that a single run could not
classify as noise vs regression). Repeats are INTERLEAVED: the whole
suite runs end-to-end REPEATS times and the median is taken per query
ACROSS passes — back-to-back repeats share whatever host window they
land in, so a noisy minute used to set all three samples of the
unlucky query (round-4: ns_bm25_search repeats [1.19, 8.37, 14.25] s,
a phantom 10x "regression" with an unchanged plan). Spread across
full-suite passes, one bad window can contaminate at most one sample
per query and the median survives.

Output contract: the LAST stdout line is one compact JSON summary sized
to fit the driver's hard 2000-char tail capture. A >150-entry per-query
map is arithmetically unfittable (~30 bytes/entry ≈ 5 KB), so the line
is made self-contained at the family grain instead: "families" carries
a COMPLETE {family: [n_queries, total_sec]} rollup (nothing omitted),
plus total/mean/p50/p95/max dispersion and the slowest 12 individual
queries. The full per-query median map (and the raw per-repeat runs)
is written to BENCH_DETAIL.json at the repo root and printed as an
earlier stdout line.

Queries execute against the noop sink — full plan execution (scan →
shuffle → result) without driver-side collection, so the measured time is
engine time, not toPandas serialization. A synthetic log-pipeline case
(200k sshd/nginx lines through the config-compiled parse→rules→report
plan) is included as `log_pipeline` since that is the reference's actual
hot path.

Calibration block: suite totals on identical code moved 268–308 s
across runs in round 8 — environment drift, not plans — so
round-over-round comparison needs a mechanical normalizer. CALIBRATION
names ~6 plan-frozen queries (chosen for <=1.06 max/median run spread
and coverage of the cost bands: pure-codegen projection, window, text
explode+agg, shuffle-heavy TF-IDF, iterative graph join); their medians
are copied into a "calibration" block in BENCH_DETAIL.json and their
sum into the compact stdout line as "calib_sec". The normalized
round-over-round delta is (total_now / total_prev) /
(calib_now / calib_prev): if the calibration set moved by the same
factor as the suite, the change is environment, not code.

Spread gate (round 11): interleaving protects the median from ONE bad
window, but round 10's closing host bounced across MULTIPLE passes and
median-of-3 committed q_stream_checkpoint_restart = 32.31 s off runs
[70.8, 6.6, 32.3] — a 5x overstatement on an unchanged plan, in the
exact artifact the 2x gate reads. So after the interleaved passes the
suite re-runs, mechanically, any query that is UNSETTLED:

  - median > SPREAD_MAX x min(runs)  — the median itself sits in the
    noise tail (two of three samples landed in bad windows), or
  - median > SPREAD_MAX x its last committed same-SF median while
    min(runs) <= SPREAD_MAX x that committed value — the round-over-
    round record regressed but the best run says noise, not plan.

Each flagged query gets up to TAKUAN_BENCH_MAX_RERUNS (default 4)
extra runs, one at a time, until the median over ALL its runs settles;
the reported value is that median (outlier runs stay in the raw record,
they just lose the vote). A REAL regression stays visible: its min run
is also slow, the second arm never fires, the first settles immediately,
and the honest median stands after at most one extra run. Re-run counts
are recorded in BENCH_DETAIL.json ("reruns") and the compact line
("n_reruns") so a noisy host is legible in the committed artifact.
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
REPEATS = max(1, int(os.environ.get("TAKUAN_BENCH_REPEATS", "3")))
#: spread gate (see module docstring): a query is re-run while its
#: median exceeds SPREAD_MAX x min(runs), or SPREAD_MAX x its last
#: committed same-SF median when the min says the move is noise.
SPREAD_MAX = 1.5
MAX_RERUNS = max(0, int(os.environ.get("TAKUAN_BENCH_MAX_RERUNS", "4")))


def _median(xs: list[float]) -> float:
    s = sorted(xs)
    return s[len(s) // 2]


def _unsettled(runs: list[float], prior_median: float | None) -> bool:
    """The spread gate's predicate (module docstring, 'Spread gate')."""
    med, lo = _median(runs), min(runs)
    if med > SPREAD_MAX * lo:
        return True
    if (
        prior_median
        and med > SPREAD_MAX * prior_median
        and lo <= SPREAD_MAX * prior_median
    ):
        return True
    return False

#: Plan-frozen queries whose medians normalize cross-round totals (see
#: module docstring). Only change this set when one of them changes
#: plan — and then say so in PLANS.md, since it breaks normalization
#: continuity for that round.
#: r13: q_graph_triangles (plan changed in the r12 optimization round,
#: voiding its calibration role — OPTIMIZATION_r12.md, calibration-
#: continuity note) is replaced by q_community_labels: similar weight
#: (multi-second band), iterative self-join shape, measured-and-left-
#: alone in r12 and untouched in r13. The other five rows are unchanged
#: and carry the r12→r13 normalization; per-query medians in
#: BENCH_DETAIL.json let any subset be recomputed across rounds.
CALIBRATION = [
    "q1_pricing_summary",    # parquet scan + hash agg (codegen)
    "q_date_functions",      # pure projection, no shuffle
    "q_window_rank",         # window function over one exchange
    "ns_text_stats",         # text explode + agg
    "ns_tfidf_topterms",     # shuffle-heavy multi-stage agg
    "q_community_labels",    # iterative label-prop join, multi-second band
]


def _family(name: str) -> str:
    """Coarse suite family for the self-contained rollup line."""
    if name.startswith("takuan_"):
        return "takuan"
    if name.startswith("mm_"):
        return "multimodal"
    if name.startswith("ns_"):
        return "northstar"
    if name.startswith("q_stream"):
        return "streaming"
    if name.startswith("q_"):
        return "advanced"
    if name[0] == "q" and name[1].isdigit():
        return "tpch"
    return "pipeline"


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

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # last committed same-SF medians feed the spread gate's regression
    # arm; a detail file from a different SF (or a broken one) is
    # ignored rather than trusted.
    prior_medians: dict[str, float] = {}
    detail_path = os.path.join(REPO, "BENCH_DETAIL.json")
    if os.path.exists(detail_path):
        try:
            with open(detail_path) as fh:
                prior_doc = json.load(fh)
            if prior_doc.get("sf") == sf_val:
                prior_medians = prior_doc.get("queries", {})
        except (json.JSONDecodeError, OSError):
            pass

    def execute(df):
        df.write.format("noop").mode("overwrite").save()

    raw_runs: dict[str, list[float]] = {}

    def one_run(name: str, build) -> None:
        t0 = time.perf_counter()
        execute(build())
        raw_runs.setdefault(name, []).append(
            round(time.perf_counter() - t0, 3)
        )
        # operators that materialize sketch frames persist them; drop
        # between runs so later passes measure the same work and
        # memory stays flat across the suite. release_materialized also
        # drains the Python-side tracking list the queries' wrapper
        # maintains (operators/skew.py).
        from takuan_spark.operators.skew import release_materialized

        release_materialized()
        spark.catalog.clearCache()
        # checkpoint-mode snapshot() blocks are freed by the JVM
        # ContextCleaner only after the PYTHON wrapper is collected and
        # py4j drops its reference; a 284-query suite can otherwise
        # accumulate dead checkpoint blocks between CPython GC cycles
        # (r12 ADVICE). Collect at the (untimed) query boundary so
        # block lifetime is bounded by one query, not one GC cycle.
        import gc

        gc.collect()

    # warm the JVM/codegen paths and the Python-UDF worker pool once so
    # per-query numbers measure the engine, not first-call JIT or
    # worker spawn.
    REGISTRY["q1_pricing_summary"].builder(spark, SF_DIR).count()
    spark.range(1000, numPartitions=32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    # ... and the Structured Streaming machinery (micro-batch executor,
    # state-store and sink classes): without this the FIRST real-engine
    # streaming row's first pass pays ~1.5 s of engine class-loading
    # that belongs to no query (observed as a 1.45x run spread on
    # q_stream_window_fold while the other streaming rows sat <= 1.2x).
    with tempfile.TemporaryDirectory() as wtmp:
        wsrc = os.path.join(wtmp, "src")
        os.makedirs(wsrc)
        spark.range(8).selectExpr(
            "timestamp'2024-01-01' + make_interval(0,0,0,0,0,0,id) as ts",
            "id as k",
        ).coalesce(1).write.parquet(wsrc, mode="overwrite")
        wq = (
            spark.readStream.schema("ts timestamp, k long")
            .parquet(wsrc)
            .withWatermark("ts", "1 second")
            .groupBy("k").count()
            .writeStream.format("noop")
            .option("checkpointLocation", os.path.join(wtmp, "ckpt"))
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        # treat a warm-up that outlives the timeout as dead-on-arrival:
        # leaving it running while the TemporaryDirectory is deleted
        # produces background stream failures that can pollute the
        # first measured rows (the repo convention — _await_or_die —
        # treats this timeout as a failure, not a shrug).
        if not wq.awaitTermination(120):
            wq.stop()
            raise TimeoutError(
                "streaming warm-up query still running after 120s"
            )

    with tempfile.TemporaryDirectory() as tmp:
        paths = _gen_logs(tmp)
        conf = load_config(os.path.join(REPO, "configs", "takuan.yml"), year=2026)

        def build_pipeline():
            events = compile_batch(spark, conf, paths=paths)
            return address_report(events, country_cols=None)

        # interleaved passes: whole suite REPEATS times, median per
        # query across passes (see module docstring)
        for _ in range(REPEATS):
            for name, spec in REGISTRY.items():
                one_run(name, lambda spec=spec: spec.builder(spark, SF_DIR))
            one_run("log_pipeline", build_pipeline)

        # spread gate: re-run any unsettled query until its median
        # settles or the re-run budget is spent (module docstring).
        builders = {
            name: (lambda spec=spec: spec.builder(spark, SF_DIR))
            for name, spec in REGISTRY.items()
        }
        builders["log_pipeline"] = build_pipeline
        reruns: dict[str, int] = {}
        # queries that burned the whole re-run budget and STILL fail
        # the spread predicate — a genuinely bimodal row would land
        # here every round; the flag is persisted so it can be
        # investigated (or exempted) instead of silently re-run 4x
        # per bench forever.
        unsettled: list[str] = []
        for name in list(raw_runs):
            extra = 0
            while extra < MAX_RERUNS and _unsettled(
                raw_runs[name], prior_medians.get(name)
            ):
                one_run(name, builders[name])
                extra += 1
            if extra:
                print(
                    f"spread gate: {name} re-run x{extra}, runs "
                    f"{raw_runs[name]} -> median "
                    f"{_median(raw_runs[name]):.3f}",
                    flush=True,
                )
                reruns[name] = extra
                if _unsettled(raw_runs[name], prior_medians.get(name)):
                    unsettled.append(name)
                    print(
                        f"spread gate: {name} EXHAUSTED the re-run "
                        f"budget without settling (bimodal?) — "
                        f"flagged in BENCH_DETAIL.json",
                        flush=True,
                    )

    timings = {name: _median(runs) for name, runs in raw_runs.items()}
    total = round(sum(timings.values()), 3)
    # Full per-query detail: one dump to a repo file (the per-round
    # artifact tail-captures ~2000 chars of stdout, which >100 query
    # names cannot fit) plus an early stdout line for log readers.
    calibration = {n: timings[n] for n in CALIBRATION if n in timings}
    calib_total = round(sum(calibration.values()), 3)
    detail = {
        "metric": "takuan_spark full query suite, sec (noop sink, median)",
        "value": total,
        "unit": "sec",
        "repeats": REPEATS,
        "queries": timings,
        "runs": raw_runs,
        "reruns": reruns,
        "unsettled": unsettled,
        "spread_max": SPREAD_MAX,
        "calibration": calibration,
        "calibration_total": calib_total,
        "sf": sf_val,
    }
    with open(detail_path, "w") as fh:
        json.dump(detail, fh)
    print(json.dumps({k: v for k, v in detail.items() if k != "runs"}))
    # LAST line: the compact parseable summary, sized to survive the
    # driver's hard 2000-char tail capture. Self-contained at the
    # family grain: "families" is a COMPLETE rollup (every query is in
    # exactly one family), "slowest" the top individual offenders;
    # per-query medians + raw runs live in BENCH_DETAIL.json.
    families: dict[str, list[float]] = {}
    for name, sec in timings.items():
        fam = families.setdefault(_family(name), [0, 0.0])
        fam[0] += 1
        fam[1] = round(fam[1] + sec, 3)
    vals = sorted(timings.values())
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:12]
    )
    print(
        json.dumps(
            {
                "metric": "takuan_spark full query suite, sec (noop sink, median)",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "repeats": REPEATS,
                "n_queries": len(timings),
                "mean_sec": round(total / len(timings), 3),
                "p50_sec": round(vals[len(vals) // 2], 3),
                "p95_sec": round(vals[int(len(vals) * 0.95)], 3),
                "max_sec": vals[-1],
                "calib_sec": calib_total,
                "n_reruns": len(reruns),
                "families": families,
                "slowest": slowest,
                "detail": "BENCH_DETAIL.json",
            },
            separators=(",", ":"),
        )
    )
    # leave the host as we found it: the fixture scratch trees under
    # /tmp accumulate per (kind, sf_dir) across sessions otherwise
    # (the probe corpus is deliberately kept — see scratch.py).
    from takuan_spark.scratch import clean_scratch

    removed = clean_scratch()
    if removed:
        print(f"cleaned {len(removed)} scratch trees", file=sys.stderr)


if __name__ == "__main__":
    main()
