"""SparkSession factory tuned for this engine.

Defaults are chosen for the local[*] test harness but every knob is the
one you would also set on a real cluster: AQE on (runtime re-planning,
skew-join splitting, partition coalescing), Arrow on (vectorized
pandas-UDF exchange), and a shuffle-partition count that tracks core
count locally instead of Spark's static 200.

At 100 TB the same plans run unchanged; only ``spark.sql.shuffle.partitions``
(or rather AQE's ``advisoryPartitionSizeInBytes``) and executor sizing move.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "takuan-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    AQE handles runtime partition coalescing and skew joins, so the static
    ``shuffle.partitions`` only needs to be a sane upper bound (~cores
    locally; thousands on a real cluster).
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    shuffle_partitions = shuffle_partitions or DEFAULT_CPUS
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Let the planner pick shuffled-hash join when one side's
        # per-partition build fits in memory, and let AQE convert
        # sort-merge to shuffled-hash at runtime when every post-shuffle
        # partition is under 128 MB: drops the per-side sorts (measured
        # ns_boilerplate_strip 4 SortMergeJoin -> 4 ShuffledHashJoin,
        # ~6% off the join-heavy panel; CPU x rows saved scales with
        # data). Equal-size-side joins still plan as sort-merge; AQE
        # skew splitting bounds the build-side partitions either way.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            str(128 * 1024 * 1024),
        )
        # Whole-stage codegen is silently DISABLED for any stage whose
        # subtree carries more than maxFields (default 100) fields, and
        # the MinHash signature aggregate (64 min() buffers + keys)
        # plus every sketch panel sits right over that line — measured
        # 5.1 s -> 2.9 s on the sf0.1 signature build once codegen
        # applies. Pure CPU-per-row win: the same fallback costs
        # proportionally more at 100 TB. 500 keeps a hard ceiling so a
        # pathological 10k-column plan still falls back instead of
        # compiling forever.
        .config("spark.sql.codegen.maxFields", "500")
        # Split even small text/csv/json files across all slots at the
        # SCAN (no shuffle): a single 10 MB log file is otherwise one
        # split, serializing the regex-parse hot path on one core. On
        # big inputs maxPartitionBytes governs and this is a no-op.
        .config("spark.sql.files.minPartitionNum", str(DEFAULT_CPUS))
        # minPartitionNum is advisory: openCostInBytes (default 4 MB)
        # floors the split size, capping a 2x9 MB log pair at 6 splits.
        # 512 KB keeps regex-parse-heavy text scans wide without
        # meaningfully over-splitting large files.
        .config("spark.sql.files.openCostInBytes", str(512 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
