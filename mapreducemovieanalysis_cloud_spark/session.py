"""SparkSession factory with scale-oriented defaults.

The reference tunes parallelism by hand-setting per-job reducer counts from the
CLI (``MovieRank.java:174-177,200-203``). Here the equivalent knobs are set
once, engine-wide, and AQE re-plans at runtime: shuffle-partition coalescing,
skew-join splitting, and dynamic broadcast-join conversion replace manual
reducer math at any scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Defaults sized for the local[32] test harness; on a real cluster these are
# expected to be overridden via spark-submit conf (they are only applied when
# the session is created by this factory).
_DEFAULTS = {
    # AQE: runtime re-planning — coalesce small shuffle partitions, split skewed
    # ones, convert sort-merge joins to broadcast when the built side turns out
    # small. This is the scale story for 100 TB: static partition counts are
    # always wrong at some stage of a deep plan.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Partial-agg pushdown through shuffle (the reference's disabled combiner,
    # MovieRank.java:80-95, always-on in Spark).
    "spark.sql.adaptive.optimizeSkewsInRebalancePartitions.enabled": "true",
    # Arrow for every pandas_udf / toPandas boundary.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Deterministic timestamp semantics regardless of host TZ: the synthetic
    # parquet stores naive timestamps; treat them as UTC everywhere.
    "spark.sql.session.timeZone": "UTC",
    # Parquet pushdown (on by default; pinned so .explain checks are stable).
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
    # Runtime join pruning (on by default in Spark 4; pinned): bloom-filter
    # semi-join reduction injects a filter on the probe side of large joins,
    # and dynamic partition pruning skips fact partitions a dim filter
    # excludes — both are scan-volume levers at 100 TB.
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    "spark.sql.optimizer.dynamicPartitionPruning.enabled": "true",
}


def get_session(
    app_name: str = "mapreducemovieanalysis-cloud-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a cluster,
    leave it unset and let spark-submit decide. ``shuffle_partitions`` defaults
    to the local core count — on a real cluster AQE coalescing makes the exact
    number non-critical as long as it is >= total executor cores.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = SparkSession.builder.appName(app_name)
    builder = builder.master(master or f"local[{cpus}]")
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions or cpus)
    conf["spark.driver.memory"] = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
