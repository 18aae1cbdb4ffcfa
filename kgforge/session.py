"""SparkSession factory with scale-oriented defaults.

Defaults chosen for a 100 TB / 1000-executor deployment and scaled down for
the local[32] sandbox:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing).
- Arrow transport on for every pandas UDF boundary (per-row Python is banned
  by the contract, BASELINE.json input_hint).
- UTC session timezone so timestamp semantics match the DuckDB oracle.
- shuffle.partitions sized to cores locally; on a real cluster this is
  overridden by AQE coalescing + `spark.sql.adaptive.coalescePartitions`.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    master: str | None = None,
    app_name: str = "kgforge",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with kgforge defaults.

    ``master=None`` defers to an existing session / spark-submit config so the
    same code runs under ``spark-submit --py-files`` on a real cluster.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    sp = shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS
    conf = {
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.shuffle.partitions": str(sp),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
        # Broadcast threshold: dictionary tables are a few MB; keep default 10MB
        # but make intent explicit (we also force with F.broadcast where the
        # contract names the algorithm).
        "spark.sql.autoBroadcastJoinThreshold": str(32 * 1024 * 1024),
        "spark.ui.enabled": "false",
        "spark.driver.memory": os.environ.get("KGFORGE_DRIVER_MEM", "8g"),
    }
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
