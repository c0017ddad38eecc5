"""SparkSession factory with the engine's required configuration.

The reference pins UTC sessions and Arrow transfers
(spark_offline_store/tests/data_source.py:33-40,
infra/compute_engines/spark/utils.py:26); we do the same, plus AQE for
runtime re-planning (skew joins, partition coalescing) which is the
scale-path backstop for hot-key skew.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "feast_spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a local SparkSession configured for the engine.

    ``parallelism`` maps to ``local[N]``; default comes from
    ``$SPARK_GRAFT_CPUS`` (driver contract) or all cores. Shuffle
    partitions default to the same N so local runs don't pay for 200
    empty reducers; a real cluster deployment would size this to
    ~2-3x total executor cores and rely on AQE coalescing.
    """
    cpus = parallelism or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    shuffle = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # The engine targets ANSI-off arithmetic (wrap-around hash math in
        # fingerprinting; DuckDB-oracle parity uses explicit pmod instead).
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.driver.memory", os.environ.get("FEAST_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
