"""SparkSession factory with the engine's recommended scale settings.

Everything here is plain configuration — safe on a laptop, intended for a
1000-executor cluster:

* AQE on (runtime coalescing + skew-join splitting),
* Arrow transport for all pandas UDF stages (the matcher is Arrow-batched),
* bounded Arrow batch sizes so one batch of 100-token sentences stays well
  inside executor memory,
* shuffle partitions sized by env (clusters override via spark-submit).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "odinson-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_SHUFFLE_PARTITIONS", str(max(int(cpus) if cpus.isdigit() else 32, 32)))
    )
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        # small single-split files still fan out to one task per core at the
        # SCAN (no repartition shuffle; filters stay scan-side). On a real
        # corpus with thousands of splits this is a no-op.
        .config(
            "spark.sql.files.minPartitionNum",
            str(int(cpus) if cpus.isdigit() else 32),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
