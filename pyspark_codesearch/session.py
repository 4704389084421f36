"""SparkSession factory with scale-oriented defaults.

Defaults are tuned so the same code runs on local[N] here and would run on a
1000-executor cluster unchanged: AQE on (runtime re-plan + skew-join), Arrow
on (vectorized python boundary), shuffle partitions sized by parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pyspark-codesearch",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    if shuffle_partitions is None:
        # match parallelism on local mode; a real cluster would set this
        # to ~2-3x total cores (or rely on AQE coalescing, which is on).
        try:
            n = int(master.split("[")[1].rstrip("]").replace("*", str(os.cpu_count() or 8)))
        except (IndexError, ValueError):
            n = 32
        shuffle_partitions = max(n, 8)
    b = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 64k-row Arrow batches for the narrow posting/lens rows that
        # dominate the python boundary (measured -11% on the segment
        # encoder at 13.9M postings); memory for fat rows (media blobs)
        # stays bounded by Spark 4's maxBytesPerBatch default of 64 MB,
        # which caps a batch by bytes regardless of the record count.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # 16g default heap: local mode holds driver + all executor state
        # in ONE JVM, and the x128 bench corpus caches ~2-3 GB (docs +
        # postings + segments) next to shuffle execution memory — the
        # old 8g default predates that corpus and left the build GC-
        # bound in cold windows. Parameterised for smaller hosts.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
