"""SparkSession factory tuned for this engine.

Local-mode defaults follow the driver harness (local[32], 128 GiB host).
At cluster scale the same builder works — only master/memory change; the
SQL-conf choices (AQE, shuffle partitions, UTC, Arrow) are scale-portable.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "index_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    - AQE on: runtime coalescing of small shuffle partitions and skew-join
      splitting — the scale path for 100 TB inputs where static partition
      counts are always wrong somewhere.
    - ``spark.sql.shuffle.partitions`` ~ cores locally; on a real cluster
      AQE's coalescing makes the initial number far less sensitive.
    - UTC session timezone: parquet timestamps compare identically across
      engines (DuckDB oracle parity).
    - Arrow enabled: pandas interchange + Pandas UDFs use Arrow batches.
    """
    # Python workers must be able to import this package even when the
    # driver process runs outside the repo (PYTHONPATH propagates to the
    # worker daemon via the JVM environment — must be set pre-launch).
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # entry-wise compare, not substring: PYTHONPATH=/root/repo-tools must
    # not be mistaken for containing /root/repo
    entries = os.environ.get("PYTHONPATH", "").split(os.pathsep)
    if repo_root not in entries:
        os.environ["PYTHONPATH"] = repo_root + os.pathsep + os.environ.get("PYTHONPATH", "")

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    master = master or f"local[{cpus}]"
    shuffle = shuffle_partitions if shuffle_partitions is not None else cpus
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # saveAsTable (bucketed layouts) must never litter the caller's cwd
        # with a spark-warehouse dir; default catalog is in-memory anyway.
        .config("spark.sql.warehouse.dir", os.path.join(tempfile.gettempdir(), "index_spark_warehouse"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
