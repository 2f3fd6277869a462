"""SparkSession factory tuned for this engine.

The reference boots a GlueContext (``/root/reference/glue_jobs/
01_silver_delta_upsert.py:16-25``); here the equivalent is a plain
SparkSession with scale-minded defaults:

- AQE on (runtime coalescing, skew-join splitting) — at 100 TB the
  static shuffle-partition count is always wrong somewhere.
- ``spark.sql.shuffle.partitions`` sized to the local core count for
  tests; a real cluster overrides via ``extra_conf``.
- Arrow on (Pandas-UDF slow path is batch-transferred, not pickled).
- UTC session timezone so timestamp semantics match the DuckDB oracle.
- dynamic partition-overwrite, mirroring
  ``01_silver_delta_upsert.py:25``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "aws_callcenter_delta_lakehouse_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the tuned SparkSession."""
    cpus = int(DEFAULT_CPUS)
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # testdata parquet stores TIMESTAMP(NANOS); Spark has no nanos type,
        # so read as long and let the catalog truncate to microseconds
        # (matches DuckDB's CAST(ts AS TIMESTAMP) ns->us truncation).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Split parquet scans at 8 MB (default 128 MB): CPU-dense
        # projections (gram hashing, winnowing, vector math) over a
        # single small file otherwise run as ONE task and serialize a
        # 32-core box. On a real cluster with many multi-hundred-MB
        # files this only adds split metadata; openCostInBytes still
        # packs genuinely tiny files together.
        .config("spark.sql.files.maxPartitionBytes", "8m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
