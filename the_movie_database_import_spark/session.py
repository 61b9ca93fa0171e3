"""SparkSession factory with scale-oriented defaults.

On a real cluster these settings arrive via spark-submit; local runs get the
same semantics on ``local[$SPARK_GRAFT_CPUS]``. AQE is enabled so that at
100 TB the runtime re-plans: coalesces small shuffle partitions, splits skewed
ones, and demotes/promotes join strategies based on observed sizes.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_APP_NAME = "the-movie-database-import-spark"


def get_spark(app_name: str = DEFAULT_APP_NAME) -> SparkSession:
    """Create (or reuse) a tuned SparkSession.

    Shuffle partitions default to the local core count; on a cluster this
    should be ~2-3x total executor cores (or left to AQE coalescing from a
    high initial value).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(max(int(cpus), 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "12g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    configure_session(spark)
    return spark


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs this engine depends on.

    Safe to call on an externally created session (e.g. the driver's):

    - UTC session timezone → deterministic timestamp arithmetic/windowing
      that matches naive-UTC semantics of parquet TIMESTAMP(ms/ns) columns.
    - ``nanosAsLong`` → Spark has no TIMESTAMP(NANOS) parquet reader; the
      ``events`` table stores ns timestamps, read as long and converted in
      :mod:`sources.readers`.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark
