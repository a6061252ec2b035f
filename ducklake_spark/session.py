"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` (one JVM); the configs below are
chosen to also be the right defaults on a real cluster: AQE on
(runtime re-planning, skew-join splitting, partition coalescing),
shuffle partitions sized explicitly rather than the 200 default,
Arrow enabled for the Pandas-UDF slow path, UTC session time zone so
results are oracle-comparable.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# parquet modular-encryption factory (java/ducklake/DuckLakeCrypto.java,
# prebuilt): must be on the JVM classpath at startup for ENCRYPTED lakes
_CRYPTO_JAR = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "jars", "ducklake-crypto.jar"
)


def get_spark(app_name: str = "ducklake_spark", cpus: int | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-appropriate defaults."""
    cpus = cpus or DEFAULT_CPUS
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.fieldId.write.enabled", "true")
        .config("spark.sql.parquet.fieldId.read.enabled", "true")
        .config("spark.sql.parquet.fieldId.read.ignoreMissing", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if os.path.exists(_CRYPTO_JAR):
        builder = builder.config(
            "spark.driver.extraClassPath", _CRYPTO_JAR
        ).config("spark.executor.extraClassPath", _CRYPTO_JAR)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
