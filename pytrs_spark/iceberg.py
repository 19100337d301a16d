"""S6: Iceberg table source/sink behind a runtime-detect guard.

The north rule mandates Iceberg tables for the image+caption corpus.
This sandbox has no Iceberg runtime jar, so every table API in this
engine is format-agnostic (``lineage.LINEAGE_FORMAT``); this module is
the explicit Iceberg switch: it detects the runtime, applies it when
present, and documents the exact spark-submit configuration that
enables it on a real cluster.

Enable on a cluster::

    spark-submit \\
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:1.10.0 \\
      --conf spark.sql.extensions=org.apache.iceberg.spark.extensions.\\
IcebergSparkSessionExtensions \\
      --conf spark.sql.catalog.local=org.apache.iceberg.spark.SparkCatalog \\
      --conf spark.sql.catalog.local.type=hadoop \\
      --conf spark.sql.catalog.local.warehouse=/warehouse \\
      --py-files dist/pytrs_spark.zip job.py

(Path-based Hadoop tables -- ``format('iceberg').save(path)`` -- also
work without a named catalog once the runtime jar is on the
classpath.)

``tests/test_iceberg.py`` exercises the real write/read/append path
whenever the runtime is detected and skips cleanly otherwise, so CI
with the jar present proves the path.

Vendoring the jar into this sandbox was attempted and is impossible
(verified 2026-08-17): the Spark distributions at /opt/spark and the
PyPI pyspark wheel ship no Iceberg/Delta/Hudi jars, there is no local
ivy/maven cache, and the sandbox has no network egress (DNS resolution
for repo1.maven.org fails; HTTPS connect returns no route).  The
parquet fallback plus this runtime gate is therefore the maximum
provable surface here; the gated branch is the exact documented
config above.
"""

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the JVM classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            'org.apache.iceberg.spark.SparkCatalog')
        return True
    except Exception:  # noqa: BLE001 - Class.forName raises through py4j
        return False


def table_format(spark: SparkSession) -> str:
    """'iceberg' when the runtime is present, else the parquet
    fallback (documented sandbox stand-in)."""
    return 'iceberg' if iceberg_available(spark) else 'parquet'


def use_iceberg_everywhere(spark: SparkSession) -> str:
    """Point the engine's format-agnostic table layer (lineage,
    checkpointed outputs) at Iceberg when available.  Returns the
    format chosen."""
    from . import lineage
    fmt = table_format(spark)
    lineage.LINEAGE_FORMAT = fmt
    return fmt


def write_table(df: DataFrame, path: str, mode: str = 'overwrite',
                partition_by=None) -> str:
    """Write ``df`` as an Iceberg table at ``path`` when the runtime is
    present (path-based Hadoop table), else parquet.  Returns the
    format used."""
    fmt = table_format(df.sparkSession)
    w = df.write.format(fmt).mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(path)
    return fmt


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.format(table_format(spark)).load(path)
