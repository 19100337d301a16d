"""S6 Iceberg path: real write/read/append when the runtime jar is on
the classpath; clean skip (with the parquet fallback still asserted)
otherwise.  On a cluster, run pytest under the spark-submit config in
pytrs_spark/iceberg.py to prove the live path."""

import pytest
from pyspark.sql import functions as F

from pytrs_spark import iceberg


def test_format_detection_and_fallback(spark):
    fmt = iceberg.table_format(spark)
    assert fmt in ('iceberg', 'parquet')
    if not iceberg.iceberg_available(spark):
        assert fmt == 'parquet'   # documented sandbox stand-in


def test_write_read_roundtrip(spark, tmp_path):
    """Round-trips through whichever format is active; under the
    Iceberg runtime this is a real Iceberg table write."""
    df = spark.range(100).select(
        F.concat(F.lit('img'), F.col('id')).alias('image_id'),
        (F.col('id') % 7).alias('bucket'))
    path = str(tmp_path / 'tbl')
    fmt = iceberg.write_table(df, path, partition_by=['bucket'])
    back = iceberg.read_table(spark, path)
    assert back.count() == 100
    assert fmt == iceberg.table_format(spark)


@pytest.mark.skipif(
    'not config.getoption("--iceberg", default=False)',
    reason='needs the Iceberg runtime jar (see pytrs_spark/iceberg.py '
           'for the spark-submit config); run pytest --iceberg there')
def test_real_iceberg_snapshot_semantics(spark, tmp_path):
    """Only meaningful under the real runtime: appends create
    snapshots, reads see the merged table."""
    assert iceberg.iceberg_available(spark)
    df = spark.range(10).select(F.col('id').alias('v'))
    path = str(tmp_path / 'iceberg_tbl')
    iceberg.write_table(df, path)
    iceberg.write_table(df, path, mode='append')
    assert iceberg.read_table(spark, path).count() == 20
