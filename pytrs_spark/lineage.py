"""G10: per-partition lineage + metrics checkpoints, resumable runs
(SURVEY.md §2.7; north rule: "resumable from checkpoint with
per-partition lineage + metrics").

The unit of work is a *bucket*: ``pmod(xxhash64(image_id), n_buckets)``
-- stable under any physical partitioning, so a resumed run sees the
identical work split regardless of cluster size.  For each bucket:

1. process only that bucket's rows (pushed-down filter on the stable
   hash -- no global shuffle),
2. write its output to ``<output>/bucket=<i>/`` (dynamic overwrite:
   idempotent if the job died between output write and lineage append),
3. append one lineage row ``(bucket, n_in, n_out, wall_s, checksum,
   run_id)`` to the lineage table.

Resume = anti-join pending buckets against the lineage table's
finished bucket ids.  The lineage append is the commit point: output
written but lineage missing -> bucket reruns and overwrites (exactly-
once output, at-least-once compute).

Physical tables are parquet here (no Iceberg runtime in this sandbox);
on a cluster with the Iceberg runtime jar the same calls target
``format("iceberg")`` -- the write/read API below is format-agnostic
via ``LINEAGE_FORMAT``.
"""

import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

LINEAGE_FORMAT = 'parquet'

_LINEAGE_SCHEMA = ('bucket int, n_in long, n_out long, wall_s double, '
                   'checksum long, run_id string, finished_at double')


def bucket_of(id_col, n_buckets: int):
    """Stable work-split key (independent of physical partitioning)."""
    return F.pmod(F.xxhash64(id_col), F.lit(n_buckets)).cast('int')


def finished_buckets(spark: SparkSession, lineage_path: str) -> set:
    try:
        rows = spark.read.format(LINEAGE_FORMAT).load(lineage_path) \
            .select('bucket').distinct().collect()
    except Exception:  # noqa: BLE001 - first run: no lineage table yet
        return set()
    return {r['bucket'] for r in rows}


def run_checkpointed(spark: SparkSession, source: DataFrame,
                     process, output_path: str, lineage_path: str,
                     id_col: str = 'image_id', n_buckets: int = 16,
                     run_id: str = 'run', fail_after: int = None) -> int:
    """Process ``source`` bucket-by-bucket with lineage checkpoints.

    ``process``: DataFrame -> DataFrame (applied per bucket; its output
    must contain ``id_col``).  Returns the number of buckets processed
    in THIS invocation (0 on a fully-caught-up resume).  ``fail_after``
    aborts after k buckets (test hook for the resume path).
    """
    done = finished_buckets(spark, lineage_path)
    src = source.withColumn('_bucket', bucket_of(F.col(id_col), n_buckets))
    processed = 0
    for b in range(n_buckets):
        if b in done:
            continue
        t0 = time.time()
        part = src.filter(F.col('_bucket') == b).drop('_bucket')
        n_in = part.count()
        out = process(part)
        out.write.mode('overwrite') \
            .format(LINEAGE_FORMAT).save(f'{output_path}/bucket={b}')
        written = spark.read.format(LINEAGE_FORMAT) \
            .load(f'{output_path}/bucket={b}')
        # bit_xor: order-independent and overflow-free under ANSI mode
        # (sum of hashes overflows long).
        agg = written.agg(
            F.count('*').alias('n'),
            F.coalesce(F.bit_xor(F.xxhash64(id_col)), F.lit(0)).alias('ck')
        ).first()
        row = spark.createDataFrame(
            [(b, n_in, agg['n'], round(time.time() - t0, 3),
              agg['ck'], run_id, time.time())], _LINEAGE_SCHEMA)
        row.write.mode('append').format(LINEAGE_FORMAT).save(lineage_path)
        processed += 1
        if fail_after is not None and processed >= fail_after:
            raise RuntimeError(f'injected failure after {processed} buckets')
    return processed


def load_output(spark: SparkSession, output_path: str) -> DataFrame:
    return spark.read.format(LINEAGE_FORMAT).load(output_path)


def lineage_metrics(spark: SparkSession, lineage_path: str) -> DataFrame:
    return spark.read.format(LINEAGE_FORMAT).load(lineage_path)
