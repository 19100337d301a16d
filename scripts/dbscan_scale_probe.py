"""Scale probe for grid DBSCAN (G18).

Builds the bench's clustered-plus-background point cloud ON the
executors (64 lattice blobs + 10% uniform background, deterministic
column arithmetic, no driver materialization), runs `dbscan` at the
requested point count and parallelism, and reports wall time,
throughput, role counts, and an order-independent (id, cluster, role)
checksum — run it at two parallelism levels to pin that the labeling
is parallelism-independent (min-label components + min-cluster border
attach have no tie-breaks to race):

    SPARK_GRAFT_CPUS=8  python scripts/dbscan_scale_probe.py 2000000
    SPARK_GRAFT_CPUS=32 python scripts/dbscan_scale_probe.py 2000000

Density scales with N inside the fixed lattice extent, so eps shrinks
~1/sqrt(N) to keep the eps-ball occupancy (and therefore the pair
stream per point) roughly constant — the shape a tuned production run
has.  The only corpus-sized shuffles are the (id, cell) equi-join and
the neighbor count; component rounds run over core-core edges only.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from pytrs_spark import datagen
from pytrs_spark.session import tune_session
from pytrs_spark.spatial.dbscan import dbscan


def build_points(spark, n: int):
    """Shared deterministic blob corpus (``datagen.gen_blob_points``
    -- the SAME definition the bench's dbscan_200k stage uses)."""
    return datagen.gen_blob_points(spark, n)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = os.environ.get('SPARK_GRAFT_CPUS', '32')
    # keep ~constant eps-ball occupancy as N grows (calibrated so the
    # 200k bench point uses its measured-good eps=0.12)
    eps = 0.12 * (200_000 / n) ** 0.5
    spark = (SparkSession.builder.master(f'local[{cpus}]')
             .config('spark.sql.shuffle.partitions', cpus)
             .config('spark.driver.memory', '16g')
             .getOrCreate())
    tune_session(spark)
    spark.sparkContext.setLogLevel('ERROR')
    pts = build_points(spark, n).persist()
    pts.count()

    t0 = time.time()
    out = dbscan(pts, eps=eps, min_pts=4, res=9)
    agg = out.agg(
        F.count('*').alias('n'),
        F.countDistinct('cluster_id').alias('n_clusters'),
        F.sum(F.when(F.col('role') == 'core', 1).otherwise(0))
        .alias('n_core'),
        F.sum(F.when(F.col('role') == 'border', 1).otherwise(0))
        .alias('n_border'),
        F.sum(F.when(F.col('role') == 'noise', 1).otherwise(0))
        .alias('n_noise'),
        F.bit_xor(F.xxhash64('id', 'cluster_id', 'role')).alias('ck')
    ).collect()[0]
    wall = time.time() - t0
    print({'n_points': n, 'cpus': cpus, 'eps': round(eps, 5),
           'wall_s': round(wall, 2), 'pts_per_sec': round(n / wall),
           'n_clusters': agg['n_clusters'], 'n_core': agg['n_core'],
           'n_border': agg['n_border'], 'n_noise': agg['n_noise'],
           'checksum': agg['ck']})
    spark.stop()


if __name__ == '__main__':
    main()
