"""Scale probe for zonal pixel statistics (G19, the raster half of
the Raptor raster+vector pattern).

N SGI1-encoded ramp images (deterministic pixels; 768/2304/9216 px
per image, ~4 KB decoded avg) are materialized ONCE into the shared
bench cache, then aggregated per synthetic tile: decode -> two-long
reduce inside the scan stage -> skinny id join -> tile-bounded agg.
Run at two cluster sizes (real executor JVMs, the bench.py
--scaling methodology) on the identical cached input to pin
throughput scaling of the decode-bound stage (the corpus-scaling
term at 10^12 images) and bit-identical results:

    SPARK_GRAFT_MASTER=local-cluster[1,1,5120] SPARK_GRAFT_CPUS=1 \
        python scripts/zonal_scale_probe.py 2000000
    SPARK_GRAFT_MASTER=local-cluster[4,1,5120] SPARK_GRAFT_CPUS=4 \
        python scripts/zonal_scale_probe.py 2000000

(thread-mode legs via SPARK_GRAFT_CPUS alone also work, subject to
the documented local[N] high-thread saturation on this host)

The probe reports decoded pixels/sec -- the binary column never
rides a shuffle (pinned by test_zonal_bytes_never_ride_a_shuffle),
so added cores pay linearly into the decode scan until the parquet
reader is IO-bound.
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pytrs_spark.raster import zonal_pixel_stats
from pytrs_spark.session import get_spark


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = os.environ.get('SPARK_GRAFT_CPUS', '32')
    runs = int(os.environ.get('BENCH_RUNS', '3'))
    # SPARK_GRAFT_MASTER (via get_spark) switches to real executor
    # JVMs, e.g. local-cluster[1,1,5120] vs local-cluster[4,1,5120]
    # -- the same N-vs-4N methodology as bench.py --scaling.  The
    # synthetic ramp blobs zlib-compress ~1000x smaller than real
    # image bytes, so cap split size way below the default or the
    # whole table packs into 1-2 scan tasks and the probe measures a
    # single core.
    spark = get_spark('zonal-scale-probe', cores=int(cpus),
                      extra_conf={
                          'spark.sql.files.maxPartitionBytes': 1 << 19,
                          'spark.sql.files.openCostInBytes': 0,
                      })
    spark.sparkContext.setLogLevel('ERROR')

    import bench
    images = bench._prepare_ramp_images(spark, n)
    assigned = images.select(
        'image_id',
        F.format_string('t%04d',
                        (F.col('image_id') % 4096).cast('int'))
        .alias('trs'),
        F.element_at(F.array(F.lit('NE'), F.lit('NW'), F.lit('SE'),
                             F.lit('SW')),
                     ((F.col('image_id') / 4096) % 4).cast('int') + 1)
        .alias('qq'))

    walls, agg = [], None
    for _ in range(runs + 1):           # first run untimed (warm-up)
        t0 = time.time()
        agg = zonal_pixel_stats(assigned, images).agg(
            F.count(F.lit(1)).alias('tiles'),
            F.sum('n_images').alias('images'),
            F.sum('n_px').alias('px'),
            F.sum('px_sum').alias('px_sum')).collect()[0]
        walls.append(time.time() - t0)
    wall = statistics.median(walls[1:])
    print({'n_images': n, 'cpus': cpus, 'runs': runs,
           'wall_s': round(wall, 2),
           'images_per_sec': round(n / wall),
           'px_per_sec': round(agg['px'] / wall),
           'tiles': agg['tiles'], 'px': agg['px'],
           'px_sum': agg['px_sum']})
    spark.stop()


if __name__ == '__main__':
    main()
