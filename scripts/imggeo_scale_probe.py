"""Scale probe for the image-geometry training-pipeline stages:
T33 aspect bucketing -> T34 patch packing over the SAME synthetic
image table (the two stages a large image-training pipeline runs
between ingest and the loader).

Run at 1 vs 4 REAL executor JVMs (the bench --scaling methodology)
to evidence the north rule's two-cluster-size criterion on these
operators:

    SPARK_GRAFT_MASTER=local-cluster[1,1,5120] SPARK_GRAFT_CPUS=1 \
        python scripts/imggeo_scale_probe.py 50000000
    SPARK_GRAFT_MASTER=local-cluster[4,1,5120] SPARK_GRAFT_CPUS=4 \
        python scripts/imggeo_scale_probe.py 50000000

Both stages synthesize (image_id, w, h) ON the executors (geometry
ops never touch bytes; the blob column would be pruned at the scan
anyway).  Bucket choice + resize arithmetic are scan-stage codegen;
the only exchanges are the (bucket, shard) batch window and the
per-shard packing prefix-sum -- shard counts are the parallelism
unit, so the layout is identical at every cluster size (checksums
pin it).
"""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pytrs_spark.operators.imageops import aspect_bucket, pack_patches
from pytrs_spark.session import get_spark


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    cpus = os.environ.get('SPARK_GRAFT_CPUS', '32')
    runs = int(os.environ.get('BENCH_RUNS', '3'))
    spark = get_spark('imggeo-scale-probe', cores=int(cpus))
    spark.sparkContext.setLogLevel('ERROR')

    imgs = spark.range(n).select(
        F.col('id').alias('image_id'),
        (64 + (F.col('id') * 7919) % 1985).alias('w'),
        (64 + (F.col('id') * 104729) % 1985).alias('h'))

    def leg_bucket():
        return aspect_bucket(imgs, batch_size=64, n_shards=256).agg(
            F.count(F.lit(1)).alias('rows'),
            F.bit_xor(F.xxhash64('image_id', 'bucket_id', 'resize_w',
                                 'resize_h', 'crop_x', 'crop_y',
                                 'batch_id', 'pos_in_batch'))
            .alias('ck')).collect()[0]

    def leg_pack():
        # NO countDistinct here: it would add a second corpus-wide
        # expand+shuffle that dwarfs the operator itself (measured:
        # flat 16 s across 4 vs 16 cores WITH it, 4x scaling without).
        # max(seq_id) per shard pins the same layout via the checksum.
        return pack_patches(imgs, budget=8192, patch=32,
                            n_shards=256).agg(
            F.count(F.lit(1)).alias('rows'),
            F.max('seq_id').alias('max_seq'),
            F.sum('n_tok').alias('tokens'),
            F.bit_xor(F.xxhash64('image_id', 'shard', 'seq_id',
                                 'tok_offset')).alias('ck')
        ).collect()[0]

    out = {'n_images': n, 'cpus': cpus, 'runs': runs}
    for name, leg in (('aspect', leg_bucket), ('pack', leg_pack)):
        walls, agg = [], None
        for _ in range(runs + 1):      # first run untimed (warm-up)
            t0 = time.time()
            agg = leg()
            walls.append(time.time() - t0)
        wall = statistics.median(walls[1:])
        out[f'{name}_wall_s'] = round(wall, 2)
        out[f'{name}_images_per_sec'] = round(n / wall)
        out[f'{name}_checksum'] = agg['ck']
        if name == 'pack':
            out['pack_max_seq'] = agg['max_seq']
            out['pack_tokens'] = agg['tokens']
    print(out)
    spark.stop()


if __name__ == '__main__':
    main()
