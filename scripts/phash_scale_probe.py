"""Scale probe for the perceptual-hash image near-dup join (G16,
``textops.hamming_near_dup_pairs``) on executor-generated phashes.

    PYTHONPATH=/root/repo python scripts/phash_scale_probe.py [n_images] [n_blocks]

``n_blocks`` pins the Manku table layout (3 = the legacy
single-block k+1 split at max_hamming=2); omit it for the
key-count-calibrated auto pick.

The corpus is the bench's ``phash_near_dup_10m`` shape at any size:
62-bit deterministic fingerprints from pure column arithmetic (no
driver materialization, identical at any parallelism), with 1-in-50
planted twins exactly 2 bits away -- so besides wall + images/sec the
probe can CHECK the output: every planted (id, id+1) pair must be
found at hamming=2 (the pigeonhole band join is exact-recall), and
the order-independent pair checksum must be bit-identical across
parallelism levels.  Run at two ``SPARK_GRAFT_CPUS`` levels to pin
parallelism-independence + throughput (results in BENCH.md).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from pytrs_spark.operators import textops
from pytrs_spark.session import tune_session


def gen_phashes(spark, n: int):
    """Bench-identical corpus (bench.py's G16 stage): Weyl-mixed
    62-bit hashes; rows with ``id % 50 == 0`` carry their neighbor's
    hash with 2 bits flipped, so (id, id+1) is a guaranteed
    Hamming-2 pair."""
    n31 = F.lit(2147483648)

    def ph62(k):
        return (k * 2654435761) % n31 * n31 + (k * 1597334677) % n31

    return spark.range(n).select(
        F.col('id').alias('image_id'),
        F.when(F.col('id') % 50 == 0,
               ph62(F.col('id') + 1).bitwiseXOR(F.lit(5)))
        .otherwise(ph62(F.col('id'))).alias('phash'))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    n_blocks = int(sys.argv[2]) if len(sys.argv) > 2 else None
    cpus = os.environ.get('SPARK_GRAFT_CPUS', '32')
    spark = (SparkSession.builder.master(f'local[{cpus}]')
             .config('spark.sql.shuffle.partitions', cpus)
             .config('spark.driver.memory', '24g')
             .getOrCreate())
    tune_session(spark)
    spark.sparkContext.setLogLevel('ERROR')
    ph = gen_phashes(spark, n).persist()
    ph.count()

    t0 = time.time()
    pairs = textops.hamming_near_dup_pairs(
        ph, id_col='image_id', hash_col='phash', max_hamming=2,
        n_blocks=n_blocks)
    agg = pairs.agg(
        F.count('*').alias('n_pairs'),
        F.sum(F.when((F.col('hamming') == 2)
                     & (F.col('id_a') % 50 == 0)
                     & (F.col('id_b') == F.col('id_a') + 1), 1)
              .otherwise(0)).alias('n_planted_found'),
        F.bit_xor(F.xxhash64('id_a', 'id_b', 'hamming')).alias('ck')
    ).collect()[0]
    wall = time.time() - t0

    n_planted = (n + 49) // 50
    assert agg['n_planted_found'] == n_planted, (
        'exact-recall violation: planted %d, found %d'
        % (n_planted, agg['n_planted_found']))
    print({'n_images': n, 'cpus': cpus, 'n_blocks': n_blocks or 'auto',
           'wall_s': round(wall, 2),
           'images_per_sec': round(n / wall),
           'n_pairs': agg['n_pairs'], 'n_planted': n_planted,
           'n_planted_found': agg['n_planted_found'],
           'checksum': agg['ck']})
    spark.stop()


if __name__ == '__main__':
    main()
