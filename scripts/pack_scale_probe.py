"""Scale probe for sequence packing (T28).

20M synthetic docs generated ON the executors (deterministic token
counts via column arithmetic -- the packer only reads token counts, so
the probe synthesizes `text` as a repeated token run), packed into
2048-token windows across 256 shards.  Run at two parallelism levels
to pin that the layout is parallelism-independent (shard assignment
and in-shard order are both deterministic):

    SPARK_GRAFT_CPUS=8  python scripts/pack_scale_probe.py 20000000
    SPARK_GRAFT_CPUS=32 python scripts/pack_scale_probe.py 20000000

The only corpus-sized movement is one shuffle to shard-partition the
skinny (id, shard, n_tok) rows and one window sort per shard; at
10^12 docs the shard count scales with the cluster exactly like a
distributed writer's output-file count.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from pytrs_spark.operators.textops import pack_sequences
from pytrs_spark.session import tune_session


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    cpus = os.environ.get('SPARK_GRAFT_CPUS', '32')
    spark = (SparkSession.builder.master(f'local[{cpus}]')
             .config('spark.sql.shuffle.partitions', cpus)
             .config('spark.driver.memory', '16g')
             .getOrCreate())
    tune_session(spark)
    spark.sparkContext.setLogLevel('ERROR')
    # deterministic doc lengths 1..512 tokens (Weyl mix of the id);
    # the packer tokenizes text, so build a literal token run.
    k = F.col('id') + 1
    n_tok = ((k * 2654435761) % 512 + 1).cast('int')
    docs = spark.range(n).select(
        k.alias('doc_id'),
        F.rtrim(F.repeat(F.lit('tok '), n_tok)).alias('text'))

    t0 = time.time()
    out = pack_sequences(docs, 2048, n_shards=256)
    agg = out.agg(
        F.count(F.lit(1)).alias('spans'),
        F.countDistinct('shard', 'chunk_id').alias('windows'),
        F.sum('n_tok').alias('tokens'),
        F.bit_xor(F.xxhash64('shard', 'chunk_id', 'doc_id',
                             'begin_tok', 'end_tok')).alias('ck')
    ).collect()[0]
    wall = time.time() - t0
    print({'n_docs': n, 'cpus': cpus, 'wall_s': round(wall, 2),
           'docs_per_sec': round(n / wall),
           'tokens': agg['tokens'], 'windows': agg['windows'],
           'spans': agg['spans'], 'checksum': agg['ck']})
    spark.stop()


if __name__ == '__main__':
    main()
