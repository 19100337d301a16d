"""Scale probe for ExactSubstr dedup spans (T37).

Synthetic corpus generated ON the executors: every doc carries ~100
chars of id-derived unique filler (six independent multiplier mixes,
no internal repeats), and 1-in-10 docs append one of 1,000 shared
~60-char pool phrases -- so the duplicated-window mass is ~2% of the
corpus and the probe exercises exactly the claimed scale shape
(pass-1 clipped-distinct count shuffle, broadcast duplicated-hash
set, island shuffle bounded by duplication mass, never corpus size).

Run at two cluster sizes (real executor JVMs, the bench.py
--scaling methodology) on the SAME input; the span checksum must
match (layout independence) and throughput should scale:

    SPARK_GRAFT_MASTER=local-cluster[1,1,5120] SPARK_GRAFT_EXECUTOR_MEM=4g \
        SPARK_GRAFT_CPUS=1 python scripts/substr_scale_probe.py 1000000
    SPARK_GRAFT_MASTER=local-cluster[4,1,5120] SPARK_GRAFT_EXECUTOR_MEM=4g \
        SPARK_GRAFT_CPUS=4 python scripts/substr_scale_probe.py 1000000

1M docs is the sweet spot for the executor legs: big enough to
amortize the 8-stage fixed cost on the 4-exec leg, small enough
that the 1-exec leg's 280M-window groupBy doesn't spill in a 4 GB
heap (at 2M docs the 1-exec leg loses ~45% throughput to shuffle
spill, which would fake a >1.0 efficiency).  Thread-mode legs via
SPARK_GRAFT_CPUS alone also work, subject to the documented
local[N] high-thread saturation on this host.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pytrs_spark.operators.textops import exact_substr_spans
from pytrs_spark.session import get_spark


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    cpus = os.environ.get('SPARK_GRAFT_CPUS', '32')
    spark = get_spark('substr-scale-probe', cores=int(cpus))
    spark.sparkContext.setLogLevel('ERROR')

    k = F.col('id') + 1
    seg = [((k * m) % 999_999_937).cast('string')
           for m in (2654435761, 1597334677, 2246822519,
                     3266489917, 668265263, 374761393)]
    filler = F.concat(
        F.lit('a'), seg[0], F.lit(' b'), seg[1], F.lit(' c'), seg[2],
        F.lit(' d'), seg[3], F.lit(' e'), seg[4], F.lit(' f'), seg[5])
    phrase = F.concat(
        F.lit(' shared pool phrase number '),
        (k % 1000).cast('string'),
        F.lit(' lorem ipsum dolor sit amet consectetur adipiscing'))
    docs = spark.range(n).select(
        k.alias('doc_id'),
        F.when(k % 10 == 0, F.concat(filler, phrase))
        .otherwise(filler).alias('text'))

    def run():
        return exact_substr_spans(docs, window=40).agg(
            F.count(F.lit(1)).alias('spans'),
            F.sum('dup_len').alias('dup_chars'),
            F.bit_xor(F.xxhash64('doc_id', 'span_begin', 'span_end'))
            .alias('ck')).collect()[0]

    # Untimed warm-up (same methodology as bench.py's _median_time):
    # the first window-stream pass in a fresh session pays one-time
    # Python-worker module import + allocator warm-up, measured 4-5x
    # the steady state.
    run()
    walls = []
    agg = None
    for _ in range(2):
        t0 = time.time()
        agg = run()
        walls.append(time.time() - t0)
    wall = min(walls)
    print({'n_docs': n, 'cpus': cpus, 'wall_s': round(wall, 2),
           'docs_per_sec': round(n / wall),
           'spans': agg['spans'], 'dup_chars': agg['dup_chars'],
           'checksum': agg['ck']})

    # Removal half (exact_substr_trim): same span derivation + the
    # native-HOF splice with span lists broadcast back onto the scan.
    from pytrs_spark.operators.textops import exact_substr_trim

    def run_trim():
        return exact_substr_trim(docs, window=40).agg(
            F.count(F.lit(1)).alias('rows'),
            F.sum('chars_removed').alias('removed'),
            F.bit_xor(F.xxhash64('doc_id', 'text_kept'))
            .alias('ck')).collect()[0]

    run_trim()
    t_walls = []
    tagg = None
    for _ in range(2):
        t0 = time.time()
        tagg = run_trim()
        t_walls.append(time.time() - t0)
    t_wall = min(t_walls)
    print({'trim_wall_s': round(t_wall, 2),
           'trim_docs_per_sec': round(n / t_wall),
           'rows': tagg['rows'], 'chars_removed': tagg['removed'],
           'trim_checksum': tagg['ck']})


if __name__ == '__main__':
    main()
