"""Scale probe for SemDeDup (T38, ann.semdedup).

Synthetic clustered corpus generated ON the executors (the
ann_scale_probe splitmix64+Box-Muller generator): 256 unit centers,
sigma=0.2 noise, PLUS planted near-dup structure -- 1-in-20 rows is a
tiny-perturbation copy (sigma=0.01) of a pool of 1,000 "originals",
so the threshold actually separates planted duplicates (cos ~0.999)
from ordinary same-cluster neighbors.

The probe exercises the claimed scale shape: one cell shuffle where
each vector rides once, a grouped BLAS pass per cell whose compute is
occupancy^2 * dim (n_cells is the knob -- it must scale with the
corpus, the paper's own design), skinny edge output, pointer-jumping
closure rounds.

Run at two cluster sizes (real executor JVMs, the bench.py --scaling
methodology) on the SAME input; the (vec_id, rep_id) checksum must
match (layout independence) and throughput should scale:

    SPARK_GRAFT_MASTER=local-cluster[1,1,5120] SPARK_GRAFT_EXECUTOR_MEM=4g \
        SPARK_GRAFT_CPUS=1 python scripts/semdedup_scale_probe.py 500000
    SPARK_GRAFT_MASTER=local-cluster[4,1,5120] SPARK_GRAFT_EXECUTOR_MEM=4g \
        SPARK_GRAFT_CPUS=4 python scripts/semdedup_scale_probe.py 500000
"""

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Counter-based splitmix64 finalizer (same spec as
    ann_scale_probe's; inlined so the mapInPandas closure ships
    self-contained to executors)."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _row_gaussians(ids: np.ndarray, dim: int, salt: int) -> np.ndarray:
    """Deterministic N(0,1) keyed on (id, column, salt): splitmix64 ->
    uniform -> Box-Muller (ann_scale_probe's generator, inlined)."""
    base = (ids.astype(np.uint64)[:, None] * np.uint64(2 * dim + 2)
            + np.arange(dim, dtype=np.uint64)[None, :]
            + np.uint64(salt))
    u1 = (_splitmix64(base) >> np.uint64(11)) * 2.0 ** -53
    u2 = (_splitmix64(base + np.uint64(dim)) >> np.uint64(11)) * 2.0 ** -53
    u1 = np.maximum(u1, 1e-300)
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 500_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    n_cells = int(sys.argv[3]) if len(sys.argv) > 3 else 1024
    from pyspark.sql import functions as F

    from pytrs_spark.operators import ann
    from pytrs_spark.session import get_spark
    cpus = int(os.environ.get('SPARK_GRAFT_CPUS', '32'))
    spark = get_spark('semdedup-scale-probe', cores=cpus)
    spark.sparkContext.setLogLevel('ERROR')

    rng = np.random.default_rng(42)
    n_centers = 256
    C = rng.standard_normal((n_centers, dim))
    C /= np.linalg.norm(C, axis=1)[:, None]

    def gen(batches):
        for pdf in batches:
            ids = pdf['id'].to_numpy(np.uint64)
            # 1-in-20 rows copy "original" (id % 1000) with tiny noise
            # -> a planted near-dup component; others are ordinary
            # cluster members.
            dup = (_splitmix64(ids + np.uint64(7)) % np.uint64(20)
                   == 0)
            seed = np.where(dup, ids % np.uint64(1000), ids)
            lab = (_splitmix64(seed) % np.uint64(n_centers)).astype(int)
            sigma = np.where(dup, 0.01, 0.2)[:, None]
            X = C[lab] + sigma * _row_gaussians(seed, dim, salt=1)
            # tiny per-ROW jitter so planted copies are near, not
            # byte-identical
            X = X + 0.002 * _row_gaussians(ids, dim, salt=9)
            yield pd.DataFrame({'vec_id': ids.astype(np.int64),
                                'embedding': list(X)})

    corpus = (spark.range(n, numPartitions=max(4 * cpus, 8))
              .mapInPandas(gen, 'vec_id long, embedding array<double>')
              .cache())
    corpus.count()

    # Time the quantizer training separately: it is a FIXED driver-
    # side cost (stable 8192-row sample + numpy Lloyd), identical at
    # every cluster size, amortized across every corpus the quantizer
    # serves -- folding it into the scan wall understates scaling.
    # The memo cache makes the semdedup call below reuse this exact
    # quantizer.
    t0 = time.time()
    ann._ivf_centroids(corpus, n_cells, 'vec_id', 'embedding',
                       train_sample=8192)
    t_train = time.time() - t0

    t0 = time.time()
    out = ann.semdedup(corpus, n_cells=n_cells, threshold=0.99,
                       train_sample=8192)
    agg = out.agg(
        F.count(F.lit(1)).alias('rows'),
        F.sum(F.when(F.col('kept'), 1).otherwise(0)).alias('kept'),
        F.expr('bit_xor(xxhash64(vec_id, rep_id))').alias('chk')
    ).collect()[0]
    wall = time.time() - t0
    print(f'n={n} dim={dim} n_cells={n_cells} occupancy~{n // n_cells}')
    print(f'rows={agg["rows"]} kept={agg["kept"]} chk={agg["chk"]}')
    print(f'train={t_train:.2f}s wall={wall:.2f}s '
          f'throughput={n / wall:,.0f} vec/s cpus={cpus}')


if __name__ == '__main__':
    main()
