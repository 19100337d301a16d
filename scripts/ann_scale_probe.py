"""Reproducible ANN scale probe: the 2,000-row driver table cannot
show why approximate indexes exist, so this builds a deterministic
1M-row clustered corpus (256 unit centers + sigma=0.2 gaussian noise,
seed 42 -- noise-dominated but locally structured, the regime real
embedding corpora live in) and measures wall + recall@10 vs exact for
every ANN tier.  Results feed the "ANN at 1M rows" table in BENCH.md.

The corpus is generated ON THE EXECUTORS (``spark.range`` ->
``mapInPandas`` with a counter-based splitmix64+Box-Muller gaussian
keyed on vec_id), so the probe itself scales: rows are deterministic
per vec_id regardless of partitioning, and the driver never holds the
corpus.  This is the same shape a real 10^12-row synthetic load would
take.

Usage:  python scripts/ann_scale_probe.py [n_rows] [dim]
"""

import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer: uint64 array -> uint64 array.
    Counter-based (stateless) so every row's randomness depends only on
    its vec_id, never on partitioning or generation order."""
    x = (x + np.uint64(0x9E3779B97F4A7C15)).astype(np.uint64)
    x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return x ^ (x >> np.uint64(31))


def _row_gaussians(ids: np.ndarray, dim: int, salt: int) -> np.ndarray:
    """Deterministic N(0,1) matrix keyed on (vec_id, column, salt) via
    splitmix64 -> uniform -> Box-Muller.  Pure numpy, no rng objects."""
    base = (ids.astype(np.uint64)[:, None] * np.uint64(2 * dim + 2)
            + np.arange(dim, dtype=np.uint64)[None, :]
            + np.uint64(salt))
    u1 = (_splitmix64(base) >> np.uint64(11)) * 2.0 ** -53
    u2 = (_splitmix64(base + np.uint64(dim)) >> np.uint64(11)) * 2.0 ** -53
    u1 = np.maximum(u1, 1e-300)
    return np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    from pyspark.sql import functions as F

    from pytrs_spark.operators import ann
    from pytrs_spark.session import get_spark
    spark = get_spark('ann_scale_probe', cores=32,
                      shuffle_partitions=32)
    spark.sparkContext.setLogLevel('ERROR')

    rng = np.random.default_rng(42)
    n_centers = 256
    C = rng.standard_normal((n_centers, dim))
    C /= np.linalg.norm(C, axis=1)[:, None]

    # Corpus rows are generated on the executors, deterministically per
    # vec_id: cluster label = splitmix64(id) % 256, noise = counter-
    # based gaussian.  Driver never materializes the corpus.
    def gen(batches):
        for pdf in batches:
            ids = pdf['id'].to_numpy(np.uint64)
            lab = (_splitmix64(ids) % np.uint64(n_centers)).astype(int)
            X = C[lab] + 0.2 * _row_gaussians(ids, dim, salt=1)
            yield pd.DataFrame({'vec_id': ids.astype(np.int64),
                                'embedding': list(X)})

    corpus = (spark.range(n, numPartitions=64)
              .mapInPandas(gen, 'vec_id long, embedding array<double>')
              .cache())
    corpus.count()
    q = corpus.filter(F.col('vec_id') < 8).select(
        F.col('vec_id').alias('query_id'), 'embedding')

    def run(tag, fn, runs=2):
        # Best-of-N: the first sample pays one-time costs (codebook /
        # quantizer training, page first-touch) that a resident index
        # would amortize; both samples are printed so variance stays
        # visible.  Matches bench.py's best-of methodology.
        walls, got = [], None
        for _ in range(runs):
            t0 = time.time()
            rows = fn().collect()
            walls.append(round(time.time() - t0, 2))
            got = {(r['query_id'], r['vec_id']) for r in rows}
        return tag, min(walls), walls, got

    tag, wall, walls, truth = run(
        'brute_force', lambda: ann.brute_force_topk(corpus, q, k=10))
    print(f'{tag}: {wall}s {walls} recall 1.0 (truth)')

    # Production regime: the index is built ONCE (persisted) and the
    # per-query path never re-ships corpus vectors.  Index build time
    # is reported separately -- it amortizes over every query the
    # index ever serves.
    def build(mk):
        t0 = time.time()
        ix = mk().persist()
        ix.count()
        return ix, round(time.time() - t0, 2)

    for tag, mk_index, fn in [
        ('ivf(256,nprobe=8)',
         lambda: ann.ivf_index(corpus, n_cells=256),
         lambda ix: ann.ivf_topk(corpus, q, k=10, n_cells=256,
                                 nprobe=8, index=ix)),
        ('lsh(6 planes,8 tables,probes=2)',
         lambda: ann.lsh_index(corpus, planes=6, tables=8),
         lambda ix: ann.lsh_bucket_topk(corpus, q, dim=dim, k=10,
                                        planes=6, tables=8, probes=2,
                                        index=ix)),
        ('pq(m=8,rerank=256)',
         lambda: ann.pq_index(corpus, m=8),
         lambda ix: ann.pq_topk(corpus, q, k=10, m=8, rerank=256,
                                index=ix)),
        ('ivfpq(256,nprobe=8,m=8,rerank=256)',
         lambda: ann.ivfpq_index(corpus, n_cells=256, m=8),
         lambda ix: ann.ivfpq_topk(corpus, q, k=10, n_cells=256,
                                   nprobe=8, m=8, rerank=256,
                                   index=ix)),
    ]:
        ix, build_s = build(mk_index)
        t, wall, walls, got = run(tag, lambda: fn(ix))
        rec = round(len(truth & got) / max(len(truth), 1), 3)
        print(f'{t}: build {build_s}s, query {wall}s {walls} '
              f'recall@10 {rec}')
        ix.unpersist()
    spark.stop()


if __name__ == '__main__':
    main()
