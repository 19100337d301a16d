"""Reproducible ANN scale probe: the 2,000-row driver table cannot
show why approximate indexes exist, so this builds a deterministic
1M-row clustered corpus (256 unit centers + sigma=0.2 gaussian noise,
seed 42 -- noise-dominated but locally structured, the regime real
embedding corpora live in) and measures wall + recall@10 vs exact for
every ANN tier.  Results feed the "ANN at 1M rows" table in BENCH.md.

Usage:  python scripts/ann_scale_probe.py [n_rows] [dim]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


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
    lab = rng.integers(0, n_centers, n)
    # build the corpus distributed-ish in chunks to keep driver memory
    # bounded; rows are (vec_id, embedding)
    chunk = 100_000
    parts = []
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        X = C[lab[s:e]] + 0.2 * rng.standard_normal((e - s, dim))
        parts.append(spark.createDataFrame(
            [(int(i + s), [float(v) for v in X[i]])
             for i in range(e - s)],
            'vec_id long, embedding array<double>'))
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    corpus = corpus.repartition(32).cache()
    corpus.count()
    q = corpus.filter(F.col('vec_id') < 8).select(
        F.col('vec_id').alias('query_id'), 'embedding')

    def run(tag, fn):
        t0 = time.time()
        rows = fn().collect()
        wall = round(time.time() - t0, 2)
        got = {(r['query_id'], r['vec_id']) for r in rows}
        return tag, wall, got

    tag, wall, truth = run(
        'brute_force', lambda: ann.brute_force_topk(corpus, q, k=10))
    print(f'{tag}: {wall}s recall 1.0 (truth)')
    for tag, fn in [
        ('ivf(256,nprobe=8)',
         lambda: ann.ivf_topk(corpus, q, k=10, n_cells=256, nprobe=8)),
        ('lsh(6 planes,8 tables,probes=2)',
         lambda: ann.lsh_bucket_topk(corpus, q, dim=dim, k=10, planes=6,
                                     tables=8, probes=2)),
        ('pq(m=8,rerank=256)',
         lambda: ann.pq_topk(corpus, q, k=10, m=8, rerank=256)),
        ('ivfpq(256,nprobe=8,m=8,rerank=256)',
         lambda: ann.ivfpq_topk(corpus, q, k=10, n_cells=256, nprobe=8,
                                m=8, rerank=256)),
    ]:
        t, wall, got = run(tag, fn)
        rec = round(len(truth & got) / max(len(truth), 1), 3)
        print(f'{t}: {wall}s recall@10 {rec}')
    spark.stop()


if __name__ == '__main__':
    main()
