"""Scale probe for connected_components (transitive dedup clustering).

Near-dup graphs at corpus scale are unions of small cliques plus the
occasional chain (the adversarial diameter case).  This probe builds a
deterministic synthetic graph of both shapes ON the executors (no
driver materialization), runs the min-label-propagation +
pointer-jumping loop, and reports wall time, iteration count, and a
component-structure checksum.

    PYTHONPATH=/root/repo python scripts/cc_scale_probe.py [n_edges]

Graph shape (seeded by row id, fully deterministic):
- 90% of edges form 5-node cliques: vertices v = g*5 + {0..4},
  edges (v_i, v_j) within the group -> component min = g*5.
- 10% form 1000-node chains: consecutive ids -> the pointer-jumping
  path must collapse diameter ~1000 in O(log) rounds (10 doublings),
  which a plain label-propagation loop would take 1000 rounds over.

Expected: iterations ~11-13 regardless of edge count (log2(1000) for
the chains dominates); each iteration's shuffle carries only
(long, long) rows.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from pytrs_spark.operators.textops import connected_components
from pytrs_spark.session import tune_session


def build_graph(spark, n_edges: int):
    """Deterministic clique+chain edge list, generated distributed."""
    n_clique_edges = int(n_edges * 0.9)
    n_chain_edges = n_edges - n_clique_edges
    # cliques: 10 edges per 5-node group -> edge e belongs to group
    # e//10; within-group pair index p=e%10 maps to (i,j), i<j<5.
    pairs = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    cliques = spark.range(n_clique_edges).select(
        (F.col('id') / 10).cast('long').alias('g'),
        (F.col('id') % 10).cast('int').alias('p'))
    pi = F.array(*[F.lit(i) for i, _ in pairs])[F.col('p')]
    pj = F.array(*[F.lit(j) for _, j in pairs])[F.col('p')]
    cliques = cliques.select(
        (F.col('g') * 5 + pi).alias('id_a'),
        (F.col('g') * 5 + pj).alias('id_b'))
    # chains: 1000-node segments in a disjoint id space (offset 10^12)
    base = 1_000_000_000_000
    chains = spark.range(n_chain_edges).select(
        (F.lit(base) + F.col('id')
         + (F.col('id') / 999).cast('long')).alias('id_a'))
    chains = chains.select('id_a', (F.col('id_a') + 1).alias('id_b'))
    return cliques.unionByName(chains)


def main():
    n_edges = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    cpus = os.environ.get('SPARK_GRAFT_CPUS', '32')
    spark = (SparkSession.builder.master(f'local[{cpus}]')
             .config('spark.sql.shuffle.partitions', cpus)
             .config('spark.driver.memory', '16g')
             .getOrCreate())
    tune_session(spark)
    spark.sparkContext.setLogLevel('ERROR')
    edges = build_graph(spark, n_edges).persist()
    n = edges.count()

    t0 = time.time()
    st = {}
    comp = connected_components(edges, stats=st)
    # checksum: component count + order-independent label hash
    agg = comp.agg(
        F.countDistinct('component_id').alias('n_components'),
        F.count('*').alias('n_vertices'),
        F.bit_xor(F.xxhash64('doc_id', 'component_id')).alias('ck')
    ).collect()[0]
    wall = time.time() - t0
    # expected component count: cliques contribute ceil(edges/10)
    # groups; chains contribute ceil(chain_edges/999) segments.
    print({'n_edges': n, 'wall_s': round(wall, 2),
           'iterations': st.get('iterations'),
           'edges_per_sec': round(n / wall),
           'n_components': agg['n_components'],
           'n_vertices': agg['n_vertices'],
           'checksum': agg['ck']})
    spark.stop()


if __name__ == '__main__':
    main()
