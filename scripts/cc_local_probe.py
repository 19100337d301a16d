"""Crossover probe for connected_components' size-gated driver
closure: time the SAME clique+chain graphs (the cc_scale_probe
generator) through both paths at increasing edge counts, verifying
label-checksum equality at every size.

The gate trades a driver collect (~16 B/row of the symmetric edge
set) + a vectorized numpy label propagation against ~O(log diameter)
distributed rounds x fixed per-round job overhead.  The probe prints
one line per (n_edges, mode): wall, per-leg steal, checksum --
the evidence behind the 2M-undirected-pair default.

    PYTHONPATH=/root/repo python scripts/cc_local_probe.py \
        [n_edges ...]    # default 50k 200k 1M 2M 4M
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from cc_scale_probe import build_graph  # noqa: E402 (scripts dir)
from pytrs_spark.operators.textops import connected_components
from pytrs_spark.session import tune_session


def _steal():
    try:
        with open('/proc/stat') as f:
            return int(f.readline().split()[8])
    except Exception:  # noqa: BLE001
        return 0


def main():
    sizes = [int(x) for x in sys.argv[1:]] or [
        50_000, 200_000, 1_000_000, 2_000_000, 4_000_000]
    cpus = os.environ.get('SPARK_GRAFT_CPUS', '32')
    spark = (SparkSession.builder.master(f'local[{cpus}]')
             .config('spark.sql.shuffle.partitions', cpus)
             .config('spark.driver.memory', '16g')
             .getOrCreate())
    tune_session(spark)
    spark.sparkContext.setLogLevel('ERROR')

    for n in sizes:
        edges = build_graph(spark, n).persist()
        edges.count()
        row = {}
        for mode, gate in (('local', 1 << 60), ('distributed', 0)):
            st = {}
            s0, t0 = _steal(), time.time()
            comp = connected_components(edges, stats=st,
                                        local_max_edges=gate)
            agg = comp.agg(
                F.countDistinct('component_id').alias('nc'),
                F.bit_xor(F.xxhash64('doc_id', 'component_id'))
                .alias('ck')).collect()[0]
            wall = time.time() - t0
            row[mode] = {
                'wall_s': round(wall, 2),
                'steal': round((_steal() - s0) / 100.0
                               / max(wall, 1e-9), 2),
                'iters': st.get('iterations'),
                'n_components': agg['nc'], 'checksum': agg['ck']}
        same = (row['local']['checksum'] == row['distributed']['checksum']
                and row['local']['n_components']
                == row['distributed']['n_components'])
        print({'n_edges': n, 'checksums_equal': same, **row}, flush=True)
        edges.unpersist()
        if not same:
            sys.exit(1)
    spark.stop()


if __name__ == '__main__':
    main()
