#!/usr/bin/env python
"""Steal-annotated alternated A/B harness for the four round-4 driver
bench rows that regressed vs round 3 (ann_lsh 1.055 -> 2.613 s,
fingerprint 0.326 -> 0.637, ann_topk 0.447 -> 0.803, asof_join
0.415 -> 0.743).

Same methodology as scripts/pin_regressions.py (which settled the r3
regressions as steal storms): A = HEAD, B = a git worktree at the
round-3 end commit (fbcb16f); legs alternate ABBA so a hypervisor
steal storm hits both trees equally in expectation; each leg is a
fresh subprocess (own Spark JVM); every timed sample carries the
stolen-core estimate for its window (delta of /proc/stat field 8 over
the wall); per-tree result is the MIN across samples (steal is
strictly additive noise).

Stage bodies replicate bench.py's definitions for the four queries.

Usage:
  python scripts/pin_regressions_r4.py             # orchestrate A/B
  python scripts/pin_regressions_r4.py --leg PATH  # one leg (internal)
"""

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get('SPARK_GRAFT_SF_DIR', '/root/testdata/sf0.1')
CPUS = int(os.environ.get('SPARK_GRAFT_CPUS', '32'))
RUNS = int(os.environ.get('PIN_RUNS', '3'))        # samples per leg
ROUNDS = int(os.environ.get('PIN_ROUNDS', '2'))    # ABBA rounds
R3_COMMIT = 'fbcb16f'
R3_TREE = os.path.join(REPO, '.abtree', 'r3')
QUERIES = ('ann_lsh', 'fingerprint', 'ann_topk', 'asof_join')
# Driver-recorded walls (BENCH_r03.json / BENCH_r04.json) the A/B
# verdict is judged against.
DRIVER = {'ann_lsh': (1.055, 2.613), 'fingerprint': (0.326, 0.637),
          'ann_topk': (0.447, 0.803), 'asof_join': (0.415, 0.743)}


def _steal_jiffies():
    try:
        with open('/proc/stat') as f:
            return int(f.readline().split()[8])
    except Exception:  # noqa: BLE001
        return 0


def leg(tree):
    """One subprocess leg: run each stage (1 warm + RUNS timed
    samples, each steal-annotated) against the library at ``tree``."""
    sys.path.insert(0, tree)
    from pyspark.sql import functions as F

    from pytrs_spark.operators import textops
    from pytrs_spark.operators.ann import brute_force_topk, lsh_bucket_topk
    from pytrs_spark.operators.events import asof_join
    from pytrs_spark.session import get_spark

    spark = get_spark('pin-regressions-r4', cores=CPUS)
    spark.sparkContext.setLogLevel('ERROR')

    # Inputs exactly as bench.py stages them.
    docs = spark.read.parquet(f'{SF_DIR}/documents.parquet') \
        .repartition(CPUS).cache()
    docs.count()
    emb = spark.read.parquet(f'{SF_DIR}/embeddings.parquet')
    q = emb.filter(F.col('vec_id') < 8).select(
        F.col('vec_id').alias('query_id'), 'embedding')
    dim = len(emb.select('embedding').first()[0])
    events = spark.read.parquet(f'{SF_DIR}/events.parquet').persist()
    events.count()
    _clicks = events.filter(F.col('event_type') == 'click') \
        .select('event_id', 'user_id', 'ts')
    _purch = events.filter(F.col('event_type') == 'purchase') \
        .select('user_id', 'ts', 'value')

    stages = {
        'ann_lsh': lambda: lsh_bucket_topk(
            emb, q, dim=dim, k=10, planes=4, tables=8, probes=2).count(),
        'fingerprint': lambda: textops.fingerprint(docs)
        .select(F.max('min_window_hash')).collect(),
        'ann_topk': lambda: brute_force_topk(emb, q, k=10).count(),
        'asof_join': lambda: asof_join(_clicks, _purch, 'user_id')
        .select(F.bit_xor(F.xxhash64(
            'event_id', F.coalesce(F.round('value_asof', 6),
                                   F.lit(-1.0))))).collect(),
    }

    out = {}
    for name in QUERIES:
        fn = stages[name]
        fn()  # warm (plan analysis, codegen, broadcast build)
        samples = []
        for _ in range(RUNS):
            st0, t0 = _steal_jiffies(), time.time()
            fn()
            wall = time.time() - t0
            steal = (_steal_jiffies() - st0) / 100.0 / max(wall, 1e-9)
            samples.append((round(wall, 3), round(steal, 2)))
        out[name] = samples
    print('LEGJSON ' + json.dumps(out))
    spark.stop()


def ensure_r3_tree():
    if not os.path.exists(os.path.join(R3_TREE, 'pytrs_spark')):
        os.makedirs(os.path.dirname(R3_TREE), exist_ok=True)
        subprocess.run(['git', 'worktree', 'add', '--detach', R3_TREE,
                        R3_COMMIT], cwd=REPO, check=True)


def run_leg(tree):
    env = dict(os.environ)
    p = subprocess.run(
        [sys.executable, os.path.abspath(__file__), '--leg', tree],
        capture_output=True, text=True, env=env, cwd=REPO)
    for line in p.stdout.splitlines():
        if line.startswith('LEGJSON '):
            return json.loads(line[len('LEGJSON '):])
    raise RuntimeError(f'leg failed for {tree}:\n{p.stdout[-2000:]}'
                       f'\n{p.stderr[-2000:]}')


def main():
    if len(sys.argv) > 2 and sys.argv[1] == '--leg':
        leg(sys.argv[2])
        return
    ensure_r3_tree()
    acc = {'HEAD': {q: [] for q in QUERIES},
           'r3': {q: [] for q in QUERIES}}
    order = [('HEAD', REPO), ('r3', R3_TREE),
             ('r3', R3_TREE), ('HEAD', REPO)] * ROUNDS
    for i, (tag, tree) in enumerate(order):
        t0 = time.time()
        res = run_leg(tree)
        for q in QUERIES:
            acc[tag][q].extend(res[q])
        print(f'leg {i + 1}/{len(order)} [{tag}] done '
              f'({time.time() - t0:.0f}s): '
              + ', '.join(f'{q}={res[q]}' for q in QUERIES),
              file=sys.stderr)
    report = {}
    for q in QUERIES:
        row = {}
        for tag in ('HEAD', 'r3'):
            s = acc[tag][q]
            best = min(s)
            row[tag] = {'min_wall': best[0], 'steal_at_min': best[1],
                        'median_wall': round(statistics.median(
                            w for w, _ in s), 3),
                        'samples': s}
        row['driver_r3'], row['driver_r4'] = DRIVER[q]
        row['head_vs_r3_code'] = round(
            row['HEAD']['min_wall'] / row['r3']['min_wall'], 3)
        report[q] = row
    print(json.dumps(report, indent=1))


if __name__ == '__main__':
    main()
