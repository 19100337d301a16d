"""Scale probe for the event-stream operators (sessionize / asof_join
/ retention) on executor-generated synthetic events.

    PYTHONPATH=/root/repo python scripts/events_scale_probe.py [n_events]

Events are derived deterministically from the row id with pure column
arithmetic (no driver materialization, no Python): ~n/1000 users, a
spread of inter-event gaps that crosses the 30-min session boundary,
and a value column.  Reports wall + rows/sec for each operator plus
order-independent checksums so two runs (or two parallelism levels)
can be compared for identical output.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

from pytrs_spark.operators.events import asof_join, sessionize
from pytrs_spark.session import tune_session


def gen_events(spark, n: int):
    """Deterministic synthetic events: user = mixed id, ts spaced so
    ~1/3 of consecutive per-user gaps exceed the 30-min boundary."""
    n_users = max(n // 1000, 1)
    df = spark.range(n)
    user = F.pmod(F.col('id') * 2654435761, F.lit(n_users))
    # per-user event sequence k has gaps cycling 5min/25min/45min
    gap_min = F.array(F.lit(5), F.lit(25), F.lit(45))[
        F.pmod(F.col('id'), F.lit(3)).cast('int')]
    base = F.lit('2024-01-01 00:00:00').cast('timestamp')
    ts = F.timestamp_micros(
        F.unix_micros(base)
        + (F.col('id') / F.lit(n_users)).cast('long') * gap_min
        * 60_000_000 + F.pmod(F.col('id'), F.lit(997)) * 1_000)
    etype = F.array(F.lit('click'), F.lit('view'), F.lit('purchase'))[
        F.pmod(F.col('id'), F.lit(3)).cast('int')]
    return df.select(F.col('id').alias('event_id'),
                     user.alias('user_id'), ts.alias('ts'),
                     etype.alias('event_type'),
                     (F.pmod(F.col('id'), F.lit(10007)) / 100.0)
                     .alias('value'))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000_000
    cpus = os.environ.get('SPARK_GRAFT_CPUS', '32')
    spark = (SparkSession.builder.master(f'local[{cpus}]')
             .config('spark.sql.shuffle.partitions', cpus)
             .config('spark.driver.memory', '24g')
             .getOrCreate())
    tune_session(spark)
    spark.sparkContext.setLogLevel('ERROR')
    ev = gen_events(spark, n)
    out = {'rows': n, 'cores': int(cpus)}

    t0 = time.time()
    ck = sessionize(ev).select(
        F.bit_xor(F.xxhash64('event_id', 'session_id')).alias('ck'),
        F.countDistinct('session_id').alias('n_sessions')).collect()[0]
    out['sessionize_wall_s'] = round(time.time() - t0, 2)
    out['sessionize_rows_per_s'] = round(n / out['sessionize_wall_s'])
    out['n_sessions'] = ck['n_sessions']
    out['sessionize_ck'] = ck['ck']

    clicks = ev.filter(F.col('event_type') == 'click') \
        .select('event_id', 'user_id', 'ts')
    purch = ev.filter(F.col('event_type') == 'purchase') \
        .select('user_id', 'ts', 'value')
    t0 = time.time()
    ck = asof_join(clicks, purch, 'user_id').select(
        F.bit_xor(F.xxhash64('event_id',
                             F.coalesce(F.round('value_asof', 6),
                                        F.lit(-1.0)))).alias('ck'),
        F.count('*').alias('n')).collect()[0]
    out['asof_wall_s'] = round(time.time() - t0, 2)
    out['asof_rows_per_s'] = round(n / out['asof_wall_s'])
    out['asof_rows'] = ck['n']
    out['asof_ck'] = ck['ck']

    # E14 interval join: n/1000 deterministic campaign windows over
    # 64 key groups; the point side (the n events) never shuffles.
    from pytrs_spark.operators.events import interval_join
    n_iv = max(n // 1000, 8)
    start = (F.unix_micros(F.lit('2024-01-01 00:00:00')
                           .cast('timestamp'))
             + F.pmod(F.col('id') * 104729,
                      F.lit(n // 3 * 300)) * F.lit(1_000_000))
    iv = spark.range(n_iv).select(
        F.col('id').alias('interval_id'),
        F.pmod(F.col('id'), F.lit(64)).alias('grp'),
        F.timestamp_micros(start).alias('start_ts'),
        F.timestamp_micros(start + (60 + F.pmod(F.col('id'),
                                                F.lit(3600)))
                           * 1_000_000).alias('end_ts'))
    pts = ev.select('event_id', 'ts',
                    F.pmod(F.col('user_id'), F.lit(64)).alias('grp'))
    t0 = time.time()
    ck = interval_join(pts, iv, keys=['grp']).select(
        F.bit_xor(F.xxhash64('event_id', 'interval_id')).alias('ck'),
        F.count('*').alias('n')).collect()[0]
    out['interval_wall_s'] = round(time.time() - t0, 2)
    out['interval_rows_per_s'] = round(n / out['interval_wall_s'])
    out['interval_pairs'] = ck['n']
    out['interval_ck'] = ck['ck']
    print(out)
    spark.stop()


if __name__ == '__main__':
    main()
