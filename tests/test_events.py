"""Unit tests for sessionization and as-of join
(pytrs_spark.operators.events) on handcrafted timelines."""

import datetime as dt

from pyspark.sql import functions as F

from pytrs_spark.operators.events import (
    asof_join,
    session_stats,
    sessionize,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(seconds, micros=0):
    return T0 + dt.timedelta(seconds=seconds, microseconds=micros)


def test_sessionize_gap_boundary(spark):
    # gaps: exactly gap_s keeps the session; gap_s + 1us breaks it.
    ev = spark.createDataFrame(
        [(1, 7, _ts(0)),
         (2, 7, _ts(1800)),              # exactly 30 min -> same session
         (3, 7, _ts(3600, 1)),           # 1800s + 1us gap -> new session
         (4, 8, _ts(10))],               # other user -> own session 0
        'event_id long, user_id long, ts timestamp')
    rows = {r['event_id']: (r['session_seq'], r['session_id'])
            for r in sessionize(ev, gap_s=1800).collect()}
    assert rows[1] == (0, '7_0')
    assert rows[2] == (0, '7_0')
    assert rows[3] == (1, '7_1')
    assert rows[4] == (0, '8_0')


def test_sessionize_equal_ts_deterministic(spark):
    # equal timestamps order by event_id -- stable under repartition.
    ev = spark.createDataFrame(
        [(2, 1, _ts(0)), (1, 1, _ts(0)), (3, 1, _ts(5000))],
        'event_id long, user_id long, ts timestamp')
    a = sorted(map(tuple, sessionize(ev).select(
        'event_id', 'session_seq').collect()))
    b = sorted(map(tuple, sessionize(ev.repartition(5)).select(
        'event_id', 'session_seq').collect()))
    assert a == b == [(1, 0), (2, 0), (3, 1)]


def test_session_stats(spark):
    ev = spark.createDataFrame(
        [(1, 7, _ts(0)), (2, 7, _ts(100)), (3, 7, _ts(10000))],
        'event_id long, user_id long, ts timestamp')
    rows = {r['session_id']: (r['n_events'], r['duration_s'])
            for r in session_stats(sessionize(ev)).collect()}
    assert rows['7_0'] == (2, 100.0)
    assert rows['7_1'] == (1, 0.0)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts(10)),    # after right@5 -> 50.0
         (2, 7, _ts(5)),     # simultaneous with right@5 -> inclusive
         (3, 7, _ts(1)),     # before any right row -> null
         (4, 8, _ts(100))],  # other key, no right rows -> null
        'event_id long, user_id long, ts timestamp')
    right = spark.createDataFrame(
        [(7, _ts(5), 50.0), (7, _ts(8), 80.0)],
        'user_id long, ts timestamp, value double')
    out = {r['event_id']: r['value_asof']
           for r in asof_join(left, right, 'user_id').collect()}
    assert out == {1: 80.0, 2: 50.0, 3: None, 4: None}
    # left row count preserved (left join)
    assert asof_join(left, right, 'user_id').count() == 4


def test_asof_join_preserves_left_columns(spark):
    left = spark.createDataFrame(
        [(1, 7, _ts(10), 'x')],
        'event_id long, user_id long, ts timestamp, tag string')
    right = spark.createDataFrame(
        [(7, _ts(5), 1.5)], 'user_id long, ts timestamp, value double')
    row = asof_join(left, right, 'user_id').collect()[0]
    assert (row['event_id'], row['user_id'], row['tag'],
            row['value_asof']) == (1, 7, 'x', 1.5)


def test_stream_sessions_matches_batch(spark, tmp_path):
    from pytrs_spark.streaming import stream_sessions
    sf = '/root/testdata/sf0.001'
    batch_events = spark.read.parquet(f'{sf}/events.parquet')
    src = str(tmp_path / 'events_dir')
    batch_events.write.mode('overwrite').parquet(src)
    stream = spark.readStream.schema(batch_events.schema).parquet(src)
    q = (stream_sessions(stream).writeStream.format('memory')
         .queryName('sessions').outputMode('complete')
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = spark.table('sessions')
    want = stream_sessions(batch_events)     # batch-capable operator
    assert got.count() > 0
    assert got.exceptAll(want).isEmpty()
    assert want.exceptAll(got).isEmpty()


def test_retention_cohorts(spark):
    from pytrs_spark.operators.events import retention_cohorts
    # user 1 first seen week of Jan 1 (Mon), active weeks 0 and 2;
    # user 2 first seen week of Jan 8, active week 0 only.
    rows = [
        (1, 1, dt.datetime(2024, 1, 3)),
        (2, 1, dt.datetime(2024, 1, 17)),
        (3, 1, dt.datetime(2024, 1, 19)),   # same week as event 2
        (4, 2, dt.datetime(2024, 1, 9)),
    ]
    df = spark.createDataFrame(
        rows, 'event_id long, user_id long, ts timestamp')
    got = {(str(r['cohort_week']), r['week_offset']): r['n_users']
           for r in retention_cohorts(df).collect()}
    assert got == {('2024-01-01', 0): 1, ('2024-01-01', 2): 1,
                   ('2024-01-08', 0): 1}


def test_rolling_sum_days_handles_calendar_gaps(spark):
    from pytrs_spark.operators.events import rolling_sum_days
    # days 1, 2, then a gap to day 20: a ROWS frame would wrongly
    # include day 2 in day 20's trailing week; RANGE must not.
    rows = [(1, dt.datetime(2024, 1, 1, 5), 10.0),
            (2, dt.datetime(2024, 1, 2, 6), 20.0),
            (3, dt.datetime(2024, 1, 2, 7), 5.0),
            (4, dt.datetime(2024, 1, 20, 8), 40.0)]
    df = spark.createDataFrame(
        rows, 'event_id long, ts timestamp, value double')
    got = {r['day']: (r['day_total'], r['trailing_7d'])
           for r in rolling_sum_days(df, days=7).collect()}
    assert got['2024-01-01'] == (10.0, 10.0)
    assert got['2024-01-02'] == (25.0, 35.0)
    assert got['2024-01-20'] == (40.0, 40.0)   # gap: nothing carried


def test_rolling_sum_days_keyed(spark):
    from pytrs_spark.operators.events import rolling_sum_days
    rows = [(1, 7, dt.datetime(2024, 1, 1), 10.0),
            (2, 7, dt.datetime(2024, 1, 3), 20.0),
            (3, 8, dt.datetime(2024, 1, 3), 100.0)]
    df = spark.createDataFrame(
        rows, 'event_id long, user_id long, ts timestamp, value double')
    got = {(r['user_id'], r['day']): r['trailing_7d']
           for r in rolling_sum_days(df, days=7,
                                     key_cols='user_id').collect()}
    # user 7's window carries day 1 into day 3; user 8 is isolated
    assert got[(7, '2024-01-03')] == 30.0
    assert got[(8, '2024-01-03')] == 100.0


# ---------------------------------------------------------------- E14

def _naive_interval_pairs(points, intervals, keyed):
    out = set()
    for pid, pk, pts in points:
        for iid, ik, s, e in intervals:
            if s <= pts <= e and (not keyed or pk == ik):
                out.add((pid, iid))
    return out


def test_interval_join_matches_naive(spark):
    from pytrs_spark.operators.events import interval_join
    pts = [(i, i % 3, _ts(i * 37)) for i in range(60)]
    ivs = [(j, j % 3, _ts(j * 150), _ts(j * 150 + 40 + 60 * j))
           for j in range(12)]
    pdf = spark.createDataFrame(
        pts, 'point_id long, grp long, ts timestamp')
    idf = spark.createDataFrame(
        ivs, 'interval_id long, grp long, start_ts timestamp, '
             'end_ts timestamp')
    for keys, keyed in ((['grp'], True), ((), False)):
        i2 = idf.drop('grp') if not keyed else idf
        got = {(r['point_id'], r['interval_id'])
               for r in interval_join(pdf, i2, keys=keys).collect()}
        assert got == _naive_interval_pairs(pts, ivs, keyed), keys


def test_interval_join_closed_bounds_and_malformed(spark):
    from pytrs_spark.operators.events import interval_join
    pdf = spark.createDataFrame(
        [(1, _ts(100)), (2, _ts(200)), (3, _ts(150)), (4, _ts(201))],
        'point_id long, ts timestamp')
    idf = spark.createDataFrame(
        [(10, _ts(100), _ts(200)),    # closed: both boundary points in
         (11, _ts(300), _ts(250)),    # end < start: dropped
         (12, None, _ts(400))],       # null start: dropped
        'interval_id long, start_ts timestamp, end_ts timestamp')
    got = {(r['point_id'], r['interval_id'])
           for r in interval_join(pdf, idf).collect()}
    assert got == {(1, 10), (2, 10), (3, 10)}


def test_interval_join_bucket_and_collision(spark):
    from pytrs_spark.operators.events import interval_join
    # explicit bucket + shuffle path (broadcast off) agree with auto;
    # colliding payload column names get the _iv suffix.
    pdf = spark.createDataFrame(
        [(i, _ts(i * 11), float(i)) for i in range(40)],
        'point_id long, ts timestamp, value double')
    idf = spark.createDataFrame(
        [(j, _ts(j * 60), _ts(j * 60 + 90), float(-j))
         for j in range(6)],
        'interval_id long, start_ts timestamp, end_ts timestamp, '
        'value double')
    auto = interval_join(pdf, idf)
    assert 'value' in auto.columns and 'value_iv' in auto.columns
    a = {(r['point_id'], r['interval_id']) for r in auto.collect()}
    b = {(r['point_id'], r['interval_id'])
         for r in interval_join(pdf, idf, bucket_s=7.0,
                                broadcast_intervals=False).collect()}
    assert a == b and len(a) > 0


def test_interval_join_point_side_never_shuffles(spark):
    # With a broadcastable interval side the point side must reach
    # the join through scan -> project only: zero hashpartitioning
    # exchanges anywhere in the plan (the single BroadcastExchange
    # carries the exploded interval buckets).
    from pyspark.sql import functions as F
    from pytrs_spark.operators.events import interval_join
    pdf = spark.range(1000).select(
        F.col('id').alias('point_id'),
        F.timestamp_micros(F.lit(1_700_000_000_000_000)
                           + F.col('id') * 1_000_000).alias('ts'))
    idf = spark.createDataFrame(
        [(j, _ts(j * 60), _ts(j * 60 + 90)) for j in range(6)],
        'interval_id long, start_ts timestamp, end_ts timestamp')
    out = interval_join(pdf, idf)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert 'BroadcastExchange' in plan
    assert 'Exchange hashpartitioning' not in plan, plan


def test_asof_attaches_one_atomic_right_row(spark):
    """Multi-column as-of values must come from ONE right row: a
    null field in the latest right row must NOT be patched with an
    older row's value (per-column forward fills do exactly that)."""
    from pytrs_spark.operators.events import asof_join
    left = spark.createDataFrame([('k', 3)], 'key string, ts long')
    right = spark.createDataFrame(
        [('k', 1, 1.0, None), ('k', 2, None, 2.0)],
        'key string, ts long, a double, b double')
    out = asof_join(left, right, 'key',
                    value_cols=('a', 'b')).collect()[0]
    # the ts=2 row is the as-of row: a is null THERE, b is 2.0
    assert out['a_asof'] is None and out['b_asof'] == 2.0


def test_asof_null_key_and_null_ts_never_match(spark):
    """DuckDB ASOF semantics (the oracle): null keys and null right
    timestamps never match; null-key left rows keep null values."""
    from pytrs_spark.operators.events import asof_join
    left = spark.createDataFrame(
        [('k', 5), (None, 5)], 'key string, ts long')
    right = spark.createDataFrame(
        [('k', None, 99.0), (None, 1, 77.0)],
        'key string, ts long, value double')
    rows = {r['key']: r['value_asof']
            for r in asof_join(left, right, 'key').collect()}
    assert rows == {'k': None, None: None}


def test_gap_fill_null_value_is_still_an_observation(spark):
    """An event whose VALUE is null is an observation: its bucket is
    not a gap, and the recorded null carries forward -- it must not
    be patched by an older value."""
    from pyspark.sql import functions as F
    from pytrs_spark.operators.events import gap_fill
    df = spark.createDataFrame(
        [('u', 0, 5.0), ('u', 86_400_000_000, None)],
        'user_id string, us long, value double').select(
        'user_id', F.timestamp_micros('us').alias('ts'), 'value')
    rows = {r['bucket']: (r['value'], r['is_gap'])
            for r in gap_fill(df, step_s=86400).collect()}
    assert rows[0] == (5.0, False)
    assert rows[1] == (None, False)      # observed null, NOT a gap


def test_gap_fill_negative_epoch_floor_buckets(spark):
    """Pre-1970 timestamps floor to the correct grid line (int64
    truncation would fold buckets -1 and 0 together)."""
    from pyspark.sql import functions as F
    from pytrs_spark.operators.events import gap_fill
    df = spark.createDataFrame(
        [('u', -1, 1.0), ('u', 1, 2.0)],
        'user_id string, us long, value double').select(
        'user_id', F.timestamp_micros('us').alias('ts'), 'value')
    rows = {r['bucket']: (r['value'], r['is_gap'])
            for r in gap_fill(df, step_s=86400).collect()}
    assert rows[-1] == (1.0, False)
    assert rows[0] == (2.0, False)
    assert set(rows) == {-1, 0}
