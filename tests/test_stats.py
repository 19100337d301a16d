"""Unit tests for HLL sketches, histograms (operators/stats.py) and
the conversion funnel (operators/events.py)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from pytrs_spark.operators.events import funnel
from pytrs_spark.operators.stats import (
    histogram,
    hll_estimate,
    hll_merge,
    hll_sketch,
)

T0 = dt.datetime(2024, 1, 1)


def test_hll_estimate_accuracy(spark):
    # p=10 -> ~3.2% relative error; allow 4 sigma.
    n = 20_000
    df = spark.range(n).withColumnRenamed('id', 'k')
    est = hll_estimate(hll_sketch(df, 'k', p=10), p=10)
    assert abs(est - n) / n < 0.13
    # duplicates don't inflate the estimate
    dup = df.unionByName(df).unionByName(df)
    est2 = hll_estimate(hll_sketch(dup, 'k', p=10), p=10)
    assert est2 == est


def test_hll_small_range_linear_counting(spark):
    df = spark.range(40).withColumnRenamed('id', 'k')
    est = hll_estimate(hll_sketch(df, 'k', p=8), p=8)
    assert abs(est - 40) / 40 < 0.25


def test_hll_merge_equals_union_sketch(spark):
    a = spark.range(0, 5000).withColumnRenamed('id', 'k')
    b = spark.range(3000, 9000).withColumnRenamed('id', 'k')
    merged = hll_merge(hll_sketch(a, 'k', p=8), hll_sketch(b, 'k', p=8))
    direct = hll_sketch(a.unionByName(b), 'k', p=8)
    assert sorted(map(tuple, merged.collect())) \
        == sorted(map(tuple, direct.collect()))
    with pytest.raises(ValueError):
        hll_sketch(a, 'k', p=3)


def test_histogram_clamps_and_edges(spark):
    df = spark.createDataFrame(
        [(-5.0,), (0.0,), (9.9,), (10.0,), (95.0,), (200.0,), (None,)],
        'v double')
    rows = {r['bin']: (r['lo_edge'], r['hi_edge'], r['n'])
            for r in histogram(df, 'v', 0.0, 100.0, 10).collect()}
    assert rows[0] == (0.0, 10.0, 3)      # -5 clamps in; 9.9; 0.0
    assert rows[1] == (10.0, 20.0, 1)     # 10.0 belongs to bin 1
    assert rows[9] == (90.0, 100.0, 2)    # 95 + clamped 200
    assert sum(n for _, _, n in rows.values()) == 6   # null dropped


def test_funnel_strictly_after_and_stages(spark):
    def ev(eid, u, s, typ):
        return (eid, u, T0 + dt.timedelta(seconds=s), typ)
    rows = [
        ev(1, 1, 0, 'signup'), ev(2, 1, 10, 'click'),
        ev(3, 1, 20, 'purchase'),               # full funnel
        ev(4, 2, 0, 'signup'), ev(5, 2, 10, 'click'),  # stage 2
        ev(6, 3, 0, 'signup'),                  # stage 1
        ev(7, 4, 0, 'click'), ev(8, 4, 10, 'purchase'),  # no signup
        # out-of-order: purchase BEFORE click -> not counted
        ev(9, 5, 0, 'signup'), ev(10, 5, 20, 'click'),
        ev(11, 5, 10, 'purchase'),
        # simultaneous click at signup ts -> NOT strictly after
        ev(12, 6, 0, 'signup'), ev(13, 6, 0, 'click'),
    ]
    df = spark.createDataFrame(
        rows, 'event_id long, user_id long, ts timestamp, '
              'event_type string')
    got = {r['user_id']: r['funnel_stage']
           for r in funnel(df, ('signup', 'click', 'purchase')).collect()}
    assert got == {1: 3, 2: 2, 3: 1, 5: 2, 6: 1}
    with pytest.raises(ValueError):
        funnel(df, ('signup',))


def test_char_entropy_known_values(spark):
    from pytrs_spark.operators.textops import char_entropy_col
    df = spark.createDataFrame(
        [(1, 'aaaa'), (2, 'aabb'), (3, 'abcd'), (4, ''), (5, None)],
        'doc_id long, text string')
    got = {r['doc_id']: r['e']
           for r in df.select('doc_id',
                              char_entropy_col('text').alias('e'))
           .collect()}
    assert got == {1: 0.0, 2: 1.0, 3: 2.0, 4: 0.0, 5: 0.0}
