"""Bucketed-table co-location: two tables bucketed the same way must
hash-join with ZERO exchange (the plan-time co-partitioning proof
that makes recurring fact-fact joins shuffle-free at 100 TB)."""

import io
import contextlib

import pytest
from pyspark.sql import functions as F

from pytrs_spark.operators.io import write_bucketed


def _plan(df):
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain('formatted')
    return buf.getvalue().split('\n\n')[0]     # tree section only


@pytest.fixture()
def bucketed_pair(spark, tmp_path_factory):
    # session warehouse dir is fixed at session start; tables get
    # unique names instead.
    a = spark.range(10_000).select(
        F.col('id').alias('k'), (F.col('id') * 2).alias('va'))
    b = spark.range(5_000).select(
        F.col('id').alias('k'), (F.col('id') * 3).alias('vb'))
    write_bucketed(a, 'bkt_a', 'k', 8, sort_cols='k')
    write_bucketed(b, 'bkt_b', 'k', 8, sort_cols='k')
    yield spark.table('bkt_a'), spark.table('bkt_b')
    spark.sql('DROP TABLE IF EXISTS bkt_a')
    spark.sql('DROP TABLE IF EXISTS bkt_b')


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    ta, tb = bucketed_pair
    prev = spark.conf.get('spark.sql.autoBroadcastJoinThreshold')
    spark.conf.set('spark.sql.autoBroadcastJoinThreshold', '-1')
    try:
        joined = ta.join(tb, 'k')
        plan = _plan(joined)
        assert 'Exchange' not in plan, plan
        # and the result is still correct
        assert joined.count() == 5_000
        row = joined.filter(F.col('k') == 7).collect()[0]
        assert (row['va'], row['vb']) == (14, 21)
    finally:
        spark.conf.set('spark.sql.autoBroadcastJoinThreshold', prev)


def test_bucketed_groupby_has_no_exchange(spark, bucketed_pair):
    ta, _ = bucketed_pair
    plan = _plan(ta.groupBy('k').agg(F.sum('va')))
    assert 'Exchange' not in plan, plan
