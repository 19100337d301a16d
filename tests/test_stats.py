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


# --- Count-Min sketch (T22) -------------------------------------------

def _freq_table(spark):
    """Deterministic skewed frequencies: key k appears (k % 7) + 1
    times, keys 0..199."""
    df = spark.range(200).select(
        F.explode(F.sequence(F.lit(1), F.col('id') % 7 + 1)).alias('_'),
        F.col('id').alias('k'))
    true = {k: (k % 7) + 1 for k in range(200)}
    return df, true


def test_cms_never_undercounts_and_bounds(spark):
    from pytrs_spark.operators.stats import cms_lookup, cms_sketch
    df, true = _freq_table(spark)
    n_total = sum(true.values())
    sk = cms_sketch(df, 'k', depth=4, width=64)
    # Every depth row partitions ALL events: per-d totals == N.
    per_d = {r['d']: r['s'] for r in
             sk.groupBy('d').agg(F.sum('n').alias('s')).collect()}
    assert per_d == {d: n_total for d in range(4)}
    keys = df.select('k').distinct()
    est = {r['k']: r['freq_est'] for r in
           cms_lookup(sk, keys, 'k', depth=4, width=64).collect()}
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t, (k, est[k], t)
    # CMS guarantee: overcount <= e/width * N with prob 1 - 2^-depth;
    # allow the full bound plus slack for the 1/16 tail.
    import math
    bound = math.e / 64 * n_total
    over = [est[k] - t for k, t in true.items()]
    assert sum(o <= bound for o in over) >= 0.9 * len(over)


def test_cms_merge_equals_whole(spark):
    from pytrs_spark.operators.stats import cms_merge, cms_sketch
    df, _ = _freq_table(spark)
    a = df.filter(F.col('k') < 100)
    b = df.filter(F.col('k') >= 100)
    whole = {(r['d'], r['register']): r['n'] for r in
             cms_sketch(df, 'k', depth=3, width=32).collect()}
    merged = {(r['d'], r['register']): r['n'] for r in
              cms_merge(cms_sketch(a, 'k', depth=3, width=32),
                        cms_sketch(b, 'k', depth=3, width=32)).collect()}
    assert merged == whole


def test_cms_rejects_bad_params(spark):
    from pytrs_spark.operators.stats import cms_sketch
    df = spark.range(3).withColumnRenamed('id', 'k')
    with pytest.raises(ValueError):
        cms_sketch(df, 'k', depth=0)
    with pytest.raises(ValueError):
        cms_sketch(df, 'k', width=1)


# --- exact multi-pass quantiles (T23) ---------------------------------

def _rank_value(vals, q):
    import math
    s = sorted(vals)
    return s[int(math.floor(q * (len(s) - 1)))]


def test_quantiles_exact_matches_full_sort(spark):
    from pytrs_spark.operators.stats import quantiles_exact
    # deterministic pseudo-random doubles incl. duplicates
    df = spark.range(5000).select(
        (((F.col('id') * 1299709) % 9973).cast('double') / 7.0)
        .alias('v'))
    vals = [r['v'] for r in df.collect()]
    qs = (0.0, 0.1, 0.5, 0.9, 0.99, 1.0)
    # collect_limit far below n forces >= 2 narrowing passes
    got = dict((r['q'], r['value']) for r in quantiles_exact(
        df, 'v', qs, n_bins=16, collect_limit=100).collect())
    for q in qs:
        assert got[q] == _rank_value(vals, q), q


def test_quantiles_heavy_duplicate_converges(spark):
    from pytrs_spark.operators.stats import quantiles_exact
    # 90% of rows are a single value: the containing bin never
    # shrinks -> the shrunk=False branch must resolve exactly.
    df = spark.range(2000).select(
        F.when(F.col('id') % 10 < 9, F.lit(42.0))
        .otherwise(F.col('id').cast('double')).alias('v'))
    vals = [r['v'] for r in df.collect()]
    got = dict((r['q'], r['value']) for r in quantiles_exact(
        df, 'v', (0.5, 0.95), n_bins=8, collect_limit=50).collect())
    assert got[0.5] == _rank_value(vals, 0.5) == 42.0
    assert got[0.95] == _rank_value(vals, 0.95)


def test_quantiles_edge_inputs(spark):
    from pytrs_spark.operators.stats import quantiles_exact
    empty = spark.range(0).select(F.col('id').cast('double').alias('v'))
    rows = quantiles_exact(empty, 'v', (0.5,)).collect()
    assert rows[0]['value'] is None
    one = spark.range(5).select(F.lit(7.0).alias('v'))
    rows = quantiles_exact(one, 'v', (0.0, 1.0)).collect()
    assert [r['value'] for r in rows] == [7.0, 7.0]
    nulls = spark.range(10).select(
        F.when(F.col('id') < 5, F.col('id').cast('double')).alias('v'))
    rows = quantiles_exact(nulls, 'v', (1.0,)).collect()
    assert rows[0]['value'] == 4.0     # nulls excluded
    with pytest.raises(ValueError):
        quantiles_exact(one, 'v', (1.5,))


# ------------------------------------------------------------- Bloom

_M31 = (1 << 31) - 1


def _py_mix(k, salt=0):
    h0 = (k + salt) % _M31
    h1 = (h0 * 1299709 + 2654435761) % _M31
    h2 = h1 ^ (h1 >> 16)
    h3 = (h2 * 1000003 + 12345) % _M31
    return h3 ^ (h3 >> 8)


def _py_bloom(keys, n_words, depth, salt=0):
    words = {}
    for k in keys:
        for d in range(depth):
            pos = _py_mix(k, salt + d * 104729) % (n_words * 32)
            words[pos // 32] = words.get(pos // 32, 0) \
                | (1 << (pos % 32))
    return words


def test_bloom_sketch_bit_identical(spark):
    from pytrs_spark.operators.stats import bloom_sketch
    keys = [3, 17, 17, 9999, 123456789, 0]
    df = spark.createDataFrame([(k,) for k in keys], 'k long')
    got = {r['word']: r['bits']
           for r in bloom_sketch(df, 'k', n_words=8, depth=3).collect()}
    assert got == _py_bloom(set(keys), 8, 3)


def test_bloom_no_false_negatives_and_fp_rate(spark):
    from pytrs_spark.operators.stats import bloom_contains, bloom_sketch
    members = spark.range(0, 2000).withColumnRenamed('id', 'k')
    sk = bloom_sketch(members, 'k', n_words=512, depth=4)
    probes = spark.range(0, 4000).withColumnRenamed('id', 'k')
    rows = {r['k']: r['might_contain']
            for r in bloom_contains(sk, probes, 'k',
                                    n_words=512, depth=4).collect()}
    assert all(rows[k] for k in range(2000))          # no false negs
    fp = sum(rows[k] for k in range(2000, 4000)) / 2000
    # design rate ~ (1 - e^(-4*2000/16384))^4 ~ 2.2%; allow slack
    assert fp < 0.08, fp


def test_bloom_merge_equals_union_build(spark):
    from pytrs_spark.operators.stats import bloom_merge, bloom_sketch
    a = spark.range(0, 300).withColumnRenamed('id', 'k')
    b = spark.range(250, 600).withColumnRenamed('id', 'k')
    merged = {r['word']: r['bits'] for r in bloom_merge(
        bloom_sketch(a, 'k', n_words=16, depth=4),
        bloom_sketch(b, 'k', n_words=16, depth=4)).collect()}
    direct = {r['word']: r['bits'] for r in bloom_sketch(
        a.unionByName(b), 'k', n_words=16, depth=4).collect()}
    assert merged == direct


def test_bloom_null_keys_dropped(spark):
    from pytrs_spark.operators.stats import bloom_sketch
    df = spark.createDataFrame([(1,), (None,)], 'k long')
    ref = spark.createDataFrame([(1,)], 'k long')
    got = {(r['word'], r['bits'])
           for r in bloom_sketch(df, 'k', n_words=4, depth=2).collect()}
    want = {(r['word'], r['bits'])
            for r in bloom_sketch(ref, 'k', n_words=4, depth=2).collect()}
    assert got == want


def test_bloom_contains_zero_shuffle_plan(spark):
    from pytrs_spark.operators.stats import bloom_contains, bloom_sketch
    members = spark.range(0, 100).withColumnRenamed('id', 'k')
    sk = bloom_sketch(members, 'k', n_words=8, depth=3)
    probes = spark.range(0, 50).withColumnRenamed('id', 'k') \
        .withColumn('payload', F.col('k') * 2)
    out = bloom_contains(sk, probes, 'k', n_words=8, depth=3)
    # probe columns ride through; no shuffle exchange on the probe
    # side (broadcast exchanges for the sketch are expected)
    assert 'payload' in out.columns
    plan = out._jdf.queryExecution().executedPlan().toString()
    probe_side = plan.split('BroadcastExchange')[0]
    assert 'Exchange hashpartitioning' not in probe_side, probe_side


def test_quantiles_outlier_skew_reseeds_not_collects(spark):
    """A huge outlier makes every level-1 bin width dwarf the data
    cluster, so the cluster slice cannot shrink under the PARENT's
    geometry -- the re-seed branch must narrow from the slice's own
    min/max instead of collecting the whole cluster by value
    (driver-OOM shape at scale)."""
    from pyspark.sql import functions as F
    from pytrs_spark.operators.stats import quantiles_exact
    # 40k distinct values in [0, 4e-6) plus one outlier at 1e9
    df = spark.range(40_000).select(
        (F.col('id') * 1e-10).alias('v')).unionByName(
        spark.range(1).select(F.lit(1e9).alias('v')))
    got = {r['q']: r['value'] for r in quantiles_exact(
        df, 'v', (0.0, 0.5, 1.0), n_bins=64,
        collect_limit=256).collect()}
    import math
    k50 = math.floor(0.5 * (40_001 - 1)) + 1       # rank 20001
    assert got[0.0] == 0.0
    assert got[0.5] == (k50 - 1) * 1e-10
    assert got[1.0] == 1e9


def test_quantiles_nan_and_null_excluded(spark):
    from pyspark.sql import functions as F
    from pytrs_spark.operators.stats import quantiles_exact
    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (None,), (float('nan'),)],
        'v double')
    got = {r['q']: r['value'] for r in quantiles_exact(
        df, 'v', (0.0, 0.5, 1.0)).collect()}
    assert got == {0.0: 1.0, 0.5: 2.0, 1.0: 3.0}


def test_hll_cms_null_keys_dropped(spark):
    from pyspark.sql import functions as F
    from pytrs_spark.operators.stats import (
        cms_sketch, hll_estimate, hll_sketch)
    df = spark.createDataFrame(
        [(1,), (2,), (None,), (2,)], 'k long')
    sk = hll_sketch(df, 'k', p=6)
    assert sk.filter(F.col('register').isNull()).count() == 0
    est = hll_estimate(sk, p=6)           # must not crash on nulls
    assert 1 <= est <= 4
    cm = cms_sketch(df, 'k', depth=2, width=16)
    assert cm.filter(F.col('register').isNull()).count() == 0
    assert cm.agg(F.sum('n')).collect()[0][0] == 6   # 3 keys x 2 depths
