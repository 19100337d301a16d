"""Deterministic hash sampling + Gopher-style repetition metrics.

Sampling must be a function of the KEY only (never partitioning or
run order), near-uniform at every rate, and exhaustive/disjoint for
split assignment.  Repetition metrics are pinned against hand-derived
golden values (the DuckDB oracle in __spark_entry__ re-derives the
same spec independently).
"""

import pytest
from pyspark.sql import functions as F

from pytrs_spark.operators.sampling import (
    assign_split, hash_mix, sample_by_hash, stratified_sample)
from pytrs_spark.operators.textops import repetition_metrics

_M31 = (1 << 31) - 1


def _mix_py(k: int, salt: int = 0) -> int:
    """Independent plain-Python re-implementation of the documented
    mix spec (the test's oracle for the column expression)."""
    h0 = (k + salt) % _M31
    h1 = (h0 * 1299709 + 2654435761) % _M31
    h2 = h1 ^ (h1 >> 16)
    h3 = (h2 * 1000003 + 12345) % _M31
    return h3 ^ (h3 >> 8)


def test_hash_mix_matches_spec(spark):
    keys = [0, 1, 2, 17, 12345, 2**31 - 2, 2**40 + 7]
    df = spark.createDataFrame([(k,) for k in keys], 'k long')
    got = {r['k']: r['h'] for r in
           df.select('k', hash_mix('k', salt=9).alias('h')).collect()}
    for k in keys:
        assert got[k] == _mix_py(k, salt=9)


def test_sample_stable_under_repartition(spark):
    df = spark.range(20_000).withColumnRenamed('id', 'doc_id')
    a = {r['doc_id'] for r in
         sample_by_hash(df, 'doc_id', 0.05).collect()}
    b = {r['doc_id'] for r in
         sample_by_hash(df.repartition(17, 'doc_id'), 'doc_id', 0.05)
         .collect()}
    assert a == b and len(a) > 0


def test_sample_rate_uniformity(spark):
    n = 1_000_000
    df = spark.range(n).withColumnRenamed('id', 'doc_id')
    for rate in (0.1, 0.01, 0.001):
        kept = sample_by_hash(df, 'doc_id', rate).count()
        assert abs(kept - rate * n) < 0.015 * rate * n + 50, \
            (rate, kept)


def test_sample_salts_decorrelate(spark):
    n = 100_000
    df = spark.range(n).withColumnRenamed('id', 'doc_id')
    a = {r['doc_id'] for r in
         sample_by_hash(df, 'doc_id', 0.1, salt=1).collect()}
    b = {r['doc_id'] for r in
         sample_by_hash(df, 'doc_id', 0.1, salt=2).collect()}
    # Independent 10% samples overlap ~1%; generous bound.
    assert len(a & b) < 0.03 * n


def test_assign_split_exhaustive_disjoint(spark):
    n = 50_000
    df = spark.range(n).withColumnRenamed('id', 'doc_id')
    out = assign_split(df, 'doc_id', {'train': 0.8, 'val': 0.1,
                                      'test': 0.1})
    counts = {r['split']: r['count'] for r in
              out.groupBy('split').count().collect()}
    assert set(counts) == {'train', 'val', 'test'}
    assert sum(counts.values()) == n
    assert abs(counts['train'] - 0.8 * n) < 0.02 * n
    # Split membership is consistent with sample_by_hash at the same
    # salt: the train split IS the first 80% of hash space.
    train = {r['doc_id'] for r in
             out.filter(F.col('split') == 'train').collect()}
    sampled = {r['doc_id'] for r in
               sample_by_hash(df, 'doc_id', 0.8).collect()}
    assert train == sampled


def test_stratified_quota_and_determinism(spark):
    df = (spark.range(30_000).withColumnRenamed('id', 'doc_id')
          .withColumn('g', F.col('doc_id') % 11))
    out1 = stratified_sample(df, 'g', 7, 'doc_id')
    counts = {r['g']: r['count'] for r in
              out1.groupBy('g').count().collect()}
    assert all(c == 7 for c in counts.values()) and len(counts) == 11
    ids1 = {r['doc_id'] for r in out1.collect()}
    ids2 = {r['doc_id'] for r in
            stratified_sample(df.repartition(13), 'g', 7, 'doc_id')
            .collect()}
    assert ids1 == ids2
    # Small stratum: quota larger than the stratum keeps all rows.
    tiny = df.filter(F.col('doc_id') < 5)
    assert stratified_sample(tiny, 'g', 7, 'doc_id').count() == 5


def test_repetition_metrics_golden(spark):
    df = spark.createDataFrame([
        (0, 'a b\na b\nc d'),
        (1, 'hello world hello world hello'),
        (2, ''),
        (3, None),
        (4, 'x\n\nx\ny'),
        (5, 'one-token'),
    ], 'doc_id long, text string')
    got = {r['doc_id']: r for r in
           repetition_metrics(df).collect()}
    # doc 0: 3 lines, 'a b' twice -> 1/3 dup lines; chars 3+3+3, dup
    # occurrence chars 3 -> 1/3; top 2-gram 'a b' (2x, len 3) of 11
    # chars.
    assert got[0]['dup_line_frac'] == pytest.approx(1 / 3)
    assert got[0]['dup_line_char_frac'] == pytest.approx(3 / 9)
    assert got[0]['top_2gram_char_frac'] == pytest.approx(6 / 11)
    # doc 1: no newlines; 'hello world' 2x, len 11, text len 29.
    assert got[1]['dup_line_frac'] == 0.0
    assert got[1]['top_2gram_char_frac'] == pytest.approx(22 / 29)
    # degenerate docs: all-zero, never null.
    for d in (2, 3, 5):
        assert got[d]['dup_line_frac'] == 0.0
        assert got[d]['dup_line_char_frac'] == 0.0
    # doc 5 is a single 2-gram 'one token' (9 chars of 9).
    assert got[5]['top_2gram_char_frac'] == pytest.approx(1.0)
    # doc 4: empty line dropped; 'x' twice of 3 lines.
    assert got[4]['dup_line_frac'] == pytest.approx(1 / 3)


def test_repetition_metrics_flags_boilerplate(spark):
    """The operator's purpose: a templated/spam doc scores far above
    a varied doc on every channel."""
    spam = ('click here to win\n' * 40) + 'prize prize prize ' * 30
    clean = ('The quick brown fox jumps over the lazy dog. '
             'Pack my box with five dozen liquor jugs.\n'
             'Sphinx of black quartz, judge my vow.')
    df = spark.createDataFrame([(0, spam), (1, clean)],
                               'doc_id long, text string')
    got = {r['doc_id']: r for r in repetition_metrics(df).collect()}
    assert got[0]['dup_line_frac'] > 0.9 > got[1]['dup_line_frac']
    assert (got[0]['top_2gram_char_frac']
            > 0.2 > got[1]['top_2gram_char_frac'])


# ------------------------------------------------------------- T32

def _py_race(key, wt, m31=(1 << 31) - 1):
    def mix(k, salt):
        h0 = (k + salt) % m31
        h1 = (h0 * 1299709 + 2654435761) % m31
        h2 = h1 ^ (h1 >> 16)
        h3 = (h2 * 1000003 + 12345) % m31
        return h3 ^ (h3 >> 8)
    base = mix(key, 0)
    return min(mix(base * 65536 + c, 15485863) for c in range(wt))


def test_weighted_sample_matches_python_spec(spark):
    from pytrs_spark.operators.sampling import weighted_sample
    rows = [(i, 1 + (i * 7) % 9) for i in range(500)]
    df = spark.createDataFrame(rows, 'k long, wt long')
    got = [(r['k'], r['race'])
           for r in weighted_sample(df, 'k', 'wt', k=25).collect()]
    want = sorted(((_py_race(k, w), k) for k, w in rows))[:25]
    assert got == [(k, race) for race, k in want]


def test_weighted_sample_favors_heavy_rows(spark):
    from pyspark.sql import functions as F
    from pytrs_spark.operators.sampling import weighted_sample
    # 5000 weight-1 rows + 5000 weight-20 rows: heavy rows should
    # take ~20/21 of a 400-row sample (binomial sd ~8; allow wide).
    df = spark.range(10_000).select(
        F.col('id').alias('k'),
        F.when(F.col('id') % 2 == 0, 20).otherwise(1).alias('wt'))
    heavy = sum(1 for r in weighted_sample(df, 'k', 'wt', 400).collect()
                if r['k'] % 2 == 0)
    assert heavy > 330, heavy


def test_weighted_sample_clamps_and_stability(spark):
    from pytrs_spark.operators.sampling import weighted_sample
    df = spark.createDataFrame(
        [(1, 0), (2, -5), (3, None), (4, 10**9)],
        'k long, wt long')
    out = weighted_sample(df, 'k', 'wt', k=4, max_weight=8)
    rows = {r['k']: r['race'] for r in out.collect()}
    # w<=0 / null clamp to 1; huge clamps to max_weight=8
    assert rows[1] == _py_race(1, 1)
    assert rows[2] == _py_race(2, 1)
    assert rows[4] == _py_race(4, 8)
    # stable under repartitioning
    out2 = weighted_sample(df.repartition(7), 'k', 'wt', k=4,
                           max_weight=8)
    assert {r['k']: r['race'] for r in out2.collect()} == rows


def test_weighted_sample_unroll_matches_hof_path(spark):
    # max_weight <= _UNROLL_CAP takes the codegen least() chain,
    # above it the HOF array_min path: same spec, identical winners.
    from pytrs_spark.operators.sampling import weighted_sample
    rows = [(i, 1 + (i * 11) % 30) for i in range(800)]
    df = spark.createDataFrame(rows, 'k long, wt long')
    fast = [(r['k'], r['race'])
            for r in weighted_sample(df, 'k', 'wt', k=40,
                                     max_weight=32).collect()]
    slow = [(r['k'], r['race'])
            for r in weighted_sample(df, 'k', 'wt', k=40,
                                     max_weight=4096).collect()]
    assert fast == slow
    want = sorted(((_py_race(k, min(w, 32)), k) for k, w in rows))[:40]
    assert fast == [(k, race) for race, k in want]


def test_weighted_sample_threshold_retry_exact(spark, monkeypatch):
    # Margin 1 makes the first survivor threshold E[survivors] == k,
    # so the retry branch is live (and taken for roughly half of key
    # layouts); whichever branch runs, the bottom-k must equal the
    # full-sort answer.
    import pytrs_spark.operators.sampling as S
    monkeypatch.setattr(S, '_SURVIVOR_MARGIN', 1)
    rows = [(i, 1 + i % 4) for i in range(2000)]
    df = spark.createDataFrame(rows, 'k long, wt long')
    got = [(r['k'], r['race'])
           for r in S.weighted_sample(df, 'k', 'wt', k=500,
                                      max_weight=4).collect()]
    want = sorted(((_py_race(k, min(w, 4)), k) for k, w in rows))[:500]
    assert got == [(k, race) for race, k in want]


def test_weighted_sample_k_exceeds_rows(spark):
    # threshold escalation terminates at the full hash range and
    # returns every row when k > n.
    from pytrs_spark.operators.sampling import weighted_sample
    df = spark.createDataFrame([(1, 3), (2, 1)], 'k long, wt long')
    out = weighted_sample(df, 'k', 'wt', k=10, max_weight=8)
    assert sorted(r['k'] for r in out.collect()) == [1, 2]


def _mix_strs(keys, salt):
    # mixture_sample hashes the key column; for string keys the mix
    # runs over xxhash64 -- here tests use long keys so _mix_py holds.
    return {k: _mix_py(k, salt) for k in keys}


def test_mixture_sample_quotas_and_parity(spark):
    from pytrs_spark.operators.sampling import mixture_sample
    rows = [(i, ('en', 'de', 'fr', 'zh')[i % 10 % 4 if i % 10 < 8
                                         else 3]) for i in range(4000)]
    # skewed groups: en/de/fr from i%10<8 cycling, zh the rest
    df = spark.createDataFrame(rows, 'doc_id long, lang string')
    targets = {'en': 0.5, 'de': 0.3, 'fr': 0.2}
    out = mixture_sample(df, 'lang', 'doc_id', targets,
                         budget=300, salt=7)
    got = {r['lang']: r['doc_id'] for r in
           out.groupBy('lang').agg(F.count('*').alias('doc_id'))
           .collect()}
    assert got == {'en': 150, 'de': 90, 'fr': 60}  # floor(share*B)
    # zh dropped entirely (absent from targets)
    # brute-force parity: bottom-quota by (mix hash, key) per group
    by_lang = {}
    for k, lang in rows:
        by_lang.setdefault(lang, []).append(k)
    mix = _mix_strs([k for k, _ in rows], 7)
    want = set()
    for lang, quota in (('en', 150), ('de', 90), ('fr', 60)):
        ordered = sorted(by_lang[lang], key=lambda k: (mix[k], k))
        want |= set(ordered[:quota])
    assert {r['doc_id'] for r in out.collect()} == want


def test_mixture_sample_caps_and_stability(spark):
    from pytrs_spark.operators.sampling import mixture_sample
    rows = [(i, 'big' if i < 900 else 'tiny') for i in range(1000)]
    df = spark.createDataFrame(rows, 'doc_id long, lang string')
    # tiny has 100 rows but quota 200 -> capped to all 100
    out = mixture_sample(df, 'lang', 'doc_id',
                         {'big': 0.5, 'tiny': 0.5}, budget=400, salt=1)
    counts = {r['lang']: r['n'] for r in
              out.groupBy('lang').agg(F.count('*').alias('n'))
              .collect()}
    assert counts == {'big': 200, 'tiny': 100}
    # selection is a pure function of the key: repartitioning noise
    # must not change the kept set
    out2 = mixture_sample(df.repartition(13), 'lang', 'doc_id',
                          {'big': 0.5, 'tiny': 0.5}, budget=400,
                          salt=1)
    assert (sorted(r['doc_id'] for r in out.collect())
            == sorted(r['doc_id'] for r in out2.collect()))


def test_mixture_sample_retry_escalation_exact(spark, monkeypatch):
    # margin 1 forces the short-group rescan loop; result must still
    # equal the brute-force bottom-quota answer.
    import pytrs_spark.operators.sampling as S
    monkeypatch.setattr(S, '_SURVIVOR_MARGIN', 1)
    rows = [(i, 'a' if i % 2 == 0 else 'b') for i in range(2000)]
    df = spark.createDataFrame(rows, 'doc_id long, lang string')
    out = S.mixture_sample(df, 'lang', 'doc_id',
                           {'a': 0.6, 'b': 0.4}, budget=500, salt=3)
    mix = {k: _mix_py(k, 3) for k, _ in rows}
    want = set()
    for lang, quota in (('a', 300), ('b', 200)):
        ks = [k for k, g in rows if g == lang]
        want |= set(sorted(ks, key=lambda k: (mix[k], k))[:quota])
    assert {r['doc_id'] for r in out.collect()} == want


def test_mixture_sample_weighted_parity(spark):
    # Token-budgeted mode: each group keeps the minimal (h, key)
    # prefix whose cumulative weight reaches its quota (the crossing
    # row is included -- closes within one row of target).
    from pytrs_spark.operators.sampling import mixture_sample
    rows = [(i, 'a' if i % 3 else 'b', 1 + (i * 7) % 50)
            for i in range(3000)]
    df = spark.createDataFrame(rows, 'doc_id long, lang string, '
                                     'n_tok long')
    targets = {'a': 0.7, 'b': 0.3}
    out = mixture_sample(df, 'lang', 'doc_id', targets, budget=20_000,
                         salt=5, weight_col='n_tok')
    got = {r['doc_id'] for r in out.collect()}
    mix = {k: _mix_py(k, 5) for k, _, _ in rows}
    want = set()
    for lang, quota in (('a', 14_000), ('b', 6_000)):
        cum = 0
        for k, g, wt in sorted(rows, key=lambda r: (mix[r[0]], r[0])):
            if g != lang:
                continue
            if cum < quota:
                want.add(k)
            cum += wt
    assert got == want
    # each group's kept mass lands within one row of its quota
    kept = {r['lang']: r['m'] for r in
            out.groupBy('lang').agg(F.sum('n_tok').alias('m'))
            .collect()}
    for lang, quota in (('a', 14_000), ('b', 6_000)):
        assert quota <= kept[lang] < quota + 50


def test_mixture_sample_weighted_cap_and_validation(spark):
    from pytrs_spark.operators.sampling import mixture_sample
    df = spark.createDataFrame(
        [(1, 'a', 10), (2, 'a', 10), (3, 'b', 5)],
        'doc_id long, lang string, n_tok long')
    # quota far above group mass -> whole group kept
    out = mixture_sample(df, 'lang', 'doc_id', {'a': 1.0},
                         budget=10_000, weight_col='n_tok')
    assert sorted(r['doc_id'] for r in out.collect()) == [1, 2]
    # negative weights rejected up front
    bad = spark.createDataFrame([(1, 'a', -3)],
                                'doc_id long, lang string, n_tok long')
    with pytest.raises(ValueError):
        mixture_sample(bad, 'lang', 'doc_id', {'a': 1.0}, budget=10,
                       weight_col='n_tok')


def test_mixture_sample_plan_single_exchange(spark):
    # 100-TB contract: the returned plan's only exchange is the one
    # hash partition on the group key for the survivor window -- the
    # corpus never sorts globally, and the survivor filter (hash
    # threshold) sits in the scan stage below it.
    import contextlib
    import io as _io
    import re
    from pytrs_spark.operators.sampling import mixture_sample
    df = spark.range(50_000).select(
        F.col('id').alias('doc_id'),
        (F.col('id') % 5).cast('string').alias('lang'),
        (F.col('id') % 37 + 1).alias('n_tok'))
    out = mixture_sample(df, 'lang', 'doc_id',
                         {'0': 0.5, '1': 0.5}, budget=40_000,
                         salt=2, weight_col='n_tok')
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain('formatted')
    p = buf.getvalue()
    assert len(re.findall(r'\(\d+\) Exchange\b', p)) == 1
    assert 'BatchEvalPython' not in p and 'ArrowEval' not in p
    # no global sort: the only Sort is the window's partition-local one
    assert 'Exchange rangepartitioning' not in p


def test_mixture_sample_zero_mass_group_drops(spark):
    # A group whose total weight is 0 has no mass to contribute to a
    # weight-denominated budget: it drops entirely (documented).
    from pytrs_spark.operators.sampling import mixture_sample
    df = spark.createDataFrame(
        [(1, 'a', 0), (2, 'a', 0), (3, 'b', 5), (4, 'b', 7)],
        'doc_id long, lang string, n_tok long')
    out = mixture_sample(df, 'lang', 'doc_id', {'a': 0.5, 'b': 0.5},
                         budget=12, weight_col='n_tok')
    assert sorted(r['doc_id'] for r in out.collect()) == [3, 4]
