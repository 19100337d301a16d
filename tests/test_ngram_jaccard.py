"""Exact n-gram Jaccard pair join: prefix-filtered == unfiltered ==
brute force, at several thresholds, including the p/q decision
boundary and sub-n short docs."""

import re

import pytest

from pytrs_spark.operators import textops


def _norm(t):
    return re.sub(r'[ \t\n\r\f\x0b]+', ' ', t.lower()).strip(' ')


def _grams(t, n=5):
    t = _norm(t)
    if len(t) < n:
        t = t.ljust(n)
    return {t[i:i + n] for i in range(len(t) - n + 1)}


def _brute(rows, p, q, n=5):
    out = set()
    for i, (ia, ta) in enumerate(rows):
        for ib, tb in rows[i + 1:]:
            a, b = _grams(ta, n), _grams(tb, n)
            if not a or not b:
                continue
            inter = len(a & b)
            union = len(a | b)
            if inter * q >= union * p:
                out.add((min(ia, ib), max(ia, ib), inter, union))
    return out


CORPUS = [
    (1, 'the quick brown fox jumps over the lazy dog'),
    (2, 'the quick brown fox jumps over the lazy cat'),   # near-dup of 1
    (3, 'the quick brown fox jumps over the lazy dog'),   # exact dup of 1
    (4, 'a completely different document about spark'),
    (5, 'a completely different document about sparks'),  # near-dup of 4
    (6, 'ab'),                                            # shorter than n
    (7, 'ab'),                                            # short exact dup
    (8, 'Lorem ipsum dolor sit amet consectetur'),
    (9, 'lorem  IPSUM dolor sit amet consectetur'),       # norm-equal to 8
    (10, 'zzzzzzzzzz'),                                   # single gram
    (11, 'zzzzzzzzzzz'),
    (12, ''),                                             # empty -> 1 gram
]


@pytest.mark.parametrize('threshold', [(4, 5), (1, 2), (1, 5), (1, 1)])
def test_matches_brute_force_both_paths(spark, threshold):
    p, q = threshold
    df = spark.createDataFrame(CORPUS, ['doc_id', 'text'])
    expect = _brute(CORPUS, p, q)
    for pf in (True, False):
        for bmax in (1 << 16, 0):   # bitmap verify vs array verify
            got = {(r.id_a, r.id_b, r.n_inter, r.n_union)
                   for r in textops.ngram_jaccard_pairs(
                       df, threshold=threshold, prefix_filter=pf,
                       bitmap_max_bits=bmax).collect()}
            assert got == expect, (threshold, pf, bmax)


def test_boundary_pair_exactly_at_threshold_is_kept(spark):
    # Construct texts whose gram sets overlap at exactly J = 1/2:
    # |A|=2, |B|=2, inter=... simpler: verify via brute force that at
    # least one corpus pair sits exactly ON some p/q and stays in.
    rows = [(1, 'abcdefgh'), (2, 'abcdeXgh')]
    # grams(1) = {abcde,bcdef,cdefg,defgh} (4); grams(2) = {abcde,
    # bcdeX,cdeXg,deXgh} (4); inter=1, union=7 -> J=1/7 exactly.
    df = spark.createDataFrame(rows, ['doc_id', 'text'])
    got = textops.ngram_jaccard_pairs(df, threshold=(1, 7)).collect()
    assert [(r.id_a, r.id_b, r.n_inter, r.n_union)
            for r in got] == [(1, 2, 1, 7)]
    assert textops.ngram_jaccard_pairs(
        df, threshold=(2, 13)).count() == 0   # 2/13 > 1/7


def test_randomized_prefix_equals_unfiltered(spark):
    import random
    rng = random.Random(42)
    words = ['alpha', 'beta', 'gamma', 'delta', 'epsilon', 'zeta',
             'eta', 'theta', 'spark', 'tile', 'grid', 'dedup']
    rows = []
    for i in range(60):
        base = ' '.join(rng.choices(words, k=rng.randint(2, 10)))
        rows.append((i, base))
        if rng.random() < 0.4:   # planted near-dup
            mut = list(base)
            for _ in range(rng.randint(0, 2)):
                mut[rng.randrange(len(mut))] = rng.choice('abcxyz ')
            rows.append((100 + i, ''.join(mut)))
    df = spark.createDataFrame(rows, ['doc_id', 'text'])
    for threshold in [(4, 5), (3, 5), (1, 2)]:
        expect = _brute(rows, *threshold)
        for bmax in (1 << 16, 0):
            fast = {(r.id_a, r.id_b, r.n_inter, r.n_union)
                    for r in textops.ngram_jaccard_pairs(
                        df, threshold=threshold,
                        bitmap_max_bits=bmax).collect()}
            assert fast == expect, (threshold, bmax)


def test_bad_threshold_rejected(spark):
    df = spark.createDataFrame([(1, 'x')], ['doc_id', 'text'])
    with pytest.raises(ValueError):
        textops.ngram_jaccard_pairs(df, threshold=(0, 5))
    with pytest.raises(ValueError):
        textops.ngram_jaccard_pairs(df, threshold=(6, 5))
