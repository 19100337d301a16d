"""T21 TF-IDF top terms: hand-computed micro-corpus + invariants."""

import math

from pyspark.sql import functions as F

from pytrs_spark.operators.textops import tfidf_top_terms


def test_tfidf_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, 'apple apple banana'),
         (2, 'banana cherry'),
         (3, 'cherry cherry cherry date')],
        'doc_id long, text string')
    out = {(r['doc_id'], r['term']): r for r in
           tfidf_top_terms(docs, k=4).collect()}
    n = 3

    def idf(dfreq):
        return math.log((n + 1) / (dfreq + 1)) + 1

    # doc 1: apple tf=2 df=1, banana tf=1 df=2
    assert out[(1, 'apple')]['tf'] == 2
    assert out[(1, 'apple')]['dfreq'] == 1
    assert out[(1, 'apple')]['score'] == round(2 * idf(1), 6)
    assert out[(1, 'apple')]['rank'] == 1
    assert out[(1, 'banana')]['rank'] == 2
    # doc 3: cherry tf=3 beats date tf=1 (same idf class irrelevant)
    assert out[(3, 'cherry')]['rank'] == 1
    assert out[(3, 'date')]['score'] == round(idf(1), 6)


def test_tfidf_k_limits_and_tie_break(spark):
    docs = spark.createDataFrame(
        [(1, 'zz aa zz aa'),        # tf ties -> term asc wins
         (2, 'solo')],
        'doc_id long, text string')
    rows = tfidf_top_terms(docs, k=1).collect()
    got = {r['doc_id']: r['term'] for r in rows}
    assert got == {1: 'aa', 2: 'solo'}
    assert all(r['rank'] == 1 for r in rows)


def test_tfidf_tokenization_and_empty_docs(spark):
    docs = spark.createDataFrame(
        [(1, "Don't STOP-me; now!"),
         (2, ''),
         (3, None)],
        'doc_id long, text string')
    rows = tfidf_top_terms(docs, k=10).collect()
    terms = {r['term'] for r in rows}
    # lowercased, apostrophe kept, punctuation splits
    assert terms == {"don't", 'stop', 'me', 'now'}
    assert {r['doc_id'] for r in rows} == {1}   # empty docs emit none
    # N still counts the empty docs (idf uses the full corpus size)
    n = 3
    one = [r for r in rows if r['term'] == 'stop'][0]
    assert one['score'] == round(math.log((n + 1) / 2) + 1, 6)
