"""ExactSubstr dedup spans (textops.exact_substr_spans).

Semantics under test (Lee et al. 2022, "Deduplicating Training Data
Makes Language Models Better", re-expressed corpus-wide):

- a window of length W over the NORMALIZED text (lower; collapse of
  the PINNED ASCII whitespace class [ \\t\\n\\r\\f\\x0b] -- Java, RE2
  and Python \\s all disagree at the margins, so the spec names its
  characters; trim; right-pad to W) is duplicated iff it occurs at
  >= 2 (doc, pos) positions corpus-wide -- within-doc repeats count;
- duplicated window positions merge into maximal spans (merge iff
  they overlap or touch: next_pos - prev_pos <= W);
- offsets are 0-based half-open over the normalized padded text.

The brute-force reference below keys on the literal substring, so it
also cross-checks that the rolling-hash equivalence classes match
string equality (no collision on the crafted corpus).
"""

import re

import pytest

from pytrs_spark.operators import textops


def _norm(t, w):
    t = '' if t is None else t
    t = re.sub(r'[ \t\n\r\f\x0b]+', ' ', t.lower()).strip(' ')
    return t.ljust(w)


def _brute_spans(docs, w):
    from collections import Counter
    counts = Counter()
    wins = {}
    for doc_id, text in docs:
        t = _norm(text, w)
        ws = [t[i:i + w] for i in range(len(t) - w + 1)]
        wins[doc_id] = ws
        counts.update(ws)
    spans = set()
    for doc_id, ws in wins.items():
        dup_pos = [i for i, s in enumerate(ws) if counts[s] >= 2]
        if not dup_pos:
            continue
        begin = prev = dup_pos[0]
        for p in dup_pos[1:]:
            if p - prev > w:
                spans.add((doc_id, begin, prev + w, prev + w - begin))
                begin = p
            prev = p
        spans.add((doc_id, begin, prev + w, prev + w - begin))
    return spans


CORPUS = [
    # shared sentence across docs 1/2 (cross-doc dup), distinct tails
    (1, 'The quick brown fox jumps over the lazy dog near the river'),
    (2, 'Intro text here. The quick brown fox jumps over the lazy '
        'dog and then leaves'),
    # doc 3: within-doc repeat only (the phrase repeats inside one doc)
    (3, 'repeat me exactly once more repeat me exactly once more '
        'and some unique ending here'),
    # doc 4: whitespace/case variant of doc 5 (normalization must
    # make them identical)
    (4, 'Common   Boilerplate FOOTER line shared verbatim by pages'),
    (5, 'common boilerplate footer line shared verbatim by pages'),
    # unique doc: no spans
    (6, 'zq xv jk wm pl completely unrepeated content 0123456789'),
    # short docs below the window: padded; identical -> duplicated
    (7, 'tiny'),
    (8, 'tiny'),
    # null text normalizes to all-pad; only duplicated if another
    # all-pad doc exists -- it does not, so no span
    (9, None),
    # Unicode whitespace (\xa0 nbsp, 　 ideographic space) is
    # CONTENT under the pinned ASCII class -- the span kernel, the
    # JVM trim splice, and the brute-force reference must all treat
    # it identically (a Python-\s kernel vs Java-\s splice shifts
    # offsets and deletes the wrong characters -- regression test).
    (10, 'aa \xa0 bb SHARED DUP RUN HERE OK tail one'),
    (11, 'cc　dd SHARED DUP RUN HERE OK tail two'),
]

W = 24


@pytest.fixture(scope='module')
def spans(spark):
    df = spark.createDataFrame(CORPUS, 'doc_id long, text string')
    out = textops.exact_substr_spans(df, window=W)
    return {tuple(r) for r in out.collect()}


def test_matches_brute_force(spans):
    assert spans == _brute_spans(CORPUS, W)


def test_cross_doc_and_within_doc_dups_found(spans):
    docs_with_spans = {s[0] for s in spans}
    # cross-doc shared sentence
    assert {1, 2} <= docs_with_spans
    # within-doc repetition alone is enough
    assert 3 in docs_with_spans
    # normalization-equal docs
    assert {4, 5} <= docs_with_spans
    # identical short padded docs
    assert {7, 8} <= docs_with_spans
    # unique + null docs have no spans
    assert 6 not in docs_with_spans
    assert 9 not in docs_with_spans


def test_span_shape(spans):
    for doc_id, begin, end, dup_len in spans:
        assert 0 <= begin < end
        assert dup_len == end - begin
        assert dup_len >= W


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(CORPUS, 'doc_id long, text string')
    a = {tuple(r) for r in textops.exact_substr_spans(
        df.repartition(1), window=W).collect()}
    b = {tuple(r) for r in textops.exact_substr_spans(
        df.repartition(7, 'doc_id'), window=W).collect()}
    assert a == b == _brute_spans(CORPUS, W)


def _brute_trim(docs, w):
    spans = _brute_spans(docs, w)
    out = {}
    for doc_id, text in docs:
        t = _norm(text, w)
        sp = sorted((b, e) for d, b, e, _ in spans if d == doc_id)
        keep, prev = [], 0
        for b, e in sp:
            keep.append(t[prev:b])
            prev = e
        keep.append(t[prev:])
        out[doc_id] = (''.join(keep), len(sp),
                       sum(e - b for b, e in sp))
    return out


def test_trim_matches_brute_force(spark):
    df = spark.createDataFrame(CORPUS, 'doc_id long, text string')
    got = {r['doc_id']: (r['text_kept'], r['n_spans'],
                         r['chars_removed'])
           for r in textops.exact_substr_trim(df, window=W).collect()}
    assert got == _brute_trim(CORPUS, W)


def test_trim_preserves_span_free_docs_and_row_count(spark):
    df = spark.createDataFrame(CORPUS, 'doc_id long, text string')
    out = textops.exact_substr_trim(df, window=W)
    rows = {r['doc_id']: r for r in out.collect()}
    # every input doc comes back exactly once
    assert sorted(rows) == sorted(d for d, _ in CORPUS)
    # span-free doc keeps its full normalized text
    assert rows[6]['text_kept'] == _norm(CORPUS[5][1], W)
    assert rows[6]['n_spans'] == 0 and rows[6]['chars_removed'] == 0
    # fully-duplicated short docs are cut to nothing
    assert rows[7]['text_kept'] == '' and rows[8]['text_kept'] == ''
    # null text normalizes to all-pad, no other all-pad doc -> intact
    assert rows[9]['text_kept'] == ' ' * W


def test_trim_partitioning_invariance(spark):
    df = spark.createDataFrame(CORPUS, 'doc_id long, text string')
    a = {tuple(r) for r in textops.exact_substr_trim(
        df.repartition(1), window=W).collect()}
    b = {tuple(r) for r in textops.exact_substr_trim(
        df.repartition(7, 'doc_id'), window=W).collect()}
    assert a == b


def test_fully_duplicated_doc_is_one_span(spark):
    rows = [(1, 'exactly the same normalized text body here'),
            (2, 'Exactly  THE same normalized text body here')]
    df = spark.createDataFrame(rows, 'doc_id long, text string')
    out = textops.exact_substr_spans(df, window=16).collect()
    n = len(_norm(rows[0][1], 16))
    assert sorted(tuple(r) for r in out) == [
        (1, 0, n, n), (2, 0, n, n)]


def test_trim_plan_text_never_shuffles(spark):
    """Scale-shape pin: the corpus text side of the trim join stays in
    the scan stage -- no hashpartitioning exchange carries the
    normalized text (span lists broadcast back); the splice is native
    (no BatchEvalPython row-UDF node)."""
    df = spark.createDataFrame(CORPUS, 'doc_id long, text string')
    out = textops.exact_substr_trim(df, window=W)
    plan = out._jdf.queryExecution().executedPlan().toString()
    bad = [l for l in plan.splitlines()
           if 'Exchange hashpartitioning' in l
           and ('_t' in l.split('[')[-1] or 'text' in l)]
    assert not bad, bad
    assert 'BatchEvalPython' not in plan
