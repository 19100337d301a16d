"""T24 boilerplate_strip: cross-document repeated-line removal."""

import pytest

from pytrs_spark.operators.textops import boilerplate_strip


def test_boilerplate_strips_shared_lines_keeps_order(spark):
    footer = 'COPYRIGHT 2026 EXAMPLE CORP'
    docs = spark.createDataFrame(
        [(1, f'alpha\n{footer}\nbravo'),
         (2, f'{footer}\ncharlie'),
         (3, f'delta\necho\n{footer}'),
         (4, 'foxtrot only')],
        'doc_id long, text string')
    out = {r['doc_id']: r for r in
           boilerplate_strip(docs, min_docs=3).collect()}
    assert out[1]['text'] == 'alpha\nbravo'
    assert out[2]['text'] == 'charlie'
    assert out[3]['text'] == 'delta\necho'
    assert out[4]['text'] == 'foxtrot only'
    assert out[1]['n_removed'] == 1 and out[1]['n_kept'] == 2
    assert out[4]['n_removed'] == 0


def test_boilerplate_trim_matching_and_threshold(spark):
    # indented variants count as the same line (trimmed key) but the
    # ORIGINAL text of surviving lines is preserved
    docs = spark.createDataFrame(
        [(1, '  menu \nkeep1'),
         (2, 'menu\nkeep2'),
         (3, 'near miss\nkeep3')],
        'doc_id long, text string')
    out = {r['doc_id']: r['text'] for r in
           boilerplate_strip(docs, min_docs=2).collect()}
    assert out == {1: 'keep1', 2: 'keep2', 3: 'near miss\nkeep3'}
    # below threshold nothing is stripped
    out3 = {r['doc_id']: r['text'] for r in
            boilerplate_strip(docs, min_docs=3).collect()}
    assert out3[1] == '  menu \nkeep1'


def test_boilerplate_blank_lines_and_empty_docs_survive(spark):
    docs = spark.createDataFrame(
        [(1, 'a\n\nb'), (2, 'x\n\ny'), (3, ''), (4, None)],
        'doc_id long, text string')
    out = {r['doc_id']: r for r in
           boilerplate_strip(docs, min_docs=2).collect()}
    # blank lines repeat across docs but are below min_chars: kept
    assert out[1]['text'] == 'a\n\nb'
    assert set(out) == {1, 2, 3, 4}          # no row lost
    assert out[3]['text'] == '' and out[4]['text'] == ''
    # repeated in-doc lines don't self-trigger (distinct per doc)
    solo = spark.createDataFrame(
        [(1, 'same\nsame\nsame'), (2, 'other')],
        'doc_id long, text string')
    got = {r['doc_id']: r['text'] for r in
           boilerplate_strip(solo, min_docs=2).collect()}
    assert got[1] == 'same\nsame\nsame'


def test_boilerplate_rejects_bad_threshold(spark):
    docs = spark.createDataFrame([(1, 'x')], 'doc_id long, text string')
    with pytest.raises(ValueError):
        boilerplate_strip(docs, min_docs=1)
