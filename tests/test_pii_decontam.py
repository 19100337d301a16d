"""T26 decontamination + T27 PII masking."""

import re

import duckdb
import pytest

from pytrs_spark.operators.textops import PII_PATTERNS, decontaminate, mask_pii

DOCS = [
    (1, 'the quick brown fox jumps over the lazy dog again and again'),
    (2, 'completely unrelated text with no shared phrases at all here'),
    (3, 'too short'),
    (4, None),
    (5, 'the quick brown fox jumps over the lazy dog '
        'the quick brown fox jumps over the lazy dog'),  # repeated gram
    (6, "Mail bob.smith+x@ex-ample.co.uk, call 555-123-4567 or "
        "+1 212.555.0199, SSN 123-45-6789, host 192.168.0.1."),
]
BENCH = [(100, 'we saw the quick brown fox jumps over the lazy dog run')]


def _tok(t):
    return re.findall(r"[a-z0-9']+", (t or '').lower())


def _grams(t, n):
    toks = _tok(t)
    return {' '.join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


@pytest.mark.parametrize('n', [3, 5, 9])
def test_decontaminate_vs_bruteforce(spark, n):
    docs = spark.createDataFrame(DOCS, 'doc_id long, text string')
    bench = spark.createDataFrame(BENCH, 'doc_id long, text string')
    got = {r['doc_id']: (r['n_hits'], r['contaminated'])
           for r in decontaminate(docs, bench, n=n).collect()}
    bg = set()
    for _, t in BENCH:
        bg |= _grams(t, n)
    for i, t in DOCS:
        hits = len(_grams(t, n) & bg)
        assert got[i] == (hits, hits > 0), f'doc {i} n={n}'


def test_decontaminate_counts_distinct_grams_once(spark):
    docs = spark.createDataFrame(DOCS, 'doc_id long, text string')
    bench = spark.createDataFrame(BENCH, 'doc_id long, text string')
    got = {r['doc_id']: r['n_hits']
           for r in decontaminate(docs, bench, n=9).collect()}
    # doc 5 repeats the 9-gram twice -> still one DISTINCT hit
    assert got[5] == got[1] == 1


def test_mask_pii_kinds(spark):
    docs = spark.createDataFrame(DOCS, 'doc_id long, text string')
    got = {r['doc_id']: r.asDict() for r in mask_pii(docs).collect()}
    r = got[6]
    assert r['n_email'] == 1 and r['n_ssn'] == 1
    assert r['n_phone'] == 2 and r['n_ipv4'] == 1
    assert '<EMAIL>' in r['masked'] and '<SSN>' in r['masked']
    assert '<PHONE>' in r['masked'] and '<IP>' in r['masked']
    assert '555' not in r['masked'] and '@' not in r['masked']
    assert got[4]['masked'] == '' and got[4]['n_email'] == 0
    assert got[1]['masked'] == DOCS[0][1]


def test_pii_patterns_java_re2_parity(spark):
    """The exact pattern strings must behave identically under Java
    regex (engine) and RE2 (DuckDB oracle) -- masked text AND counts."""
    docs = spark.createDataFrame(DOCS, 'doc_id long, text string')
    eng = {r['doc_id']: r.asDict() for r in mask_pii(docs).collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE d AS SELECT * FROM (VALUES "
                + ','.join('(?, ?)' for _ in DOCS) + ") t(doc_id, text)",
                [x for row in DOCS for x in row])
    masked = "coalesce(text, '')"
    sel = []
    for kind, pat, repl in PII_PATTERNS:
        p = pat.replace("'", "''")
        sel.append("len(regexp_extract_all(coalesce(text, ''), "
                   f"'{p}')) AS n_{kind}")
        masked = f"regexp_replace({masked}, '{p}', '{repl}', 'g')"
    rows = con.execute(
        f"SELECT doc_id, {masked} AS masked, {', '.join(sel)} FROM d"
    ).fetchall()
    for row in rows:
        i = row[0]
        assert eng[i]['masked'] == row[1], f'doc {i} masked text'
        for j, (kind, _, _) in enumerate(PII_PATTERNS):
            assert eng[i][f'n_{kind}'] == row[2 + j], f'doc {i} {kind}'
