"""T25 bigram LM score: brute-force parity on a tiny corpus."""

import math
import re
from collections import Counter

import pytest

from pytrs_spark.operators.textops import bigram_lm_score

DOCS = [
    (1, 'the cat sat on the mat'),
    (2, 'the cat sat on the cat'),
    (3, 'colorless green ideas sleep furiously'),
    (4, 'the the the the'),
    (5, 'single'),           # < 2 tokens -> null
    (6, ''),                 # empty -> null
    (7, None),               # null text -> null
    (8, "don't STOP Don't stop"),  # apostrophes + case folding
]


def _brute(k=0.5):
    toks = {i: re.findall(r"[a-z0-9']+", (t or '').lower())
            for i, t in DOCS}
    bigrams = {i: list(zip(t, t[1:])) for i, t in toks.items()}
    c12 = Counter(b for bs in bigrams.values() for b in bs)
    c1 = Counter(b[0] for bs in bigrams.values() for b in bs)
    vocab = len({w for t in toks.values() for w in t})
    out = {}
    for i, bs in bigrams.items():
        if not bs:
            out[i] = None
            continue
        lp = [math.log2((c12[b] + k) / (c1[b[0]] + k * vocab))
              for b in bs]
        out[i] = round(sum(lp) / len(lp), 4)
    return out


def test_lm_score_vs_brute_force(spark):
    df = spark.createDataFrame(DOCS, 'doc_id long, text string')
    got = {r['doc_id']: r['lm_score']
           for r in bigram_lm_score(df, 'text', 'doc_id').collect()}
    brute = _brute()
    assert set(got) == set(brute)
    for i, v in brute.items():
        if v is None:
            assert got[i] is None
        else:
            assert got[i] == pytest.approx(v, abs=2e-4)
    # repeated high-probability bigram scores higher than gibberish
    assert got[4] > got[3]
