"""Sequence packing (T28) vs a brute-force reference packer."""

import re

import pytest
from pyspark.sql import functions as F

from pytrs_spark.operators.sampling import _A1, _A2, _B1, _B2, _M31
from pytrs_spark.operators.textops import pack_sequences

TOK = re.compile(r"[a-z0-9']+")


def _mix(k, salt=0):
    h0 = (k + salt) % _M31
    h1 = (h0 * _A1 + _B1) % _M31
    h2 = h1 ^ (h1 >> 16)
    h3 = (h2 * _A2 + _B2) % _M31
    return h3 ^ (h3 >> 8)


def _brute_pack(docs, C, n_shards):
    """Reference: per shard, concatenate token streams in id order and
    chop every C tokens; emit (shard, chunk, id, begin, end) spans."""
    out = set()
    shards = {}
    for i in sorted(docs):
        n = len(TOK.findall((docs[i] or '').lower()))
        if n == 0:
            continue
        shards.setdefault(_mix(i) % n_shards, []).append((i, n))
    for sh, items in shards.items():
        s = 0
        for i, n in items:
            first, last = s // C, (s + n - 1) // C
            for ch in range(first, last + 1):
                b = max(0, ch * C - s)
                e = min(n, (ch + 1) * C - s)
                out.add((sh, ch, i, b, e, e - b))
            s += n
    return out


@pytest.mark.parametrize('C,n_shards', [(8, 3), (5, 1), (1, 2), (64, 4)])
def test_pack_vs_bruteforce(spark, C, n_shards):
    docs = {
        1: 'one two three four five six seven',
        2: 'a b c d e f g h i j k l m n o p q r s t',
        3: '',                        # zero tokens: dropped
        4: None,                      # null text: dropped
        5: 'x ' * 100,                # spans many windows
        6: 'single',
        7: 'Hello, World! 42 things',
        8: "don't stop",
    }
    df = spark.createDataFrame(
        [(k, v) for k, v in docs.items()], 'doc_id long, text string')
    got = {tuple(r) for r in
           pack_sequences(df, C, n_shards=n_shards).collect()}
    assert got == _brute_pack(docs, C, n_shards)


def test_pack_window_invariants(spark):
    """Every window except each shard's last holds exactly C tokens,
    spans tile each doc exactly once, chunk ids are contiguous."""
    C = 32
    df = spark.range(1, 200).select(
        F.col('id').alias('doc_id'),
        F.concat(F.lit('w '), F.repeat(F.lit('tok '), (F.col('id') % 37)
                                       .cast('int'))).alias('text'))
    out = pack_sequences(df, C, n_shards=4).cache()
    per_win = (out.groupBy('shard', 'chunk_id')
               .agg(F.sum('n_tok').alias('w')))
    last = per_win.groupBy('shard').agg(F.max('chunk_id').alias('mx'))
    bad = (per_win.join(last, 'shard')
           .filter((F.col('chunk_id') != F.col('mx'))
                   & (F.col('w') != C)).count())
    assert bad == 0
    # contiguous chunk ids from 0 per shard
    chk = (per_win.groupBy('shard')
           .agg(F.min('chunk_id').alias('mn'), F.max('chunk_id').alias('mx'),
                F.count('*').alias('n')).collect())
    for r in chk:
        assert r['mn'] == 0 and r['n'] == r['mx'] + 1
    # spans tile each doc: begin sorted == [0, e1, e2...), total = n_tok
    doc = (out.groupBy('doc_id')
           .agg(F.sum('n_tok').alias('tot'), F.min('begin_tok').alias('b0'))
           .collect())
    for r in doc:
        assert r['b0'] == 0 and r['tot'] > 0


def test_pack_validation(spark):
    df = spark.createDataFrame([(1, 'a')], 'doc_id long, text string')
    with pytest.raises(ValueError):
        pack_sequences(df, 0)
    with pytest.raises(ValueError):
        pack_sequences(df, 8, n_shards=0)


class TestChunkDocuments:
    def test_basic_overlap(self, spark):
        from pytrs_spark.operators.textops import chunk_documents
        df = spark.createDataFrame(
            [(1, 'a b c d e f g'), (2, 'x  y\t z'), (3, ''),
             (4, None), (5, '   \t'), (6, 'one')],
            'doc_id long, text string')
        out = sorted((tuple(r) for r in
                      chunk_documents(df, 3, 1).collect()))
        assert out == [
            (1, 0, 0, 3, 'a b c'), (1, 1, 2, 3, 'c d e'),
            (1, 2, 4, 3, 'e f g'),
            (2, 0, 0, 3, 'x y z'),   # tail window (start 2) adds no
                                     # new token -> dropped
            (6, 0, 0, 1, 'one'),     # short doc: one short chunk
        ]

    def test_no_overlap_exact_multiple(self, spark):
        from pytrs_spark.operators.textops import chunk_documents
        df = spark.createDataFrame([(1, 'a b c d')],
                                   'doc_id long, text string')
        out = sorted(tuple(r) for r in
                     chunk_documents(df, 2, 0).collect())
        assert out == [(1, 0, 0, 2, 'a b'), (1, 1, 2, 2, 'c d')]

    def test_coverage_no_token_dropped(self, spark):
        from pyspark.sql import functions as F
        from pytrs_spark.operators.textops import chunk_documents
        text = ' '.join(f't{i}' for i in range(53))
        df = spark.createDataFrame([(1, text)], 'doc_id long, text string')
        out = chunk_documents(df, 8, 3)
        # union of [begin, begin+n_tok) must cover 0..52 exactly
        covered = set()
        for r in out.collect():
            covered.update(range(r.begin_tok, r.begin_tok + r.n_tok))
        assert covered == set(range(53))
        # zero exchange, zero UDF
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert 'Exchange' not in plan and 'ArrowEvalPython' not in plan

    def test_validation(self, spark):
        import pytest
        from pytrs_spark.operators.textops import chunk_documents
        df = spark.createDataFrame([(1, 'a')], 'doc_id long, text string')
        with pytest.raises(ValueError):
            chunk_documents(df, 0)
        with pytest.raises(ValueError):
            chunk_documents(df, 4, overlap=4)
        with pytest.raises(ValueError):
            chunk_documents(df, 4, overlap=-1)

    def test_chunk_matches_python_reference_property(self, spark):
        """Random texts/params vs an independent pure-Python chunker:
        same windows, same text, full coverage."""
        from hypothesis import given, settings, strategies as st

        from pytrs_spark.operators.textops import chunk_documents

        def py_chunks(text, max_tokens, overlap):
            toks = [t for t in
                    (text or '').replace('\t', ' ').replace('\n', ' ')
                    .replace('\r', ' ').replace('\f', ' ')
                    .replace('\x0b', ' ').split(' ') if t]
            n, step, out = len(toks), max_tokens - overlap, []
            s = 0
            while s < n and (s == 0 or s + overlap < n):
                w = toks[s:s + max_tokens]
                out.append((s // step, s, len(w), ' '.join(w)))
                s += step
            return out

        word = st.text(alphabet='abc', min_size=1, max_size=3)
        sep = st.sampled_from([' ', '  ', '\t', '\n', ' \x0b '])
        texts = st.lists(word, min_size=0, max_size=30).flatmap(
            lambda ws: st.lists(sep, min_size=max(len(ws) - 1, 0),
                                max_size=max(len(ws) - 1, 0)).map(
                lambda ss: ''.join(
                    w + s for w, s in zip(ws, ss + [''])))
        )

        @settings(max_examples=8, deadline=None)
        @given(st.lists(texts, min_size=1, max_size=6),
               st.integers(1, 7), st.integers(0, 6))
        def check(docs, max_tokens, overlap):
            if overlap >= max_tokens:
                overlap = max_tokens - 1
            df = spark.createDataFrame(
                list(enumerate(docs)), 'doc_id long, text string')
            got = sorted(tuple(r) for r in
                         chunk_documents(df, max_tokens, overlap)
                         .collect())
            want = sorted(
                (i, cid, b, nt, txt)
                for i, d in enumerate(docs)
                for cid, b, nt, txt in py_chunks(d, max_tokens, overlap))
            assert got == want

        check()
