"""ANN operator tests: exact/LSH agreement plus malformed-row
robustness (a single null/ragged/zero embedding in a 100 TB corpus
must degrade to a null row, never fail the stage)."""

from pyspark.sql import functions as F
from pyspark.sql import types as T

from pytrs_spark.operators.ann import (
    brute_force_topk,
    cosine,
    lsh_bucket_topk,
    sign_sketch,
)

DIM = 8


def _vec(seed, dim=DIM):
    return [((seed * 31 + i * 7) % 17 - 8) / 8.0 for i in range(dim)]


def _corpus(spark, n=40, bad=()):
    """bad: dict id -> malformed embedding (None / ragged / zeros)."""
    rows = [(f'v{i:03d}', bad[i] if i in bad else _vec(i))
            for i in range(n)]
    schema = T.StructType([
        T.StructField('vec_id', T.StringType()),
        T.StructField('embedding', T.ArrayType(T.DoubleType()))])
    return spark.createDataFrame(rows, schema)


def test_cosine_null_ragged_zero_rows_yield_null(spark):
    df = _corpus(spark, 6, bad={1: None, 2: _vec(2, DIM - 3),
                                3: [0.0] * DIM})
    out = (df.crossJoin(
        df.select(F.col('vec_id').alias('qid'),
                  F.col('embedding').alias('qv'))
        .filter(F.col('qid') == 'v000'))
        .select('vec_id', cosine('embedding', 'qv').alias('cs'))
        .collect())
    by_id = {r['vec_id']: r['cs'] for r in out}
    assert by_id['v001'] is None          # null embedding
    assert by_id['v002'] is None          # ragged dimension
    assert by_id['v003'] is None          # zero norm -> null, not NaN
    assert abs(by_id['v000'] - 1.0) < 1e-12
    assert by_id['v004'] is not None and by_id['v005'] is not None


def test_topk_skips_malformed_rows(spark):
    clean = _corpus(spark, 30)
    dirty = _corpus(spark, 30, bad={5: None, 6: _vec(6, 3),
                                    7: [0.0] * DIM})
    q = clean.filter(F.col('vec_id') == 'v010') \
        .select(F.col('vec_id').alias('query_id'), 'embedding')
    exact = brute_force_topk(dirty, q, k=5)
    got = [r['vec_id'] for r in exact.orderBy('rank').collect()]
    # Malformed rows never rank (their cos_sim is null -> sorted last
    # behind all 27 valid rows, so outside any k<=27).
    assert len(got) == 5 and not {'v005', 'v006', 'v007'} & set(got)
    # And the exact top-k over the dirty corpus matches the clean
    # corpus top-k restricted to surviving ids.
    clean_top = [r['vec_id'] for r in
                 brute_force_topk(clean, q, k=8).orderBy('rank').collect()
                 if r['vec_id'] not in ('v005', 'v006', 'v007')][:5]
    assert got == clean_top


def test_lsh_drops_malformed_rows_and_runs(spark):
    dirty = _corpus(spark, 40, bad={3: None, 4: _vec(4, 2)})
    q = _corpus(spark, 40).filter(F.col('vec_id') == 'v000') \
        .select(F.col('vec_id').alias('query_id'), 'embedding')
    out = lsh_bucket_topk(dirty, q, dim=DIM, k=10, planes=2, tables=8)
    got = {r['vec_id'] for r in out.collect()}
    assert got and not {'v003', 'v004'} & got


def test_sign_sketch_null_for_malformed(spark):
    df = _corpus(spark, 4, bad={2: None})
    rows = df.select('vec_id',
                     sign_sketch(F.col('embedding'), DIM, planes=8)
                     .alias('s')).collect()
    by_id = {r['vec_id']: r['s'] for r in rows}
    assert by_id['v002'] is None
    assert all(by_id[f'v{i:03d}'] is not None for i in (0, 1, 3))


def test_multiprobe_recall_monotone_and_valid(spark):
    """Multi-probe only ADDS candidate buckets: results stay a subset
    of the exact ranking universe and recall is monotone in probes."""
    corpus = _corpus(spark, 120)
    q = corpus.filter(F.col('vec_id').isin('v000', 'v050')) \
        .select(F.col('vec_id').alias('query_id'), 'embedding')
    truth = {(r['query_id'], r['vec_id'])
             for r in brute_force_topk(corpus, q, k=5).collect()}
    last = -1.0
    for probes in (0, 1, 2):
        out = lsh_bucket_topk(corpus, q, dim=DIM, k=5, planes=4,
                              tables=4, probes=probes).collect()
        got = {(r['query_id'], r['vec_id']) for r in out}
        recall = len(truth & got) / len(truth)
        assert recall >= last - 1e-9
        last = recall
        # rank/cos_sim of returned rows must match the exact scorer
        exact = {(r['query_id'], r['vec_id']): r['cos_sim']
                 for r in brute_force_topk(corpus, q, k=120).collect()}
        for r in out:
            assert abs(r['cos_sim']
                       - exact[(r['query_id'], r['vec_id'])]) < 1e-12


def test_ivf_topk_exact_when_probing_all_cells(spark):
    from pytrs_spark.operators.ann import ivf_topk
    corpus = _corpus(spark, 100)
    q = corpus.filter(F.col('vec_id').isin('v000', 'v033')) \
        .select(F.col('vec_id').alias('query_id'), 'embedding')
    exact = brute_force_topk(corpus, q, k=7).orderBy('query_id', 'rank')
    ivf = ivf_topk(corpus, q, k=7, n_cells=8, nprobe=8) \
        .orderBy('query_id', 'rank')
    assert [(r['query_id'], r['rank'], r['vec_id'])
            for r in ivf.collect()] == \
           [(r['query_id'], r['rank'], r['vec_id'])
            for r in exact.collect()]


def test_ivf_partial_probe_subset_and_malformed(spark):
    from pytrs_spark.operators.ann import ivf_topk
    corpus = _corpus(spark, 100, bad={9: None, 10: _vec(10, 3)})
    q = corpus.filter(F.col('vec_id') == 'v000') \
        .select(F.col('vec_id').alias('query_id'), 'embedding')
    out = ivf_topk(corpus, q, k=10, n_cells=8, nprobe=2).collect()
    got = {r['vec_id'] for r in out}
    assert got and not {'v009', 'v010'} & got
    # scores of returned rows are exact
    exact = {(r['query_id'], r['vec_id']): r['cos_sim']
             for r in brute_force_topk(corpus, q, k=100).collect()}
    for r in out:
        assert abs(r['cos_sim'] - exact[(r['query_id'], r['vec_id'])]) \
            < 1e-12


def test_embedding_near_dup_pairs_recall_on_planted_dups(spark):
    """Plant exact and near duplicates; the LSH path must find every
    pair above threshold (verified against an all-pairs scan)."""
    import itertools
    from pytrs_spark.operators.ann import embedding_near_dup_pairs
    base = [(f'v{i:03d}', _vec(i)) for i in range(60)]
    # planted: v900 == v000; v901 = v000 + tiny noise
    planted = [('v900', _vec(0)),
               ('v901', [x + 0.01 * ((i % 3) - 1)
                         for i, x in enumerate(_vec(0))])]
    rows = base + planted
    schema = T.StructType([
        T.StructField('vec_id', T.StringType()),
        T.StructField('embedding', T.ArrayType(T.DoubleType()))])
    df = spark.createDataFrame(rows, schema)
    got = {(r['id_a'], r['id_b'])
           for r in embedding_near_dup_pairs(
               df, threshold=0.95, planes=2, tables=16).collect()}

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = (sum(x * x for x in a) ** 0.5) * \
              (sum(y * y for y in b) ** 0.5)
        return num / den
    truth = {(a, b) for (a, va), (b, vb)
             in itertools.combinations(rows, 2)
             if cos(va, vb) >= 0.95}
    assert ('v000', 'v900') in truth and ('v000', 'v901') in truth
    assert got == truth


def test_lsh_plans_keep_vectors_out_of_exchanges(spark):
    """Wide-row regression pin: LSH candidate streams (bucket join +
    distinct) must carry ids only -- embedding arrays attach AFTER
    candidate dedup.  A reintroduced vector-carrying distinct shows up
    as an embedding column in an Exchange's hashpartitioning."""
    import re

    from pytrs_spark.operators.ann import (
        embedding_near_dup_pairs,
        lsh_bucket_topk,
    )

    emb = spark.read.parquet('/root/testdata/sf0.001/embeddings.parquet')
    q = emb.limit(4).selectExpr('vec_id as query_id', 'embedding')

    for df in (lsh_bucket_topk(emb, q, dim=64, k=5, planes=4,
                               tables=4, probes=1),
               embedding_near_dup_pairs(emb, threshold=0.4)):
        plan = df._jdf.queryExecution().optimizedPlan().toString()
        for line in plan.splitlines():
            if re.search(r'\b(Deduplicate|Aggregate)\b', line):
                assert 'embedding' not in line and '_v' not in line, line


# --- product quantization -------------------------------------------

def test_pq_topk_matches_exact_with_full_rerank(spark):
    """rerank >= corpus size makes pq_topk provably exact (the pool
    is everything; the re-rank is the brute-force ranking)."""
    from pytrs_spark.operators.ann import pq_topk
    corpus = _corpus(spark, 40)
    q = (corpus.filter(F.col('vec_id') < 'v003')
         .select(F.col('vec_id').alias('query_id'), 'embedding'))
    exact = {(r.query_id, r.vec_id, r.rank)
             for r in brute_force_topk(corpus, q, k=5).collect()}
    got = {(r.query_id, r.vec_id, r.rank)
           for r in pq_topk(corpus, q, k=5, m=4, rerank=40).collect()}
    assert got == exact


def test_pq_codes_compact_and_deterministic(spark):
    from pytrs_spark.operators.ann import pq_encode
    corpus = _corpus(spark, 40, bad={7: None, 9: _vec(9, DIM - 2)})
    a = {r.vec_id: r.code for r in pq_encode(corpus, m=4).collect()}
    b = {r.vec_id: r.code for r in pq_encode(corpus, m=4).collect()}
    assert a == b                          # deterministic end to end
    assert a['v007'] is None and a['v009'] is None   # malformed -> null
    good = [c for c in a.values() if c is not None]
    assert len(good) == 38 and all(len(c) == 4 for c in good)


def test_pq_rerank_zero_ranks_by_adc_and_skips_malformed(spark):
    from pytrs_spark.operators.ann import pq_topk
    corpus = _corpus(spark, 30, bad={4: None, 5: [0.0] * DIM})
    q = (corpus.filter(F.col('vec_id') == 'v000')
         .select(F.col('vec_id').alias('query_id'), 'embedding'))
    got = pq_topk(corpus, q, k=30, m=4, rerank=0).collect()
    ids = {r.vec_id for r in got}
    assert 'v004' not in ids               # null embedding never ranks
    assert 'v005' not in ids               # zero-norm: no direction
    assert sorted(r.rank for r in got) == list(range(1, len(got) + 1))
    # ADC scores approximate cosine: self-match must rank first
    best = min(got, key=lambda r: r.rank)
    assert best.vec_id == 'v000'


def test_pq_dim_not_divisible_raises(spark):
    from pytrs_spark.operators.ann import pq_topk
    corpus = _corpus(spark, 20)            # DIM = 8
    q = corpus.select(F.col('vec_id').alias('query_id'), 'embedding')
    import pytest
    with pytest.raises(ValueError):
        pq_topk(corpus, q, k=3, m=3).collect()


def test_pq_recall_high_on_driver_embeddings(spark):
    """Gate-params recall on the real sf0.001 embeddings table: the
    ann_pq driver query is held to the exact-top-k oracle, so this
    must be 1.0 (measured, deterministic corpus + deterministic
    quantizer => stable)."""
    from pytrs_spark.operators.ann import pq_topk
    emb = spark.read.parquet('/root/testdata/sf0.001/embeddings.parquet')
    q = emb.filter(F.col('vec_id') < 8).select(
        F.col('vec_id').alias('query_id'), 'embedding')
    exact = {(r.query_id, r.vec_id, r.rank)
             for r in brute_force_topk(emb, q, k=10).collect()}
    got = {(r.query_id, r.vec_id, r.rank)
           for r in pq_topk(emb, q, k=10, m=8, rerank=64).collect()}
    assert got == exact


def test_ivfpq_equals_ivf_with_full_rerank(spark):
    """With rerank >= candidate count, IVF-PQ's exact re-rank of the
    whole probed set IS ivf_topk (same coarse quantizer, same probed
    cells, same exact-cosine ranking) -- the ADC stage only prunes."""
    from pytrs_spark.operators.ann import ivf_topk, ivfpq_topk
    corpus = _corpus(spark, 60)
    q = (corpus.filter(F.col('vec_id') < 'v004')
         .select(F.col('vec_id').alias('query_id'), 'embedding'))
    ivf = {(r.query_id, r.vec_id, r.rank)
           for r in ivf_topk(corpus, q, k=5, n_cells=8,
                             nprobe=3).collect()}
    both = {(r.query_id, r.vec_id, r.rank)
            for r in ivfpq_topk(corpus, q, k=5, n_cells=8, nprobe=3,
                                m=4, rerank=60).collect()}
    assert both == ivf


def test_ivfpq_malformed_rows_never_rank(spark):
    from pytrs_spark.operators.ann import ivfpq_topk
    corpus = _corpus(spark, 30, bad={3: None, 6: _vec(6, DIM + 1),
                                     8: [0.0] * DIM})
    q = (corpus.filter(F.col('vec_id') == 'v000')
         .select(F.col('vec_id').alias('query_id'), 'embedding'))
    got = ivfpq_topk(corpus, q, k=30, n_cells=4, nprobe=4,
                     m=4, rerank=30).collect()
    ids = {r.vec_id for r in got}
    assert not ids & {'v003', 'v006', 'v008'}
    assert min(got, key=lambda r: r.rank).vec_id == 'v000'


def test_prebuilt_index_paths_match_inline(spark):
    """index= (the build-once/query-many serving shape) must return
    byte-identical results to the inline corpus pass for every tier,
    and the prebuilt index must carry the expected columns."""
    from pytrs_spark.operators.ann import (
        ivf_index, ivf_topk, ivfpq_index, ivfpq_topk,
        lsh_index, pq_index, pq_topk)
    corpus = _corpus(spark, 60)
    q = (corpus.filter(F.col('vec_id') < 'v005')
         .select(F.col('vec_id').alias('query_id'), 'embedding'))

    def rows(df):
        return sorted((r['query_id'], r['rank'], r['vec_id'])
                      for r in df.collect())

    li = lsh_index(corpus, planes=4, tables=6).persist()
    assert li.columns == ['vec_id', 'table', 'bucket']
    assert rows(lsh_bucket_topk(corpus, q, dim=DIM, k=5, planes=4,
                                tables=6, probes=1, index=li)) == \
        rows(lsh_bucket_topk(corpus, q, dim=DIM, k=5, planes=4,
                             tables=6, probes=1))

    ii = ivf_index(corpus, n_cells=8).persist()
    assert ii.columns == ['vec_id', 'embedding', 'cell']
    assert rows(ivf_topk(corpus, q, k=5, n_cells=8, nprobe=3,
                         index=ii)) == \
        rows(ivf_topk(corpus, q, k=5, n_cells=8, nprobe=3))

    pi = pq_index(corpus, m=4).persist()
    assert pi.columns == ['vec_id', '_code']
    assert rows(pq_topk(corpus, q, k=5, m=4, rerank=16, index=pi)) == \
        rows(pq_topk(corpus, q, k=5, m=4, rerank=16))

    fi = ivfpq_index(corpus, n_cells=8, m=4).persist()
    assert fi.columns == ['vec_id', 'cell', '_code']
    assert rows(ivfpq_topk(corpus, q, k=5, n_cells=8, nprobe=3, m=4,
                           rerank=16, index=fi)) == \
        rows(ivfpq_topk(corpus, q, k=5, n_cells=8, nprobe=3, m=4,
                        rerank=16))
    for ix in (li, ii, pi, fi):
        ix.unpersist()


def test_rerank_pool_join_broadcasts_bounded_side(spark):
    """The late-materialization joins must broadcast the bounded
    candidate/pool side: the full-vector corpus table never appears
    below a shuffle Exchange."""
    from pytrs_spark.operators.ann import pq_topk
    corpus = _corpus(spark, 60)
    q = (corpus.filter(F.col('vec_id') < 'v003')
         .select(F.col('vec_id').alias('query_id'), 'embedding'))
    plan = pq_topk(corpus, q, k=5, m=4, rerank=16) \
        ._jdf.queryExecution().executedPlan().toString()
    # Every Exchange hashpartitioning block in the final plan must be
    # on skinny keys, never carrying the embedding column itself.
    import re
    for m in re.finditer(r'Exchange hashpartitioning\(([^)]*)\)', plan):
        assert 'embedding' not in m.group(1), m.group(0)


def test_auto_nprobe_calibrates_to_corpus_shape(spark):
    """nprobe='auto' must pick a SMALL probe count on clustered data
    (cells are informative) and a WIDE one on iid-uniform data (cells
    are noise), hitting recall@10 >= 0.9 on both -- the fixed-nprobe
    silent recall floor is the failure mode this removes."""
    import numpy as np

    from pytrs_spark.operators.ann import (
        _auto_nprobe,
        brute_force_topk,
        ivf_topk,
    )

    rng = np.random.default_rng(7)
    dim, n_cells, n = 16, 16, 600
    centers = rng.standard_normal((n_cells, dim))
    centers /= np.linalg.norm(centers, axis=1)[:, None]
    lab = rng.integers(0, n_cells, n)
    clustered = centers[lab] + 0.15 * rng.standard_normal((n, dim))
    uniform = rng.standard_normal((n, dim))

    picks = {}
    for name, X in (('clustered', clustered), ('uniform', uniform)):
        df = spark.createDataFrame(
            [(int(i), [float(v) for v in X[i]]) for i in range(n)],
            'vec_id long, embedding array<double>')
        q = df.filter(F.col('vec_id') < 6).select(
            F.col('vec_id').alias('query_id'), 'embedding')
        got = ivf_topk(df, q, k=10, n_cells=n_cells, nprobe='auto')
        truth = {(r['query_id'], r['vec_id']) for r in
                 brute_force_topk(df, q, k=10).collect()}
        hits = {(r['query_id'], r['vec_id']) for r in got.collect()}
        recall = len(truth & hits) / len(truth)
        assert recall >= 0.9, (name, recall)
        picks[name] = df._auto_nprobe_cache[
            (n_cells, 10, 0.9, 'vec_id', 'embedding', 8192)]
    # The calibration must follow the data shape: structureless cells
    # need strictly wider probes than informative ones.
    assert picks['uniform'] > picks['clustered'], picks
    assert picks['clustered'] <= n_cells // 4, picks


def test_auto_nprobe_kernel_monotone_and_bounded():
    """recall target 1.0 never exceeds n_cells; higher targets never
    pick fewer probes."""
    import numpy as np

    from pytrs_spark.operators.ann import _auto_nprobe

    rng = np.random.default_rng(3)
    X = rng.standard_normal((300, 8))
    X /= np.linalg.norm(X, axis=1)[:, None]
    C = X[:10].copy()
    picks = [_auto_nprobe(C, X, k=5, target=t)
             for t in (0.5, 0.8, 0.95, 1.0)]
    assert picks == sorted(picks)
    assert 1 <= picks[0] and picks[-1] <= 10


# --- SemDeDup (cluster-then-prune semantic dedup) ------------------------

def _semdedup_brute(df_rows, cells, threshold):
    """Reference SemDeDup given an (id -> cell) assignment: within-cell
    pairs >= threshold by float64 cosine, transitive closure, min-id
    rep.  Trusts only the clustering (gated separately by the ann_ivf
    oracle), not the pruning or closure."""
    import numpy as np
    vecs = {i: np.asarray(v, dtype=np.float64) for i, v in df_rows
            if v is not None}
    rep = {i: i for i, _ in df_rows}

    def find(x):
        while rep[x] != x:
            rep[x] = rep[rep[x]]
            x = rep[x]
        return x

    ids = sorted(cells)
    for a in ids:
        for b in ids:
            if a < b and cells[a] == cells[b] and cells[a] is not None:
                va, vb = vecs.get(a), vecs.get(b)
                if va is None or vb is None:
                    continue
                na, nb = np.sqrt(va @ va), np.sqrt(vb @ vb)
                if na == 0 or nb == 0:
                    continue
                if float(va @ vb / (na * nb)) >= threshold:
                    ra, rb = find(a), find(b)
                    if ra != rb:
                        rep[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i, _ in df_rows}


def test_semdedup_matches_reference_closure(spark):
    from pytrs_spark.operators.ann import ivf_index, semdedup
    import numpy as np
    # three tight bundles + noise: bundle members are scaled/perturbed
    # copies, so cosines within a bundle are ~1
    base = [np.asarray(_vec(s), dtype=np.float64) for s in (1, 2, 3)]
    rows = []
    for i in range(24):
        b = base[i % 3]
        rows.append((i, [float(x) for x in b * (1.0 + 0.01 * (i // 3))]))
    for i in range(24, 34):                      # unique noise tail
        rows.append((i, _vec(100 + i * 13)))
    df = spark.createDataFrame(
        rows, 'vec_id long, embedding array<double>')
    out = {r['vec_id']: (r['cell'], r['rep_id'], r['kept'])
           for r in semdedup(df, n_cells=4, threshold=0.999,
                             train_sample=34).collect()}
    assert sorted(out) == sorted(i for i, _ in rows)
    # reference closure over the ENGINE's own cell assignment
    cells = {r['vec_id']: r['cell']
             for r in ivf_index(df, 4, id_col='vec_id',
                                vec_col='embedding').collect()}
    exp = _semdedup_brute(rows, cells, 0.999)
    for i, _ in rows:
        assert out[i][1] == exp[i], (i, out[i], exp[i])
        assert out[i][2] == (exp[i] == i)
    # scaled copies of one bundle sharing a cell must actually merge
    assert sum(1 for i, _ in rows if not out[i][2]) > 0


def test_semdedup_malformed_rows_kept_with_null_cell(spark):
    from pytrs_spark.operators.ann import semdedup
    rows = [(0, _vec(1)), (1, _vec(1)), (2, None),
            (3, [0.0] * DIM), (4, _vec(2, DIM - 3))]
    df = spark.createDataFrame(
        rows, 'vec_id long, embedding array<double>')
    out = {r['vec_id']: r for r in
           semdedup(df, n_cells=2, threshold=0.99,
                    train_sample=5).collect()}
    # null / ragged rows: no cell at all
    for i in (2, 4):
        assert out[i]['cell'] is None
    # zero-norm rows DO land in a cell (all-zero sims, tie -> lowest)
    # but can take no edges: cosine() is null for them
    assert out[3]['cell'] is not None
    for i in (2, 3, 4):
        assert out[i]['kept'] and out[i]['rep_id'] == i
    # the identical pair still dedupes
    assert out[0]['kept'] and not out[1]['kept']
    assert out[1]['rep_id'] == 0


def test_semdedup_partitioning_invariance(spark):
    from pytrs_spark.operators.ann import semdedup
    rows = [(i, _vec(i % 7)) for i in range(30)]
    df = spark.createDataFrame(
        rows, 'vec_id long, embedding array<double>')
    a = {tuple(r) for r in semdedup(
        df.repartition(1), n_cells=3, threshold=0.999,
        train_sample=30).collect()}
    b = {tuple(r) for r in semdedup(
        df.repartition(5, 'vec_id'), n_cells=3, threshold=0.999,
        train_sample=30).collect()}
    assert a == b


def test_semdedup_plan_single_cell_shuffle_for_edges(spark):
    """Scale-shape pin: the verify stage is ONE grouped pass per cell
    -- vectors ride exactly one hashpartitioning exchange (the cell
    shuffle into applyInPandas); no exchange after the kernel carries
    an embedding column (edges are (id, id) only)."""
    import re

    from pytrs_spark.operators.ann import semdedup
    emb = spark.read.parquet('/root/testdata/sf0.001/embeddings.parquet')
    out = semdedup(emb, n_cells=4, threshold=0.9)
    plan = out._jdf.queryExecution().executedPlan().toString()
    vec_exchanges = [
        l for l in plan.splitlines()
        if 'Exchange hashpartitioning' in l and 'embedding' in l]
    assert len(vec_exchanges) <= 1, vec_exchanges
    assert 'BatchEvalPython' not in plan
