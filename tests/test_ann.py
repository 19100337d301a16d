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
