"""Similarity search over an embedding column (``array<float>``).

- :func:`brute_force_topk` -- exact cosine top-k: native
  ``F.zip_with`` / ``F.aggregate`` dot products against a broadcast
  query set, window rank per query.  The correctness baseline.
- :func:`lsh_bucket_topk` -- the scale path: random-hyperplane LSH
  (sign-bit sketch, native bit math) buckets the corpus; candidates
  come from an equi-join on the bucket key, exact cosine re-ranks
  candidates only.  At 100 TB this turns an all-pairs O(N*Q) scan
  into per-bucket joins.
"""

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a):
    return F.sqrt(_dot(a, a))


def cosine(a, b) -> F.Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     id_col='vec_id', vec_col='embedding',
                     qid_col='query_id', qvec_col='embedding') -> DataFrame:
    """Exact cosine top-k per query: corpus x broadcast(queries).

    Output: (query_id, vec_id, cos_sim, rank) with deterministic
    tie-break on vec_id.
    """
    q = queries.select(F.col(qid_col).alias('query_id'),
                       F.col(qvec_col).alias('_qvec'))
    joined = corpus.select(F.col(id_col).alias('vec_id'),
                           F.col(vec_col).alias('_vec')) \
        .crossJoin(F.broadcast(q))
    scored = joined.select(
        'query_id', 'vec_id',
        cosine(F.col('_vec'), F.col('_qvec')).alias('cos_sim'))
    w = Window.partitionBy('query_id').orderBy(
        F.col('cos_sim').desc(), F.col('vec_id'))
    return (scored.withColumn('rank', F.row_number().over(w))
            .filter(F.col('rank') <= k))


def _hyperplane(dim: int, plane_idx: int) -> list:
    """Deterministic pseudo-random hyperplane components in [-1, 1]
    (splitmix64-style finalizer on (plane, coord))."""
    out = []
    for j in range(dim):
        z = (plane_idx * 1_000_003 + j + 1) * 0x9E3779B97F4A7C15
        z &= (1 << 64) - 1
        z ^= z >> 31
        z = (z * 0xBF58476D1CE4E5B9) & ((1 << 64) - 1)
        z ^= z >> 29
        out.append((z % 2_000_001) / 1_000_000.0 - 1.0)
    return out


def sign_sketch(vec_col, dim: int, planes: int = 16,
                offset: int = 0) -> F.Column:
    """Random-hyperplane sign sketch as a long (bit i = sign of the
    dot product with hyperplane offset+i) -- native column math."""
    bits = []
    for i in range(planes):
        h = F.array([F.lit(v) for v in _hyperplane(dim, offset + i)])
        bits.append(F.when(_dot(vec_col, h) >= 0,
                           F.lit(1 << i).cast('long'))
                    .otherwise(F.lit(0).cast('long')))
    out = F.lit(0).cast('long')
    for b in bits:
        out = out.bitwiseOR(b)
    return out


def lsh_bucket_topk(corpus: DataFrame, queries: DataFrame, dim: int,
                    k: int = 10, planes: int = 16, tables: int = 4,
                    id_col='vec_id', vec_col='embedding',
                    qid_col='query_id', qvec_col='embedding') -> DataFrame:
    """Approximate top-k: multi-table sign-sketch buckets -> equi-join
    -> exact re-rank of candidates only.

    Each table uses a disjoint slice of hyperplanes; a corpus row is a
    candidate for a query if they share any table's bucket.
    """
    def bucketize(df, idc, vecc, out_id):
        cols = [F.col(idc).alias(out_id), F.col(vecc).alias(f'_{out_id}_v')]
        rows = df.select(*cols)
        buckets = []
        for t in range(tables):
            # Each table gets its own disjoint hyperplane slice.
            sk = sign_sketch(F.col(f'_{out_id}_v'), dim, planes,
                             offset=t * planes)
            buckets.append(F.struct(
                F.lit(t).alias('table'), sk.alias('bucket')))
        return rows.select(
            out_id, f'_{out_id}_v',
            F.explode(F.array(*buckets)).alias('tb')) \
            .select(out_id, f'_{out_id}_v', 'tb.table', 'tb.bucket')

    cb = bucketize(corpus, id_col, vec_col, 'vec_id')
    qb = bucketize(queries, qid_col, qvec_col, 'query_id')
    cand = (cb.join(F.broadcast(qb), ['table', 'bucket'])
            .select('query_id', 'vec_id', '_vec_id_v', '_query_id_v')
            .distinct())
    scored = cand.select(
        'query_id', 'vec_id',
        cosine(F.col('_vec_id_v'), F.col('_query_id_v')).alias('cos_sim'))
    w = Window.partitionBy('query_id').orderBy(
        F.col('cos_sim').desc(), F.col('vec_id'))
    return (scored.withColumn('rank', F.row_number().over(w))
            .filter(F.col('rank') <= k))
