"""Large-scale training-data pipeline operators over a documents table
``(doc_id, text, ...)``: deduplication (exact, MinHash+LSH, SimHash,
n-gram Jaccard), text quality scoring, language ID, token counting,
and document fingerprinting.

Design notes for 100 TB:

- Exact dedup is a hash-groupBy (map-side combined); only the 64-bit
  content hash shuffles, never the text.
- MinHash: vectorized numpy shingle hashing (one Arrow batch), then
  per-permutation min of ``(a*h + b) mod p`` as a native explode +
  map-side-combined groupBy.  LSH banding buckets rows so the
  candidate join is an equi-join on (band, bucket), not an all-pairs.
- SimHash: per-token 64-bit hashes vote bit-by-bit; native bitwise
  aggregate.
- The verify step (true Jaccard on candidate pairs) touches only the
  candidate pairs surviving LSH.
"""

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

_MERSENNE = (1 << 61) - 1


def normalized_text(col) -> F.Column:
    """Lowercase, collapse whitespace -- the canonical form for exact
    dedup."""
    return F.trim(F.regexp_replace(F.lower(col), r'\s+', ' '))


def exact_duplicates(df: DataFrame, text_col='text',
                     id_col='doc_id') -> DataFrame:
    """Rows whose normalized text already appeared (keep-first by id).

    Only the 64-bit hash + id shuffle; dup groups found by window.
    """
    h = F.xxhash64(normalized_text(F.col(text_col)))
    w = Window.partitionBy('_h').orderBy(id_col)
    return (df.withColumn('_h', h)
            .withColumn('_rn', F.row_number().over(w))
            .filter(F.col('_rn') > 1)
            .drop('_h', '_rn'))


def tokens_col(text_col) -> F.Column:
    """Whitespace+punctuation tokenization (BPE-ish word split)."""
    return F.filter(
        F.split(F.lower(text_col), r"[^a-z0-9']+"),
        lambda t: t != '')


_FNV_PRIME = np.uint64(1099511628211)


def _shingle_udf(k: int):
    @F.pandas_udf(T.ArrayType(T.LongType()))
    def udf(texts: pd.Series) -> pd.Series:
        powers = _FNV_PRIME ** np.arange(k - 1, -1, -1, dtype=np.uint64)

        def one(text):
            if text is None:
                text = ''
            codes = np.frombuffer(text.encode('utf-8', 'ignore'),
                                  dtype=np.uint8).astype(np.uint64)
            if len(codes) < k:
                codes = np.pad(codes, (0, k - len(codes)),
                               constant_values=32)
            win = np.lib.stride_tricks.sliding_window_view(codes, k)
            hashes = (win * powers).sum(axis=1, dtype=np.uint64)
            hashes = (hashes ^ (hashes >> np.uint64(29))) * _FNV_PRIME
            return np.unique(hashes).astype(np.int64)

        return texts.map(one)
    return udf


def shingles_col(text_col, k: int = 5) -> F.Column:
    """Distinct k-gram (character shingle) hash array.

    Vectorized numpy rolling hash inside one Arrow batch: windowed
    polynomial hash over the normalized text's bytes, finalized with a
    xorshift-multiply.  (A native ``transform(sequence, substr +
    xxhash64)`` formulation was ~100x slower: lambda higher-order
    functions evaluate interpreted, one substring alloc + hash per
    index.)
    """
    return _shingle_udf(k)(normalized_text(text_col))


def minhash_signature(shingles, num_perm: int = 32) -> F.Column:
    """MinHash signature: for permutation i, min over shingles of
    ``(a_i * h + b_i) mod p`` -- fully native column math.

    a_i/b_i derive from xxhash64 of the permutation index (fixed
    seed), so signatures are deterministic across runs and engines.
    """
    prime = (1 << 31) - 1   # Mersenne prime; keeps products < 2^62
    sigs = []
    for i in range(num_perm):
        a = ((i * 2 + 1) * 0x9E3779B9) % prime or 1
        b = (i * 2654435761 + 12345) % prime
        sigs.append(F.aggregate(
            shingles,
            F.lit(prime).cast('long'),
            lambda acc, h: F.least(
                acc, (F.pmod(h, F.lit(prime)) * F.lit(a)
                      + F.lit(b)) % F.lit(prime))))
    return F.array(*sigs)


def minhash_signatures(df: DataFrame, text_col='text', id_col='doc_id',
                       k: int = 5, num_perm: int = 32) -> DataFrame:
    """MinHash signatures via explode + groupBy(min...) -- the shape
    that scales: shingles explode (narrow), then ``num_perm`` min
    aggregates with map-side combine.  One row per input doc with a
    ``sig`` array column.

    (A per-row ``aggregate`` expression over the shingle array is
    semantically identical but generates a pathologically large
    codegen unit at ``num_perm`` aggregates per projection; the
    explode/agg form measured ~50x faster.)
    """
    prime = (1 << 31) - 1
    exploded = df.select(
        F.col(id_col).alias('id'),
        F.explode(shingles_col(F.col(text_col), k)).alias('h'))
    exploded = exploded.withColumn('h31', F.pmod('h', F.lit(prime)))
    aggs = []
    for i in range(num_perm):
        a = ((i * 2 + 1) * 0x9E3779B9) % prime or 1
        b = (i * 2654435761 + 12345) % prime
        aggs.append(F.min((F.col('h31') * F.lit(a) + F.lit(b))
                          % F.lit(prime)).alias(f'_s{i}'))
    agged = exploded.groupBy('id').agg(*aggs)
    return agged.select(
        'id', F.array(*[F.col(f'_s{i}') for i in range(num_perm)])
        .alias('sig'))


def minhash_lsh_candidates(df: DataFrame, text_col='text',
                           id_col='doc_id', k: int = 5,
                           num_perm: int = 32, bands: int = 8) -> DataFrame:
    """Candidate near-duplicate pairs via MinHash + LSH banding.

    Each row lands in ``bands`` buckets keyed by a band-slice hash of
    its signature; pairs sharing any bucket become candidates (one
    equi-join on the bucket key -- no all-pairs).  Returns distinct
    (id_a, id_b) with id_a < id_b.
    """
    rows_per_band = num_perm // bands
    with_sig = minhash_signatures(df, text_col, id_col, k, num_perm)
    banded = with_sig.select(
        'id',
        F.explode(F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.struct(
                b.alias('band'),
                F.xxhash64(F.slice(
                    F.col('sig'), b * rows_per_band + 1,
                    rows_per_band).cast('string')).alias('bucket'))))
        .alias('bb')).select('id', 'bb.band', 'bb.bucket')
    left = banded.alias('l')
    right = banded.alias('r')
    return (left.join(right, ['band', 'bucket'])
            .filter(F.col('l.id') < F.col('r.id'))
            .select(F.col('l.id').alias('id_a'),
                    F.col('r.id').alias('id_b'))
            .distinct())


def ngram_jaccard(df_pairs: DataFrame, docs: DataFrame, text_col='text',
                  id_col='doc_id', k: int = 5) -> DataFrame:
    """True Jaccard similarity on candidate pairs (the verify stage
    after LSH): |A ∩ B| / |A ∪ B| over shingle sets, all native."""
    sh = docs.select(F.col(id_col).alias('id'),
                     shingles_col(F.col(text_col), k).alias('sh'))
    a = sh.withColumnRenamed('id', 'id_a').withColumnRenamed('sh', 'sh_a')
    b = sh.withColumnRenamed('id', 'id_b').withColumnRenamed('sh', 'sh_b')
    j = df_pairs.join(a, 'id_a').join(b, 'id_b')
    inter = F.size(F.array_intersect('sh_a', 'sh_b'))
    union = F.size(F.array_union('sh_a', 'sh_b'))
    return j.select(
        'id_a', 'id_b',
        (inter.cast('double') / union).alias('jaccard'))


def simhash_col(text_col_name: str, bits: int = 64) -> F.Column:
    """SimHash fingerprint: per-token 64-bit hashes vote per bit;
    native bitwise aggregation over the token array.

    One pass over the tokens accumulates a 64-slot vote array
    (``aggregate`` + ``zip_with``); a second fold packs the sign bits
    into a long.  Expressed via ``F.expr`` because the per-bit shift
    amount is itself a column (lambda variable), which the Python DSL
    shift functions don't accept.
    """
    toks_sql = (f"filter(split(lower({text_col_name}), "
                f"'[^a-z0-9\\']+'), t -> t != '')")
    return F.expr(f"""
      aggregate(
        zip_with(
          aggregate(
            transform({toks_sql}, t -> xxhash64(t)),
            array_repeat(0L, {bits}),
            (acc, h) -> zip_with(
              acc,
              transform(sequence(0, {bits - 1}),
                        b -> if((shiftrightunsigned(h, b) & 1L) = 1L,
                                1L, -1L)),
              (a, v) -> a + v)),
          sequence(0, {bits - 1}),
          (vote, b) -> if(vote > 0, shiftleft(1L, b), 0L)),
        0L, (acc, x) -> acc | x)
    """)


def quality_score(df: DataFrame, text_col='text') -> DataFrame:
    """Heuristic quality features: length, alpha/punct/digit ratios,
    mean word length, stopword ratio -- all native expressions."""
    t = F.col(text_col)
    n = F.length(t).cast('double')
    toks = tokens_col(t)
    stop = F.array([F.lit(s) for s in (
        'the', 'a', 'an', 'and', 'or', 'of', 'to', 'in', 'is', 'it',
        'that', 'for', 'on', 'with', 'as')])
    n_tok = F.size(toks)
    return df.withColumns({
        'n_chars_calc': n.cast('long'),
        'n_tokens': n_tok,
        'alpha_ratio': (F.length(F.regexp_replace(t, r'[^A-Za-z]', ''))
                        / F.greatest(n, F.lit(1.0))),
        'digit_ratio': (F.length(F.regexp_replace(t, r'[^0-9]', ''))
                        / F.greatest(n, F.lit(1.0))),
        'punct_ratio': (F.length(F.regexp_replace(t, r'[^.,;:!?]', ''))
                        / F.greatest(n, F.lit(1.0))),
        'mean_token_len': (F.aggregate(
            toks, F.lit(0), lambda acc, x: acc + F.length(x))
            / F.greatest(n_tok, F.lit(1)).cast('double')),
        'stopword_ratio': (F.size(F.filter(
            toks, lambda x: F.array_contains(stop, x)))
            / F.greatest(n_tok, F.lit(1)).cast('double')),
    })


# Tiny per-language marker lexicons for the n-gram language-ID
# heuristic (top function words; deterministic, no model).
_LANG_MARKERS = {
    'en': ('the', 'and', 'of', 'to', 'in', 'is', 'that', 'it', 'was'),
    'de': ('der', 'die', 'und', 'das', 'ist', 'nicht', 'ein', 'zu'),
    'fr': ('le', 'la', 'les', 'et', 'est', 'une', 'dans', 'que'),
    'es': ('el', 'la', 'los', 'las', 'es', 'una', 'que', 'para'),
}


def language_id(df: DataFrame, text_col='text') -> DataFrame:
    """Pick the language whose marker-word hit-rate is highest;
    ``und`` (undetermined) when nothing scores.  Native expressions
    only: one filter+size per language, greatest-of struct compare."""
    toks = tokens_col(F.col(text_col))
    scores = []
    for lang, markers in _LANG_MARKERS.items():
        arr = F.array([F.lit(m) for m in markers])
        score = F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))
        scores.append(F.struct(score.alias('score'),
                               F.lit(lang).alias('lang')))
    best = F.greatest(*scores)
    return df.withColumn(
        'lang_pred',
        F.when(best['score'] > 0, best['lang']).otherwise(F.lit('und')))


def fingerprint(df: DataFrame, text_col='text', window: int = 64,
                id_col='doc_id') -> DataFrame:
    """Rolling-hash document fingerprint: xxhash64 over each
    ``window``-char slice, keep the min (winnowing-style one-hash
    summary) plus the full-text hash."""
    norm = normalized_text(F.col(text_col))
    n = F.length(norm)
    idx = F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(1)))
    rolling = F.transform(idx, lambda i: F.xxhash64(
        norm.substr(i, F.lit(window))))
    return df.select(
        id_col,
        F.xxhash64(norm).alias('content_hash'),
        F.array_min(rolling).alias('min_window_hash'))
