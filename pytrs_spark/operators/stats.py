"""Distributed statistical sketches and summaries.

- :func:`hll_sketch` / :func:`hll_merge` / :func:`hll_estimate`: a
  fully SPEC'D HyperLogLog (Flajolet et al. 2007) over the documented
  ``sampling.hash_mix`` integer mix, so the sketch is bit-identical
  on any engine, any partitioning, any cluster -- unlike
  ``approx_count_distinct``, whose sketch is engine-internal and
  cannot be oracle-checked or exchanged between systems.  The sketch
  IS a tiny DataFrame (register -> max rank), so persisting, merging
  across days/tables, and unioning shards are ordinary DataFrame ops.
- :func:`histogram`: fixed-width binning as one codegen expression +
  partial-agg groupBy (never a shuffle of raw values).

HLL spec (independently implementable in SQL; the DuckDB oracle in
``__spark_entry__.py`` does):

    reg(key)  = mix(key, salt)      mod 2^p           -- register id
    w(key)    = mix(key, salt + 23459)                -- rank source
    rho(key)  = 32 - bit_length(w)  (w = 0 -> 32)     -- 1-based pos
                                                         of leftmost
                                                         1 in 31 bits
    sketch    = max rho per register (registers never hit: absent)

``bit_length`` is computed EXACTLY as ``length(bin(w))`` -- a string
op on an integer, not ``log2`` (float log near powers of two rounds
differently across libms and would flip ranks).

Estimator: the standard bias-corrected harmonic mean
``alpha_m * m^2 / sum_j 2^(-rho_j)`` with absent registers counting
``2^0``; linear counting ``m * ln(m / V)`` below ``2.5 m`` when empty
registers exist.  The 31-bit rank source caps countable cardinality
around ``2^31`` -- document-scale per-partition sketches merge fine;
for >10^9 true cardinality widen the mix first.

Scale shape: sketch build = one map pass + a shuffle of at most
``m`` rows per partial (map-side combine reduces first); merges
never touch raw data again.
"""

import math

from pyspark.sql import DataFrame, functions as F

from .sampling import hash_mix

_RANK_SALT = 23459


def hll_sketch(df: DataFrame, key_col: str, p: int = 6,
               salt: int = 0) -> DataFrame:
    """Build the (register, rho_max) HLL sketch of a key column.
    ``p`` in [4, 16]: m = 2^p registers, relative error ~1.04/sqrt(m).
    """
    if not 4 <= p <= 16:
        raise ValueError(f'p must be in [4,16], got {p}')
    m = 1 << p
    reg = hash_mix(key_col, salt) % m
    w = hash_mix(key_col, salt + _RANK_SALT)
    bl = F.when(w == 0, F.lit(0)).otherwise(F.length(F.bin(w)))
    rho = F.lit(32) - bl
    return (df.select(reg.cast('int').alias('register'),
                      rho.cast('int').alias('rho'))
            .groupBy('register').agg(F.max('rho').alias('rho_max')))


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union sketches (same p/salt) into one: max rank per register.
    This is the whole point of HLL at 100 TB -- per-day / per-shard
    sketches combine without re-reading data."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy('register').agg(
        F.max('rho_max').alias('rho_max'))


def hll_estimate(sketch: DataFrame, p: int) -> float:
    """Cardinality estimate from a sketch DataFrame (driver-side
    scalar; the sketch has at most 2^p rows)."""
    m = 1 << p
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(
        p, 0.7213 / (1 + 1.079 / m))
    rows = sketch.collect()
    hit = {r['register']: r['rho_max'] for r in rows}
    s = sum(2.0 ** -r for r in hit.values()) + (m - len(hit))
    est = alpha * m * m / s
    zeros = m - len([r for r in hit.values() if r > 0])
    if est <= 2.5 * m and zeros > 0:
        est = m * math.log(m / zeros)
    return est


def histogram(df: DataFrame, col: str, lo: float, hi: float,
              n_bins: int) -> DataFrame:
    """Fixed-width histogram: (bin, lo_edge, hi_edge, n) for bins
    that received at least one value; out-of-range values clamp into
    the end bins.  Binning is one codegen expression; the shuffle
    carries at most ``n_bins`` rows per partial."""
    if hi <= lo or n_bins < 1:
        raise ValueError('need hi > lo and n_bins >= 1')
    width = (hi - lo) / n_bins
    raw = F.floor((F.col(col) - F.lit(lo)) / F.lit(width))
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))
    return (df.filter(F.col(col).isNotNull())
            .groupBy(b.cast('int').alias('bin'))
            .agg(F.count('*').alias('n'))
            .select('bin',
                    (F.lit(lo) + F.col('bin') * F.lit(width))
                    .alias('lo_edge'),
                    (F.lit(lo) + (F.col('bin') + 1) * F.lit(width))
                    .alias('hi_edge'),
                    'n'))
