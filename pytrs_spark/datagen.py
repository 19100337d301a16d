"""Deterministic synthetic input tables (seed-fixed, no external data).

Two tables, per FIXTURES.md:

- ``images`` -- the authoritative input shape from the driver's
  ``input_hint``: ``(image_id string, bytes binary, w int32, h int32,
  fmt string, caption string, phash int64)``.  The phash
  deterministically derives an anchor point on the synthetic PLSS
  plane; the caption embeds the expected ``(trs, qq)`` tile so
  caption-equality checks double as join checks.  A configurable slice
  of rows is skewed into one section of one "dense township" to
  exercise salted-key handling.

- ``descs`` -- the PLSS description corpus (polygon layer source).
  Every section of every covered township is partitioned into exactly
  the 16 standard QQs (via varied description styles/layouts), so the
  polygon layer equals a regular QQ lattice -- which makes the whole
  parse -> polygon -> join pipeline checkable against a pure-SQL
  oracle that never parses text.

All generation is per-row closed-form (splitmix64 etc.) and runs
distributed via ``mapInPandas`` over ``spark.range`` -- no driver-side
data materialization, scales to any row count.
"""

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from . import imagecodec

# Covered townships: T150N-R95W .. T157N-R102W (8 x 8 = 64 townships).
TWP_MIN, TWP_MAX = 150, 157       # all 'n'
RGE_MIN, RGE_MAX = 95, 102        # all 'w'

# Plane extent in miles (township (t)n (r)w spans
# x in [-6r, -6r+6), y in [6(t-1), 6t); see spatial.grid).
X0 = -6.0 * RGE_MAX               # west edge   (-612)
X1 = -6.0 * RGE_MIN + 6.0         # east edge   (-564)
Y0 = 6.0 * (TWP_MIN - 1)          # south edge  (894)
Y1 = 6.0 * TWP_MAX                # north edge  (942)

# Dense-township skew target: section 14 of T154N-R97W.
DENSE_TWP, DENSE_RGE, DENSE_SEC = 154, 97, 14
SKEW_FRACTION_DEFAULT = 0.10

_SM64_GAMMA = np.uint64(0x9E3779B97F4A7C15)
_SM64_M1 = np.uint64(0xBF58476D1CE4E5B9)
_SM64_M2 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain PRNG step)."""
    z = (x.astype(np.uint64) + _SM64_GAMMA)
    z = (z ^ (z >> np.uint64(30))) * _SM64_M1
    z = (z ^ (z >> np.uint64(27))) * _SM64_M2
    return z ^ (z >> np.uint64(31))


def phash_to_xy(phash: np.ndarray):
    """Anchor point from a non-negative int64 phash (< 2^62).

    u = bits 31..61 scaled by 2^31; v = bits 0..30 scaled by 2^31 --
    both integer-div/mod expressible, so the identical derivation runs
    in the DuckDB oracle.
    """
    p = phash.astype(np.int64)
    u = ((p >> 31) & np.int64(2 ** 31 - 1)).astype(np.float64) / 2.0 ** 31
    v = (p & np.int64(2 ** 31 - 1)).astype(np.float64) / 2.0 ** 31
    x = X0 + u * (X1 - X0)
    y = Y0 + v * (Y1 - Y0)
    return x, y


def _xy_to_phash(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Inverse of phash_to_xy (used to aim the skew slice)."""
    u = (x - X0) / (X1 - X0)
    v = (y - Y0) / (Y1 - Y0)
    hi = np.floor(u * 2.0 ** 31).astype(np.int64)
    lo = np.floor(v * 2.0 ** 31).astype(np.int64)
    return (hi << 31) | lo


def _section_origin(twp, rge, sec):
    """South-west corner of a section (vectorized; boustrophedon
    numbering: sec 1 = NE corner, west across the top row, serpentine).
    """
    tx0 = -6.0 * rge
    ty0 = 6.0 * (twp - 1)
    row = (sec - 1) // 6              # 0 = north row
    i = (sec - 1) % 6
    col = np.where(row % 2 == 0, 5 - i, i)   # 0 = west column
    return tx0 + col * 1.0, ty0 + (5 - row) * 1.0


def xy_to_tile(x: np.ndarray, y: np.ndarray):
    """Closed-form (trs, qq) tile for a point -- datagen-side ground
    truth used only to stamp captions."""
    rge = np.ceil(-x / 6.0).astype(np.int64)
    twp = (np.floor(y / 6.0) + 1).astype(np.int64)
    tx0 = -6.0 * rge
    ty0 = 6.0 * (twp - 1)
    col = np.floor((x - tx0)).astype(np.int64)        # 0 = west
    row_from_s = np.floor((y - ty0)).astype(np.int64)
    row = 5 - row_from_s                               # 0 = north row
    i = np.where(row % 2 == 0, 5 - col, col)
    sec = row * 6 + i + 1
    sx0 = tx0 + col * 1.0
    sy0 = ty0 + row_from_s * 1.0
    fx = x - sx0
    fy = y - sy0
    outer = np.char.add(np.where(fy >= 0.5, 'N', 'S'),
                        np.where(fx >= 0.5, 'E', 'W'))
    ix = np.where(fx >= 0.5, fx - 0.5, fx)
    iy = np.where(fy >= 0.5, fy - 0.5, fy)
    inner = np.char.add(np.where(iy >= 0.25, 'N', 'S'),
                        np.where(ix >= 0.25, 'E', 'W'))
    qq = np.char.add(inner, outer)
    trs = [f"{t}n{r}w{s:02d}" for t, r, s in zip(twp, rge, sec)]
    return np.array(trs), qq


def gen_images(spark: SparkSession, n_rows: int,
               skew_fraction: float = SKEW_FRACTION_DEFAULT,
               with_bytes: bool = True, partitions: int = 32) -> DataFrame:
    """Generate the synthetic images table, distributed.

    Every column is a pure function of the row index (seed-fixed); a
    ``skew_fraction`` slice of rows is aimed at one section of the
    dense township.
    """
    schema = ("image_id string, bytes binary, w int, h int, fmt string, "
              "caption string, phash long")

    def gen(batches):
        for pdf in batches:
            idx = pdf['id'].to_numpy()
            n = len(idx)
            raw = splitmix64(idx.astype(np.uint64))
            phash = (raw & np.uint64(0x3FFFFFFFFFFFFFFF)).astype(np.int64)

            # Aim the skew slice at the dense section: overwrite phash
            # so the anchor lands inside sec 14 of T154N-R97W.
            skewed = (idx % 1_000_000) < int(skew_fraction * 1_000_000)
            if skewed.any():
                jitter_u = splitmix64(idx[skewed].astype(np.uint64)
                                      + np.uint64(7)) \
                    .astype(np.float64) / 2.0 ** 64
                jitter_v = splitmix64(idx[skewed].astype(np.uint64)
                                      + np.uint64(13)) \
                    .astype(np.float64) / 2.0 ** 64
                sx0, sy0 = _section_origin(
                    np.full(skewed.sum(), DENSE_TWP),
                    np.full(skewed.sum(), DENSE_RGE),
                    np.full(skewed.sum(), DENSE_SEC))
                phash[skewed] = _xy_to_phash(sx0 + jitter_u,
                                             sy0 + jitter_v)

            x, y = phash_to_xy(phash)
            trs, qq = xy_to_tile(x, y)
            image_id = np.array([f"img{i:012d}" for i in idx])
            caption = np.array([
                f"caption for {iid} in {t}:{q}"
                for iid, t, q in zip(image_id, trs, qq)])
            w = np.array([16, 32, 64])[idx % 3].astype(np.int32)
            h = np.array([16, 24, 48])[idx % 3].astype(np.int32)
            fmt = np.where(idx % 17 == 0, 'jpeg', 'png')

            if with_bytes:
                blobs = []
                for i, wi, hi, fi in zip(idx, w, h, fmt):
                    rng = np.random.Generator(np.random.PCG64(int(i)))
                    pixels = rng.integers(0, 256, size=(hi, wi, 3),
                                          dtype=np.uint8)
                    blobs.append(imagecodec.encode(pixels, fi))
            else:
                blobs = [None] * n
            yield pd.DataFrame({
                'image_id': image_id, 'bytes': blobs, 'w': w, 'h': h,
                'fmt': fmt, 'caption': caption, 'phash': phash})

    return (spark.range(0, n_rows, numPartitions=partitions)
            .mapInPandas(gen, schema=schema))


# --- PLSS description corpus (polygon layer source) -------------------

def _doc_text(twp, rge, block, style):
    """One description document covering sections 6*block+1..6*block+6
    of (twp)N-(rge)W, partitioning each section into the 16 standard
    QQs, in one of several layouts/description styles."""
    a, b = 6 * block + 1, 6 * block + 4
    c, d = 6 * block + 5, 6 * block + 6
    tr = f"T{twp}N-R{rge}W"
    if style == 0:      # TRS_desc, multisec range + halves + quarters
        return (f"{tr} Sec {a} - {b}: ALL, Sec {c}: N/2, S/2, "
                f"Sec {d}: NE/4, NW/4, SE/4, SW/4")
    if style == 1:      # desc_STR
        return (f"ALL of Sec {a} - {b}, E/2, W/2 of Sec {c}, "
                f"N/2, S/2 of Sec {d}, {tr}")
    if style == 2:      # TRS_desc with wordy twp/rge + lots alongside
        return (f"Township {twp} North, Range {rge} West "
                f"Sec {a} - {b}: ALL, Sec {c}: Lots 1 - 2, N/2, S/2, "
                f"Sec {d}: E/2, W/2")
    # style 3: TR_desc_S
    return (f"{tr} ALL of Sec {a} - {b}, N2NE, S2NE, NW/4, S/2 of "
            f"Sec {c}, ALL of Sec {d}")


def gen_descs(spark: SparkSession) -> DataFrame:
    """The deterministic description corpus: 6 documents per township,
    jointly partitioning all 36 sections into the 16 standard QQs."""
    rows = []
    doc_id = 0
    for twp in range(TWP_MIN, TWP_MAX + 1):
        for rge in range(RGE_MIN, RGE_MAX + 1):
            for block in range(6):
                style = (twp + rge + block) % 4
                rows.append((doc_id, _doc_text(twp, rge, block, style)))
                doc_id += 1
    return spark.createDataFrame(rows, "doc_id long, raw_desc string")


def gen_blob_points(spark: SparkSession, n_rows: int):
    """Deterministic clustered point cloud for the density operators
    (G18 DBSCAN bench + `scripts/dbscan_scale_probe.py` share this
    single definition): 64 lattice blobs (8x8 grid of 5.5-spaced
    centers, 3x3 uniform spread) plus 10% uniform background over the
    full plane extent, all pure column arithmetic -- no driver
    materialization, identical at any parallelism.

    Returns ``(id, x, y)`` with ``id`` in 1..n_rows.
    """
    from pyspark.sql import functions as F
    k = F.col('id') + 1
    # Low-bit Weyl mixes for BOTH jitter axes: a high-bit lane is
    # ~constant for small sequential keys and would collapse the
    # blobs into 1-D lines.
    u = ((k * 2654435761) % (2 ** 31)).cast('double') / 2.0 ** 31
    v = ((k * 1597334677) % (2 ** 31)).cast('double') / 2.0 ** 31
    cx = F.lit(X0 + 3.0) + (k % 8).cast('double') * 5.5
    cy = (F.lit(Y0 + 3.0)
          + ((k % 64) / 8).cast('long').cast('double') * 5.5)
    bx = F.lit(X0) + u * (X1 - X0)
    by = F.lit(Y0) + v * (Y1 - Y0)
    return spark.range(n_rows).select(
        k.alias('id'),
        F.when(k % 10 == 0, bx).otherwise(cx + u * 3.0 - 1.5)
        .alias('x'),
        F.when(k % 10 == 0, by).otherwise(cy + v * 3.0 - 1.5)
        .alias('y'))
