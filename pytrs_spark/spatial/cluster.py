"""Z-order (Morton) spatial clustering + range-pruned bbox scans.

Engine extension (SURVEY.md §2.7 G14) -- no reference counterpart
(pyTRS never stores data; this is the layout-side lever its parsed
grid needs at warehouse scale).

At 10^12 rows the dominant cost of a spatial query is the SCAN, and
parquet/Iceberg can only skip row groups whose min/max column stats
exclude the predicate.  A random row layout gives every row group a
near-full (x, y) extent, so nothing skips.  Interleaving the
quantized x/y bits into one Morton key and range-sorting the table by
it makes every row group a compact z-contiguous region, and a bbox
query becomes a handful of zkey BETWEEN ranges -- ordinary pushable
range predicates that prune at the row-group level on the key the
data is actually sorted by.  Same design as Delta/Iceberg
OPTIMIZE ZORDER; implemented here with nothing but native column
expressions (the key build is pure whole-stage codegen: shifts, ands,
ors -- no UDF anywhere).

Usage contract: WRITE the clustered frame (parquet/Iceberg) and run
:func:`bbox_scan` on the read-back.  Scanning the unmaterialized
frame is still correct but Catalyst pushes each BETWEEN leg through
the ``zkey`` alias, duplicating the (self-composed, ~16x-per-step)
interleave tree per leg -- past Janino's 64KB method limit the whole
stage silently drops out of codegen.

Pieces:
- :func:`morton_key` -- the interleave as a native Column.
- :func:`zorder_cluster` -- repartitionByRange + sortWithinPartitions
  on the key: one range shuffle to lay the table out.
- :func:`zorder_ranges` -- driver-side quadtree decomposition of a
  bbox into at most ``max_ranges`` inclusive zkey intervals (budget
  merges only ever ADD false positives, never lose rows).
- :func:`bbox_scan` -- the query shape: pushable zkey ranges for
  pruning + the exact x/y predicate on top, so results are exact no
  matter how coarse the range budget is.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .. import datagen

# Default extent: the synthetic PLSS window (datagen.X0..Y1).  Any
# fixed extent works -- the key only has to be consistent between
# cluster time and query time.
EXTENT = (datagen.X0, datagen.Y0, datagen.X1, datagen.Y1)

# Bit-spread masks (16 -> 32 bit interleave), the classic magic-number
# ladder: after step k every source bit sits 2^k positions apart.
_SPREAD = ((8, 0x00FF00FF), (4, 0x0F0F0F0F),
           (2, 0x33333333), (1, 0x55555555))


def _spread_bits(c: Column) -> Column:
    """Spread the low 16 bits of a long column to even bit positions
    (native shifts/ands -- stays in whole-stage codegen)."""
    for shift, mask in _SPREAD:
        c = (c.bitwiseOR(F.shiftleft(c, shift))).bitwiseAND(F.lit(mask))
    return c


def _quantize(v: Column, lo: float, hi: float, bits: int) -> Column:
    """Value -> integer cell in [0, 2^bits), clamped at the edges."""
    n = 1 << bits
    cell = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(n)) \
        .cast('long')
    return F.greatest(F.lit(0).cast('long'),
                      F.least(F.lit(n - 1).cast('long'), cell))


def morton_key(x: Column, y: Column, bits: int = 16,
               extent=EXTENT) -> Column:
    """Interleaved Morton key of a point: x bits at even positions, y
    at odd.  ``bits`` <= 16 (key fits 2*bits bits of a long)."""
    if not 1 <= bits <= 16:
        raise ValueError(f'bits must be in [1, 16], got {bits}')
    x0, y0, x1, y1 = extent
    qx = _quantize(x, x0, x1, bits)
    qy = _quantize(y, y0, y1, bits)
    return _spread_bits(qx).bitwiseOR(F.shiftleft(_spread_bits(qy), 1))


def zorder_cluster(df: DataFrame, x_col: str = 'x', y_col: str = 'y',
                   bits: int = 16, partitions: int = None,
                   extent=EXTENT, key_col: str = 'zkey') -> DataFrame:
    """Lay the table out in Morton order: one range shuffle
    (repartitionByRange samples the key distribution, so skewed point
    clouds still split evenly) + an in-partition sort so every parquet
    row group written from this frame covers a compact z interval.
    """
    keyed = df.withColumn(
        key_col, morton_key(F.col(x_col), F.col(y_col), bits, extent))
    parted = (keyed.repartitionByRange(partitions, key_col)
              if partitions else keyed.repartitionByRange(key_col))
    return parted.sortWithinPartitions(key_col)


def _quantize_py(v: float, lo: float, hi: float, bits: int) -> int:
    n = 1 << bits
    import math
    cell = math.floor((v - lo) / (hi - lo) * n)
    return max(0, min(n - 1, cell))


def zorder_ranges(x0: float, y0: float, x1: float, y1: float,
                  bits: int = 16, extent=EXTENT,
                  max_ranges: int = 64) -> list:
    """Decompose a bbox into inclusive (zlo, zhi) intervals covering
    every cell the box touches.

    Quadtree walk over z-space: a node whose cell square lies fully
    inside the (quantized) box emits its whole contiguous z interval;
    a partial overlap recurses into the four Morton-ordered quadrants
    ((dy*2+dx) * quarter-size offsets).  Exact by construction; the
    ``max_ranges`` budget then greedily merges the closest adjacent
    intervals, which only ADDS cells (false positives a residual
    predicate filters) -- never drops any.  Driver-side pure python on
    at most O(perimeter) nodes; microseconds next to any scan.
    """
    ex0, ey0, ex1, ey1 = extent
    cx0 = _quantize_py(x0, ex0, ex1, bits)
    cx1 = _quantize_py(x1, ex0, ex1, bits)
    cy0 = _quantize_py(y0, ey0, ey1, bits)
    cy1 = _quantize_py(y1, ey0, ey1, bits)
    if cx0 > cx1 or cy0 > cy1:
        # inverted box: empty query, like a plain x0 <= x <= x1
        # filter with x0 > x1 (the recursion would prune every leaf
        # and the merge below would index into an empty list)
        return []
    out = []

    def rec(nx: int, ny: int, size: int, z0: int):
        if nx > cx1 or nx + size - 1 < cx0 \
                or ny > cy1 or ny + size - 1 < cy0:
            return
        if nx >= cx0 and nx + size - 1 <= cx1 \
                and ny >= cy0 and ny + size - 1 <= cy1:
            out.append((z0, z0 + size * size - 1))
            return
        h = size // 2
        q = h * h
        rec(nx, ny, h, z0)
        rec(nx + h, ny, h, z0 + q)
        rec(nx, ny + h, h, z0 + 2 * q)
        rec(nx + h, ny + h, h, z0 + 3 * q)

    rec(0, 0, 1 << bits, 0)
    out.sort()
    # Coalesce touching intervals (free), then keep only the
    # (max_ranges - 1) LARGEST gaps as separators -- one sort, and
    # exactly the fixed point the merge-smallest-gap greedy reaches
    # (every discarded gap gets absorbed; a fine decomposition of a
    # 2^16 grid has ~perimeter/2 intervals, so an O(n^2) greedy here
    # costs tens of seconds of driver time).
    merged = [out[0]]
    for lo, hi in out[1:]:
        if lo <= merged[-1][1] + 1:
            merged[-1] = (merged[-1][0], max(merged[-1][1], hi))
        else:
            merged.append((lo, hi))
    if len(merged) > max_ranges:
        gaps = sorted(((merged[i + 1][0] - merged[i][1], i)
                       for i in range(len(merged) - 1)), reverse=True)
        seps = sorted(i for _, i in gaps[:max_ranges - 1])
        squeezed, start = [], merged[0][0]
        for i in seps:
            squeezed.append((start, merged[i][1]))
            start = merged[i + 1][0]
        squeezed.append((start, merged[-1][1]))
        merged = squeezed
    return merged


def bbox_scan(df: DataFrame, x0: float, y0: float, x1: float,
              y1: float, bits: int = 16, extent=EXTENT,
              x_col: str = 'x', y_col: str = 'y',
              key_col: str = 'zkey', max_ranges: int = 64) -> DataFrame:
    """Exact bbox query over a z-clustered table.

    The zkey BETWEEN disjunction is an ordinary pushable range
    predicate -- on a :func:`zorder_cluster`-written table it prunes
    at the parquet row-group level (the layout made min/max stats on
    ``key_col`` tight).  The exact x/y predicate stacks on top, so
    the result is identical to a plain bbox filter regardless of how
    coarse ``max_ranges`` merged the intervals.
    """
    ranges = zorder_ranges(x0, y0, x1, y1, bits, extent, max_ranges)
    zc = F.col(key_col)
    pred = F.lit(False) if not ranges else None
    for lo, hi in ranges:
        leg = zc.between(lo, hi)
        pred = leg if pred is None else pred | leg
    exact = ((F.col(x_col) >= x0) & (F.col(x_col) <= x1)
             & (F.col(y_col) >= y0) & (F.col(y_col) <= y1))
    return df.filter(pred & exact)
