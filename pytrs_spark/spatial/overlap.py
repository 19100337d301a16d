"""Rectangle-rectangle overlap join: all (left, right) box pairs with
positive-area intersection, plus the exact overlap area.

Engine extension (SURVEY.md §2.7 G17) -- no reference counterpart
(pyTRS has no spatial runtime).  The vector-vector companion to the
point-in-polygon join (`join.py`) and the radius join (`radius.py`):
"which lease bounding boxes intersect which section/aliquot tiles".

Scale shape -- the PBSM / reference-point pattern (Patel & DeWitt,
SIGMOD'96; same family as the partitioned spatial joins PAPERS.md
cites):

1. Both rectangle sets explode DRIVER-FREE into their covering cell
   sets at resolution ``res`` (native ``cover_cells`` sequence
   expression, `grid.py:160`) -- cost O(area / cell_size^2) rows per
   box, tunable by ``res``.
2. One equi-join on ``cell`` co-locates every candidate pair.  A pair
   overlapping k cells meets k times; instead of a shuffle-heavy
   ``distinct()``, each surviving pair is emitted ONLY by the single
   cell that contains the intersection's min corner (the "reference
   point") -- a codegen-native filter, so dedup costs zero extra
   exchanges and the output is exactly-once by construction.
3. The exact overlap test is a whole-stage-codegen interval
   comparison; no Python anywhere.

At 10^12 boxes the plan is one exchange per side (by ``cell``) with
AQE absorbing hot cells; ``broadcast_right=True`` pins the classic
small-dim case (a few thousand query boxes against the full tile
layer) to a broadcast hash join so the big side never shuffles.
"""

from pyspark.sql import DataFrame, functions as F

from .grid import RES_SIZE, cell_id, cover_cells

JOIN_RES = 7


def bbox_overlap_join(left: DataFrame, right: DataFrame,
                      res: int = JOIN_RES,
                      left_id: str = 'id_l', right_id: str = 'id_r',
                      broadcast_right: bool = False) -> DataFrame:
    """All (left, right) pairs of axis-aligned boxes whose interiors
    intersect, with the exact intersection area.

    Both inputs need ``(<id>, xmin, ymin, xmax, ymax)``.  Returns
    ``(left_id, right_id, overlap_area)``; edge-touching boxes (zero
    area) do NOT pair, so float-equality ties never decide membership.
    """
    if res not in RES_SIZE:
        raise ValueError(f'res must be one of {sorted(RES_SIZE)}')

    lc = left.select(
        left_id,
        F.col('xmin').alias('lx0'), F.col('ymin').alias('ly0'),
        F.col('xmax').alias('lx1'), F.col('ymax').alias('ly1'),
        F.explode(cover_cells(F.col('xmin'), F.col('ymin'),
                              F.col('xmax'), F.col('ymax'), res))
        .alias('cell'))
    rc = right.select(
        right_id,
        F.col('xmin').alias('rx0'), F.col('ymin').alias('ry0'),
        F.col('xmax').alias('rx1'), F.col('ymax').alias('ry1'),
        F.explode(cover_cells(F.col('xmin'), F.col('ymin'),
                              F.col('xmax'), F.col('ymax'), res))
        .alias('cell'))
    if broadcast_right:
        rc = F.broadcast(rc)

    ix0 = F.greatest('lx0', 'rx0')
    iy0 = F.greatest('ly0', 'ry0')
    ix1 = F.least('lx1', 'rx1')
    iy1 = F.least('ly1', 'ry1')
    # Reference-point dedup: of the k cells where an overlapping pair
    # meets, exactly one contains the intersection's min corner
    # ((ix0, iy0) lies inside both half-open boxes, so that cell is in
    # both covers by construction) -- emit there and only there.
    return (lc.join(rc, 'cell')
            .filter((ix0 < ix1) & (iy0 < iy1)
                    & (F.col('cell') == cell_id(ix0, iy0, res)))
            .select(left_id, right_id,
                    ((ix1 - ix0) * (iy1 - iy0)).alias('overlap_area')))


def zonal_overlap_stats(zones: DataFrame, feats: DataFrame,
                        value_col: str = 'val', res: int = JOIN_RES,
                        zone_id: str = 'zone_id',
                        feat_id: str = 'feat_id',
                        broadcast_zones: bool = True) -> DataFrame:
    """G20: area-weighted zonal statistics over rectangle geometry --
    for every zone box, aggregate the features whose boxes overlap
    it, weighted by exact intersection area (the vector-vector
    counterpart of the pixel zonal stats in ``raster.py``: "mean
    lease value per section tile, weighted by how much of each lease
    lies inside").

    Inputs need ``(<id>, xmin, ymin, xmax, ymax)`` (+ ``value_col`` on
    ``feats``).  Returns one row per zone with >= 1 overlapping
    feature: ``(zone_id, n_feats, area_sum, val_area_sum,
    area_wmean)`` where ``area_sum = sum(overlap_area)``,
    ``val_area_sum = sum(value * overlap_area)`` and ``area_wmean =
    val_area_sum / area_sum``.

    Determinism: per-pair terms are single IEEE multiplies; when the
    coordinates sit on a binary grid (multiples of 2^-k) and values
    are integers, every term -- and therefore every SUM, in any
    accumulation order -- is exact, so the output is bit-reproducible
    across partitionings and engines (the oracle relies on this; for
    arbitrary float inputs the usual last-ulp sum variance applies).

    Scale shape: the same PBSM reference-point join as
    :func:`bbox_overlap_join` (each overlapping pair emitted exactly
    once by the cell holding the intersection's min corner -- no
    ``distinct()``), immediately reduced by a partial-agg ``groupBy``
    on the zone key, so only (zone_id, 3 doubles) ride the final
    exchange.  ``broadcast_zones`` (default) pins the classic
    small-zone-layer case so the 10^12-row feature side never
    shuffles at all; set False for huge zone layers and the cell
    equi-join + AQE takes over.
    """
    if res not in RES_SIZE:
        raise ValueError(f'res must be one of {sorted(RES_SIZE)}')

    zc = zones.select(
        zone_id,
        F.col('xmin').alias('zx0'), F.col('ymin').alias('zy0'),
        F.col('xmax').alias('zx1'), F.col('ymax').alias('zy1'),
        F.explode(cover_cells(F.col('xmin'), F.col('ymin'),
                              F.col('xmax'), F.col('ymax'), res))
        .alias('cell'))
    if broadcast_zones:
        zc = F.broadcast(zc)
    fc = feats.select(
        feat_id, F.col(value_col).alias('_val'),
        F.col('xmin').alias('fx0'), F.col('ymin').alias('fy0'),
        F.col('xmax').alias('fx1'), F.col('ymax').alias('fy1'),
        F.explode(cover_cells(F.col('xmin'), F.col('ymin'),
                              F.col('xmax'), F.col('ymax'), res))
        .alias('cell'))

    ix0 = F.greatest('zx0', 'fx0')
    iy0 = F.greatest('zy0', 'fy0')
    ix1 = F.least('zx1', 'fx1')
    iy1 = F.least('zy1', 'fy1')
    oa = (ix1 - ix0) * (iy1 - iy0)
    pairs = (fc.join(zc, 'cell')
             .filter((ix0 < ix1) & (iy0 < iy1)
                     & (F.col('cell') == cell_id(ix0, iy0, res)))
             .select(zone_id, oa.alias('_oa'),
                     (F.col('_val') * oa).alias('_voa'),
                     # area of VALUED features only: the weighted
                     # mean's denominator must not count null-valued
                     # features' area (that silently treats their
                     # value as 0); they still count in n_feats and
                     # area_sum, which describe coverage, not value.
                     F.when(F.col('_val').isNotNull(), oa)
                     .alias('_oav')))
    return (pairs.groupBy(zone_id)
            .agg(F.count('*').alias('n_feats'),
                 F.sum('_oa').alias('area_sum'),
                 F.sum('_voa').alias('val_area_sum'),
                 F.sum('_oav').alias('_va'))
            .withColumn('area_wmean',
                        F.col('val_area_sum') / F.col('_va'))
            .drop('_va'))
