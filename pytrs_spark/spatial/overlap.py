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
