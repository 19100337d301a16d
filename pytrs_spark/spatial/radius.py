"""Radius (within-distance) join: all (center, point) pairs with
``dist(center, point) <= radius``.

Engine extension (SURVEY.md §2.7 G15) -- no reference counterpart
(pyTRS has no spatial runtime); the standard companion to the
cell-index equi-join (`join.py`) and the corner kNN (`knn.py`):
"which images fall within R miles of each monitoring station".

Scale shape (same contract as the PIP join, `join.py:1-30`):

1. Each center expands DRIVER-FREE into the cell disk that covers its
   ``radius``-ball at resolution ``res`` -- a native
   ``cover_cells`` sequence expression, ``(2*ceil(r/s) + 1)^2`` cells
   per center (`grid.py:160`).
2. The exploded (cell, center) table is tiny relative to the point
   side (|centers| x disk) and joins the points' ``cell_id`` by
   broadcast hash -- the 10^12-row image side NEVER shuffles.  When
   the expanded center table outgrows the broadcast budget the same
   plan degrades to a shuffle equi-join on ``cell`` (AQE handles
   skewed cells; ``broadcast_centers=False`` forces it).
3. The exact Euclidean test runs as one whole-stage-codegen
   comparison of SQUARED distances (no sqrt in the filter; the
   reported ``dist`` column computes sqrt only on survivors).

Resolution choice: cells of size ``s`` cost ``O((r/s)^2)`` index rows
per center but admit ``O(s)`` ring slop per candidate; ``res`` should
keep the disk a few hundred cells (r/s in [3, 15] is the sweet spot).
Correctness never depends on it -- the exact test removes every
false candidate, and the disk covers the ball by construction.
"""

from pyspark.sql import DataFrame, functions as F

from .grid import RES_SIZE, cell_id, cover_cells_closed

JOIN_RES = 7


def radius_join(points: DataFrame, centers: DataFrame, radius: float,
                res: int = JOIN_RES, broadcast_centers: bool = True,
                point_id: str = 'image_id', center_id: str = 'center_id',
                ) -> DataFrame:
    """All (center, point) pairs within ``radius`` on the plane.

    ``points`` needs (point_id, x, y); ``centers`` needs
    (center_id, cx, cy).  Returns (center_id, point_id, dist) with
    ``dist`` the exact Euclidean distance (<= radius, closed ball).
    """
    if radius <= 0:
        raise ValueError(f'radius must be positive, got {radius}')
    if res not in RES_SIZE:
        raise ValueError(f'res must be one of {sorted(RES_SIZE)}')
    cx, cy, r = F.col('cx'), F.col('cy'), F.lit(float(radius))
    # CLOSED cover: the ball is dist <= r, so a cell-aligned cx + r
    # boundary point's cell must be in the disk (the half-open
    # cover_cells would drop exactly-at-distance pairs there).
    disk = centers.select(
        center_id, 'cx', 'cy',
        F.explode(cover_cells_closed(cx - r, cy - r, cx + r, cy + r,
                                     res)).alias('cell'))
    if broadcast_centers:
        disk = F.broadcast(disk)
    pts = points.select(
        point_id, 'x', 'y',
        cell_id(F.col('x'), F.col('y'), res).alias('cell'))
    d2 = ((F.col('x') - cx) * (F.col('x') - cx)
          + (F.col('y') - cy) * (F.col('y') - cy))
    return (pts.join(disk, 'cell')
            .filter(d2 <= r * r)
            .select(center_id, point_id, F.sqrt(d2).alias('dist')))
