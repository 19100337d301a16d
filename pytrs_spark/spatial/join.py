"""Spatial join: broadcast cell-index equi-join + exact ray-casting
point-in-polygon refinement + deterministic tile assignment, with
explicit salted-key skew handling.

Plan shape (the one we want at 100 TB):

1. polygon layer -> explode covering cells at the join resolution ->
   **broadcast** (the polygon-cell index is small: O(sections x 16)).
2. images -> narrow projection (no ``bytes``) -> equi hash join on
   ``cell`` against the broadcast index.  No shuffle of the image side
   at all.
3. exact PIP refinement in a vectorized numpy pandas UDF (even-odd ray
   casting over the polygon ring; for half-open axis-aligned boxes the
   crossing rule is exact and deterministic on shared edges).
4. tile assignment: ``row_number() over (partition by image_id order
   by trs, qq)`` -- deterministic smallest-key tie-break.

Skew: dense cells (many images in one cell) do NOT skew a broadcast
join (no shuffle by cell).  The salt path exists for the shuffle-join
variant (forced when the polygon side exceeds the broadcast
threshold): images get ``salt = pmod(xxhash64(image_id), S)``, the
polygon-cell index is exploded x S, and the join key becomes
``(cell, salt)`` -- plus AQE skew-join as belt and braces.
"""

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .grid import RES_SIZE, cover_cells

JOIN_RES = 9   # 0.25 mi cells == depth-2 QQ size: ~1 candidate/point


def polygon_cell_index(polygons: DataFrame, res: int = JOIN_RES) -> DataFrame:
    """Explode each polygon to its covering cells at ``res`` (native)."""
    return polygons.select(
        'trs', 'qq', 'xmin', 'ymin', 'xmax', 'ymax',
        'ring_xs', 'ring_ys',
        F.explode(cover_cells(
            F.col('xmin'), F.col('ymin'), F.col('xmax'), F.col('ymax'),
            res)).alias('cell'))


@F.pandas_udf(T.BooleanType())
def _pip_refine(px: pd.Series, py: pd.Series,
                ring_xs: pd.Series, ring_ys: pd.Series) -> pd.Series:
    """Exact even-odd ray-casting point-in-polygon, vectorized.

    General simple-polygon implementation (not a bbox shortcut), per
    the north rule; for axis-aligned half-open boxes the crossing rule
    lands exactly on [xmin, xmax) x [ymin, ymax).

    Rows are grouped by ring vertex count so every edge test runs as a
    (rows, ) numpy op -- no per-row Python, no per-ring grouping (the
    previous tuple-keyed groupby cost ~100 us/row and was the scaling
    bottleneck of the whole join).
    """
    x = px.to_numpy(dtype=np.float64)
    y = py.to_numpy(dtype=np.float64)
    n = len(x)
    inside = np.zeros(n, dtype=bool)
    lens = ring_xs.map(len).to_numpy()
    for m in np.unique(lens):
        ii = np.nonzero(lens == m)[0]
        xs = np.array([ring_xs.iat[i] for i in ii], dtype=np.float64)
        ys = np.array([ring_ys.iat[i] for i in ii], dtype=np.float64)
        pxs, pys = x[ii], y[ii]
        hit = np.zeros(len(ii), dtype=bool)
        for k in range(m):
            x1, y1 = xs[:, k], ys[:, k]
            x2, y2 = xs[:, (k + 1) % m], ys[:, (k + 1) % m]
            crosses = (y1 > pys) != (y2 > pys)
            with np.errstate(divide='ignore', invalid='ignore'):
                xint = (x2 - x1) * (pys - y1) / (y2 - y1) + x1
            hit ^= crosses & (pxs < xint)
        inside[ii] = hit
    return pd.Series(inside)


def spatial_join(points: DataFrame, polygons: DataFrame,
                 res: int = JOIN_RES, broadcast_index: bool = True,
                 salt: int = 0) -> DataFrame:
    """points (with ``cell{res}``, ``x``, ``y``) x polygons -> matched
    candidate rows refined by exact PIP.

    ``salt > 0`` switches to the salted shuffle-join path for the
    case where the polygon-cell index outgrows the broadcast
    threshold: images carry ``pmod(xxhash64(image_id), salt)`` and the
    index is exploded x salt, so one hot cell spreads over ``salt``
    shuffle partitions.
    """
    index = polygon_cell_index(polygons, res)
    cell_col = f'cell{res}'
    pts = points.withColumnRenamed(cell_col, 'cell')

    if salt > 0:
        pts = pts.withColumn(
            'salt', F.pmod(F.xxhash64('image_id'), F.lit(salt)))
        index = index.withColumn(
            'salt', F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))) \
            .withColumn('salt', F.col('salt').cast('long'))
        joined = pts.join(index, ['cell', 'salt'])
    else:
        if broadcast_index:
            index = F.broadcast(index)
        joined = pts.join(index, 'cell')

    return joined.filter(
        _pip_refine(F.col('x'), F.col('y'),
                    F.col('ring_xs'), F.col('ring_ys')))


def assign_tiles(matches: DataFrame) -> DataFrame:
    """One deterministic (trs, qq) tile per image: smallest (trs, qq)
    wins (explicit tie-break so output is byte-stable under any
    parallelism).

    Implemented as ``min(struct(trs, qq, payload...))`` rather than a
    ``row_number`` window: lexicographic struct-min is the same
    tie-break but gets map-side partial aggregation, so the shuffle
    carries ~1 row per image instead of every candidate row sorted.
    """
    # The ring vertex arrays are polygon-side working data; the tile
    # row doesn't need them (and arrays through an agg cost memory).
    payload = [c for c in matches.columns
               if c not in ('image_id', 'trs', 'qq',
                            'ring_xs', 'ring_ys')]
    best = F.min(F.struct('trs', 'qq', *payload)).alias('_best')
    agg = matches.groupBy('image_id').agg(best)
    return agg.select(
        'image_id',
        F.col('_best')['trs'].alias('trs'),
        F.col('_best')['qq'].alias('qq'),
        *[F.col('_best')[c].alias(c) for c in payload])


def assign_tiles_local(matches: DataFrame) -> DataFrame:
    """Zero-shuffle tile assignment for candidate streams where each
    image's candidates are CONTIGUOUS WITHIN ONE PARTITION -- which is
    exactly what :func:`spatial_join` produces: one probe row per
    image, and both the broadcast hash join and the salted shuffle
    join emit all matches of a probe row consecutively (the salted
    path also co-locates them, since an image has a single
    (cell, salt) key).

    Same output and tie-break as :func:`assign_tiles` (lexicographic
    min over (trs, qq); (trs, qq) is unique per image's candidate set,
    so the payload never participates) -- but implemented as a
    partition-local streaming reduction with an O(1) carry row across
    Arrow batches, so NOTHING shuffles.  At 96M images the struct-min
    groupBy exchanged ~the whole candidate set (~11 GB serialized
    through one node's shuffle machinery) and flattened the core-
    scaling curve; this path removes that exchange entirely.  Measured
    (BENCH.md): the global-agg form ran local[32] == local[8] at 96M
    rows (shuffle-bound); this form restores compute-bound scaling.

    Falls back conceptually to :func:`assign_tiles` for inputs with
    arbitrary provenance -- keep using that one when candidates may
    span partitions.
    """
    work = matches.drop('ring_xs', 'ring_ys')
    schema = work.schema

    def reduce_partition(batches):
        carry = None            # one-row pdf: best-so-far of last id
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if carry is not None:
                if pdf['image_id'].iat[0] == carry['image_id'].iat[0]:
                    pdf = pd.concat([carry, pdf], ignore_index=True)
                else:
                    yield carry
                carry = None
            ids = pdf['image_id']
            key = pdf['trs'] + '\x00' + pdf['qq']
            kmin = key.groupby(ids.to_numpy(), sort=False) \
                .transform('min')
            best = pdf.loc[(key == kmin).to_numpy()] \
                .drop_duplicates('image_id', keep='first')
            last_id = ids.iat[len(ids) - 1]
            tail_mask = best['image_id'] == last_id
            carry = best.loc[tail_mask.to_numpy()]
            head = best.loc[(~tail_mask).to_numpy()]
            if len(head):
                yield head
        if carry is not None and len(carry):
            yield carry

    return work.mapInPandas(reduce_partition, schema=schema)


def cell_histogram(points: DataFrame, res: int = JOIN_RES) -> DataFrame:
    """Pre-pass skew histogram: images per cell (used to pick the salt
    factor; map-side combined by Catalyst)."""
    return points.groupBy(f'cell{res}').count()


def pick_salt_factor(points: DataFrame, res: int = JOIN_RES,
                     target_per_task: int = 500_000) -> int:
    """Choose S from the measured histogram: hottest cell divided by
    the per-task target, capped sanely."""
    hot = cell_histogram(points, res).agg(F.max('count')).first()[0] or 0
    return int(min(64, max(0, hot // target_per_task)))
