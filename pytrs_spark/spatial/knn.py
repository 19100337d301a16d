"""kNN to section corners via sorted-cell-neighbour ring expansion.

Section corners form the integer-mile lattice over the covered domain.
Rather than an all-pairs cross join, each point joins only the corners
in the Chebyshev k-ring of its res-7 (1 mi) cell, with the ring radius
growing adaptively until every point has its k neighbours *provably*
correct:

    a candidate set found within ring radius r is final once the
    k-th candidate's distance <= (r) * cell_size -- because any corner
    outside the ring is at least that far away (ring-safety margin).

Points that fail the guarantee re-join at radius r+1 (anti-join keeps
the finished ones out), which is the distributed analogue of the
sorted-neighbour expansion in the stream-kNN literature (PAPERS.md,
SIGMOD'21): no shuffle of the corner side (broadcast), no all-pairs.
"""

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..datagen import X0, X1, Y0, Y1


def section_corners(spark) -> DataFrame:
    """The integer-mile corner lattice over the covered domain."""
    xs = spark.range(int(X0), int(X1) + 1).select(
        F.col('id').cast('double').alias('cx'))
    ys = spark.range(int(Y0), int(Y1) + 1).select(
        F.col('id').cast('double').alias('cy'))
    return xs.crossJoin(ys)


def knn_section_corners(points: DataFrame, k: int = 4,
                        max_radius: int = 8) -> DataFrame:
    """k nearest corners per point.  Input needs image_id + phash (or
    precomputed x/y); output (image_id, rank, cx, cy, dist2).

    Deterministic tie-break: (dist2, cx, cy).
    """
    from .grid import anchor_xy

    if 'x' not in points.columns:
        x, y = anchor_xy(F.col('phash'))
        pts = points.select('image_id', x.alias('x'), y.alias('y'))
    else:
        pts = points.select('image_id', 'x', 'y')

    spark = points.sparkSession
    corners = section_corners(spark)

    # Base cell of each point on the 1-mile lattice.
    pts = pts.withColumn('ix', F.floor('x').cast('long')) \
             .withColumn('iy', F.floor('y').cast('long'))

    remaining = pts
    finished = []
    # k=4 nearest corners can be as far as sqrt(2) mi, so radius 1 can
    # never satisfy the safety margin -- start at 2.
    radius = 2
    while radius <= max_radius:
        # Candidate corners: all lattice points within Chebyshev
        # distance `radius` of the point's cell -- join via exploded
        # neighbour offsets against the broadcast corner lattice.
        # (Offsets reach radius+1 on the high side because the corner
        # at ix+radius+1 bounds the cell [ix+radius, ix+radius+1).)
        offs = F.sequence(F.lit(-radius), F.lit(radius + 1))
        cand = remaining.withColumn(
            'cx', F.explode(F.transform(
                offs, lambda d: (F.col('ix') + d).cast('double')))) \
            .withColumn(
            'cy', F.explode(F.transform(
                offs, lambda d: (F.col('iy') + d).cast('double'))))
        cand = cand.join(F.broadcast(corners), ['cx', 'cy'])
        d2 = ((F.col('x') - F.col('cx')) ** 2
              + (F.col('y') - F.col('cy')) ** 2)
        w = Window.partitionBy('image_id').orderBy(
            'dist2', 'cx', 'cy')
        ranked = (cand.withColumn('dist2', d2)
                  .withColumn('rank', F.row_number().over(w))
                  .filter(F.col('rank') <= k))
        # Safety: the k-th distance must fit inside the ring.
        counts = ranked.groupBy('image_id').agg(
            F.count('*').alias('_n'), F.max('dist2').alias('_maxd2'))
        safe_ids = counts.filter(
            (F.col('_n') == k)
            & (F.sqrt('_maxd2') <= F.lit(float(radius)))) \
            .select('image_id')
        finished.append(ranked.join(F.broadcast(safe_ids), 'image_id',
                                    'left_semi'))
        remaining = remaining.join(safe_ids, 'image_id', 'left_anti')
        if remaining.isEmpty():
            break
        radius += 1

    out = finished[0]
    for part in finished[1:]:
        out = out.unionByName(part)
    return out.select('image_id', 'rank', 'cx', 'cy', 'dist2')
