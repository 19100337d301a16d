"""G15 radius join: cell-disk expansion + exact refinement vs a
brute-force cross-join oracle, both join strategies."""

import math

import pytest
from pyspark.sql import functions as F

from pytrs_spark.spatial.radius import radius_join


def _pts(spark, n=400):
    """Deterministic point cloud inside the synthetic PLSS window."""
    from pytrs_spark import datagen
    return spark.range(n).select(
        F.concat(F.lit('p'), F.col('id')).alias('image_id'),
        (F.lit(datagen.X0) + ((F.col('id') * 2654435761) % 2147483648)
         .cast('double') / 2147483648.0
         * (datagen.X1 - datagen.X0)).alias('x'),
        (F.lit(datagen.Y0) + ((F.col('id') * 1597334677) % 2147483648)
         .cast('double') / 2147483648.0
         * (datagen.Y1 - datagen.Y0)).alias('y'))


def _centers(spark, n=7):
    from pytrs_spark import datagen
    return spark.range(n).select(
        F.col('id').alias('center_id'),
        (F.lit(datagen.X0) + ((F.col('id') * 2246822519) % 2147483648)
         .cast('double') / 2147483648.0
         * (datagen.X1 - datagen.X0)).alias('cx'),
        (F.lit(datagen.Y0) + ((F.col('id') * 3266489917) % 2147483648)
         .cast('double') / 2147483648.0
         * (datagen.Y1 - datagen.Y0)).alias('cy'))


def _brute(spark, pts, centers, r):
    rows = []
    P = pts.collect()
    for c in centers.collect():
        for p in P:
            d2 = (p['x'] - c['cx']) ** 2 + (p['y'] - c['cy']) ** 2
            if d2 <= r * r:
                rows.append((c['center_id'], p['image_id'],
                             math.sqrt(d2)))
    return set(rows)


@pytest.mark.parametrize('res', [7, 8, 9])
def test_radius_join_matches_brute_force(spark, res):
    pts, centers = _pts(spark), _centers(spark)
    got = {(r['center_id'], r['image_id'], r['dist'])
           for r in radius_join(pts, centers, 4.0, res=res).collect()}
    assert got == _brute(spark, pts, centers, 4.0)
    assert got   # non-vacuous


def test_radius_join_shuffle_path_identical(spark):
    pts, centers = _pts(spark), _centers(spark)
    b = {(r['center_id'], r['image_id'])
         for r in radius_join(pts, centers, 4.0).collect()}
    s = {(r['center_id'], r['image_id'])
         for r in radius_join(pts, centers, 4.0,
                              broadcast_centers=False).collect()}
    assert b == s


def test_radius_join_boundary_is_closed_ball(spark):
    # point at EXACTLY distance r (3-4-5 triangle: no float slop)
    pts = spark.createDataFrame(
        [('on', -600.0 + 3.0, 900.0 + 4.0),
         ('out', -600.0 + 3.0, 900.0 + 4.0000001)],
        'image_id string, x double, y double')
    centers = spark.createDataFrame(
        [(0, -600.0, 900.0)], 'center_id long, cx double, cy double')
    rows = radius_join(pts, centers, 5.0).collect()
    assert [(r['image_id'], r['dist']) for r in rows] == [('on', 5.0)]


def test_radius_join_rejects_bad_params(spark):
    pts, centers = _pts(spark, 5), _centers(spark, 1)
    with pytest.raises(ValueError):
        radius_join(pts, centers, 0.0)
    with pytest.raises(ValueError):
        radius_join(pts, centers, 1.0, res=3)


def test_radius_join_plan_has_no_point_side_shuffle(spark):
    pts, centers = _pts(spark), _centers(spark)
    plan = radius_join(pts, centers, 3.0) \
        ._jdf.queryExecution().executedPlan().toString()
    assert 'BroadcastHashJoin' in plan
    # the only exchange is the broadcast of the expanded centers
    assert 'Exchange hashpartitioning' not in plan


def test_radius_closed_ball_cell_aligned_boundary(spark):
    """A point at EXACTLY distance r whose coordinate is cell-aligned
    must be found: the half-open cover would drop the cell containing
    it even though the exact filter passes (regression pin for the
    closed cover)."""
    from pytrs_spark.spatial.radius import radius_join
    centers = spark.createDataFrame(
        [('c', -600.0, 900.0)], 'center_id string, cx double, cy double')
    # res=7 cells are 1.0 wide; -600 + 5 = -595 is a cell edge
    points = spark.createDataFrame(
        [('p_edge', -595.0, 900.0),     # dist exactly 5.0, on an edge
         ('p_in', -596.5, 900.0),       # well inside
         ('p_out', -594.9, 900.0)],     # just outside
        'image_id string, x double, y double')
    got = {r['image_id']: r['dist']
           for r in radius_join(points, centers, 5.0, res=7).collect()}
    assert set(got) == {'p_edge', 'p_in'}
    assert abs(got['p_edge'] - 5.0) < 1e-12


def test_dbscan_cell_aligned_core_edge(spark):
    """Two cores exactly eps apart on a cell edge must connect (the
    half-open disk made the pair asymmetric and could split the
    cluster)."""
    from pytrs_spark.spatial.dbscan import dbscan
    rows = [(1, -600.0, 900.0), (2, -599.0, 900.0)]
    df = spark.createDataFrame(rows, 'id long, x double, y double')
    out = {r['id']: (r['cluster_id'], r['role'])
           for r in dbscan(df, eps=1.0, min_pts=2, res=7).collect()}
    # each point's closed ball holds both points -> both core, one
    # cluster labeled by the min id
    assert out == {1: (1, 'core'), 2: (1, 'core')}
