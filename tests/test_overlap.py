"""G17 bbox overlap join: brute-force parity + exactly-once emission."""

import itertools
import random

import pytest
from pyspark.sql import functions as F

from pytrs_spark.spatial.overlap import bbox_overlap_join


def _brute(left, right):
    out = {}
    for (il, lx0, ly0, lx1, ly1), (ir, rx0, ry0, rx1, ry1) in \
            itertools.product(left, right):
        ix0, iy0 = max(lx0, rx0), max(ly0, ry0)
        ix1, iy1 = min(lx1, rx1), min(ly1, ry1)
        if ix0 < ix1 and iy0 < iy1:
            out[(il, ir)] = (ix1 - ix0) * (iy1 - iy0)
    return out


def _df(spark, rows, idc):
    return spark.createDataFrame(
        rows, f'{idc} long, xmin double, ymin double, '
              'xmax double, ymax double')


def test_overlap_vs_brute_force(spark):
    rnd = random.Random(7)
    left = [(i, x, y, x + w, y + h)
            for i in range(60)
            for x, y, w, h in [(rnd.uniform(-20, 20), rnd.uniform(-20, 20),
                                rnd.uniform(0.1, 8), rnd.uniform(0.1, 8))]]
    right = [(i, x, y, x + w, y + h)
             for i in range(40)
             for x, y, w, h in [(rnd.uniform(-20, 20), rnd.uniform(-20, 20),
                                 rnd.uniform(0.1, 8), rnd.uniform(0.1, 8))]]
    rows = bbox_overlap_join(_df(spark, left, 'id_l'),
                             _df(spark, right, 'id_r')).collect()
    # exactly-once: no pair may appear twice (the reference-point
    # filter replaces distinct())
    keys = [(r['id_l'], r['id_r']) for r in rows]
    assert len(keys) == len(set(keys))
    got = {(r['id_l'], r['id_r']): r['overlap_area'] for r in rows}
    brute = _brute(left, right)
    assert set(got) == set(brute)
    for k, v in brute.items():
        assert got[k] == pytest.approx(v, rel=1e-12)


def test_overlap_edge_touch_and_containment(spark):
    # edge-touching boxes (zero-area intersection) never pair;
    # containment reports the inner box's area; multi-cell spans
    # still emit once.
    left = [(1, 0.0, 0.0, 4.0, 4.0),     # big box spanning 16 cells
            (2, 10.0, 10.0, 11.0, 11.0)]
    right = [(10, 1.0, 1.0, 2.0, 2.0),   # contained in 1
             (11, 4.0, 0.0, 5.0, 4.0),   # touches 1's right edge only
             (12, -3.5, -3.5, 0.5, 0.5)]  # corner overlap with 1
    got = {(r['id_l'], r['id_r']): r['overlap_area']
           for r in bbox_overlap_join(_df(spark, left, 'id_l'),
                                      _df(spark, right, 'id_r'),
                                      broadcast_right=True).collect()}
    assert got == {(1, 10): pytest.approx(1.0),
                   (1, 12): pytest.approx(0.25)}


def test_overlap_negative_coords_res(spark):
    # negative-coordinate cells (floor semantics) at each resolution
    left = [(1, -7.3, -2.1, -6.2, -0.4)]
    right = [(2, -6.9, -1.0, -6.0, 0.2)]
    for res in (7, 8, 9):
        got = bbox_overlap_join(_df(spark, left, 'id_l'),
                                _df(spark, right, 'id_r'),
                                res=res).collect()
        assert len(got) == 1
        assert got[0]['overlap_area'] == pytest.approx(0.7 * 0.6, rel=1e-9)
