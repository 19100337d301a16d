"""Z-order clustering (G14): key correctness, range decomposition
exactness, scan equivalence, and pushdown-ability of the range
predicate on a clustered parquet layout."""

import math
import os

import pytest
from pyspark.sql import functions as F

from pytrs_spark.spatial.cluster import (
    EXTENT,
    bbox_scan,
    morton_key,
    zorder_cluster,
    zorder_ranges,
)


def _morton_py(x, y, bits, extent):
    ex0, ey0, ex1, ey1 = extent
    n = 1 << bits
    qx = max(0, min(n - 1, math.floor((x - ex0) / (ex1 - ex0) * n)))
    qy = max(0, min(n - 1, math.floor((y - ey0) / (ey1 - ey0) * n)))
    z = 0
    for i in range(bits):
        z |= ((qx >> i) & 1) << (2 * i)
        z |= ((qy >> i) & 1) << (2 * i + 1)
    return z


def _points(spark, n=500, seed=11):
    import random
    rng = random.Random(seed)
    ex0, ey0, ex1, ey1 = EXTENT
    rows = [(i, ex0 + rng.random() * (ex1 - ex0),
             ey0 + rng.random() * (ey1 - ey0)) for i in range(n)]
    return rows, spark.createDataFrame(
        rows, 'pid long, x double, y double')


def test_morton_key_matches_reference_interleave(spark):
    rows, df = _points(spark)
    for bits in (4, 10, 16):
        got = {r['pid']: r['z'] for r in df.select(
            'pid', morton_key(F.col('x'), F.col('y'), bits)
            .alias('z')).collect()}
        for pid, x, y in rows:
            assert got[pid] == _morton_py(x, y, bits, EXTENT), \
                (bits, pid)


def _plan(df):
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain('formatted')
    return buf.getvalue()


def test_morton_key_is_codegen_native(spark):
    df = spark.range(100).select(
        (F.col('id') * 0.37 + EXTENT[0]).alias('x'),
        (F.col('id') * 0.11 + EXTENT[1]).alias('y'))
    plan = _plan(df.select(
        morton_key(F.col('x'), F.col('y'), 16).alias('z')))
    assert 'Python' not in plan and 'BatchEvalPython' not in plan
    assert 'codegen id' in plan


def test_zorder_ranges_exact_cover():
    """With an unlimited budget the decomposition covers EXACTLY the
    cells the quantized bbox touches (enumerated at bits=6)."""
    bits = 6
    ex0, ey0, ex1, ey1 = EXTENT
    step_x = (ex1 - ex0) / (1 << bits)
    step_y = (ey1 - ey0) / (1 << bits)
    bbox = (ex0 + 3.3 * step_x, ey0 + 7.7 * step_y,
            ex0 + 41.2 * step_x, ey0 + 20.1 * step_y)
    ranges = zorder_ranges(*bbox, bits=bits, max_ranges=10 ** 9)
    in_ranges = set()
    for lo, hi in ranges:
        in_ranges.update(range(lo, hi + 1))
    expect = set()
    for qx in range(1 << bits):
        for qy in range(1 << bits):
            x = ex0 + (qx + 0.5) * step_x
            y = ey0 + (qy + 0.5) * step_y
            if bbox[0] <= x <= bbox[2] and bbox[1] <= y <= bbox[3]:
                z = _morton_py(x, y, bits, EXTENT)
                expect.add(z)
    # every touched cell is covered (no false negatives) and the only
    # extras are the partially-touched edge cells of the quantized box
    assert expect <= in_ranges
    qx0, qy0 = 3, 7
    qx1, qy1 = 41, 20
    full = {z for qx in range(qx0, qx1 + 1) for qy in range(qy0, qy1 + 1)
            for z in [sum((((qx >> i) & 1) << (2 * i))
                          + (((qy >> i) & 1) << (2 * i + 1))
                          for i in range(bits))]}
    assert in_ranges == full


def test_zorder_ranges_budget_merges_are_supersets():
    bbox = (EXTENT[0] + 5, EXTENT[1] + 5, EXTENT[0] + 17, EXTENT[1] + 9)
    fine = zorder_ranges(*bbox, bits=12, max_ranges=10 ** 9)
    coarse = zorder_ranges(*bbox, bits=12, max_ranges=4)
    assert len(coarse) <= 4
    fine_cells = set()
    for lo, hi in fine:
        fine_cells.add(lo), fine_cells.add(hi)
    for lo, hi in fine:
        assert any(clo <= lo and hi <= chi for clo, chi in coarse), \
            (lo, hi)


def test_bbox_scan_equals_plain_filter(spark, tmp_path):
    """End to end on a written z-clustered table: bbox_scan (coarse
    range budget, so merged intervals include false positives) must
    return exactly the plain-bbox rows."""
    _, df = _points(spark, n=2000)
    path = os.path.join(str(tmp_path), 'zclustered')
    zorder_cluster(df, bits=14, partitions=8).write.parquet(path)
    t = spark.read.parquet(path)
    ex0, ey0, ex1, ey1 = EXTENT
    bbox = (ex0 + (ex1 - ex0) * 0.21, ey0 + (ey1 - ey0) * 0.33,
            ex0 + (ex1 - ex0) * 0.47, ey0 + (ey1 - ey0) * 0.58)
    got = sorted(r['pid'] for r in bbox_scan(
        t, *bbox, bits=14, max_ranges=3).collect())
    want = sorted(r['pid'] for r in t.filter(
        (F.col('x') >= bbox[0]) & (F.col('x') <= bbox[2])
        & (F.col('y') >= bbox[1]) & (F.col('y') <= bbox[3])).collect())
    assert got == want and len(want) > 0


def test_zkey_ranges_reach_pushed_filters(spark, tmp_path):
    """The range disjunction must reach the parquet scan's
    PushedFilters -- that is the entire point of the layout."""
    _, df = _points(spark, n=500)
    path = os.path.join(str(tmp_path), 'zpush')
    zorder_cluster(df, bits=10, partitions=4).write.parquet(path)
    t = spark.read.parquet(path)
    q = bbox_scan(t, EXTENT[0] + 2, EXTENT[1] + 2,
                  EXTENT[0] + 10, EXTENT[1] + 10, bits=10,
                  max_ranges=4)
    plan = _plan(q)
    pushed = [ln for ln in plan.splitlines() if 'PushedFilters' in ln]
    assert pushed and 'zkey' in pushed[0], plan[:2000]


def test_zorder_cluster_rowgroup_stats_are_tight(spark, tmp_path):
    """Clustered layout: each written file covers a narrow zkey span;
    random layout: every file covers ~the full span.  This is the
    min/max-stat tightness row-group pruning feeds on."""
    _, df = _points(spark, n=4000)
    zpath = os.path.join(str(tmp_path), 'tight_z')
    rpath = os.path.join(str(tmp_path), 'tight_r')
    zorder_cluster(df, bits=14, partitions=8).write.parquet(zpath)
    df.withColumn('zkey', morton_key(F.col('x'), F.col('y'), 14)) \
        .repartition(8).write.parquet(rpath)

    def spans(path):
        t = spark.read.parquet(path)
        rows = (t.groupBy(F.input_file_name().alias('f'))
                .agg((F.max('zkey') - F.min('zkey')).alias('span'))
                .collect())
        return [r['span'] for r in rows]

    full = (1 << 28) - 1
    z_spans, r_spans = spans(zpath), spans(rpath)
    assert max(z_spans) < full * 0.3, z_spans
    assert min(r_spans) > full * 0.7, r_spans


def test_bbox_scan_inverted_box_is_empty(spark):
    """An inverted (x0 > x1) in-extent box is an empty query, not an
    IndexError from the quadtree pruning every leaf."""
    from pytrs_spark.spatial.cluster import bbox_scan, zorder_ranges
    assert zorder_ranges(-580.0, 900.0, -600.0, 910.0) == []
    df = spark.createDataFrame(
        [(1, -590.0, 905.0, 0)],
        'id long, x double, y double, zkey long')
    assert bbox_scan(df, -580.0, 900.0, -600.0, 910.0).count() == 0
