"""End-to-end spatial tests: parse -> polygon layer -> cell join ->
PIP -> tile assignment, asserted against an in-test numpy brute-force
oracle (FIXTURES.md F3/F4)."""

import numpy as np
import pytest

from pytrs_spark import datagen
from pytrs_spark.pipeline import (
    assign_images_to_tiles,
    polygon_layer_from_descs,
)

N_IMAGES = 2000


@pytest.fixture(scope="module")
def polygons(spark):
    df = polygon_layer_from_descs(datagen.gen_descs(spark))
    df.cache()
    return df


@pytest.fixture(scope="module")
def images(spark):
    df = datagen.gen_images(spark, N_IMAGES, with_bytes=False,
                            partitions=4)
    df.cache()
    return df


def test_polygon_layer_is_full_qq_lattice(polygons):
    """Every section of every covered township must partition into
    exactly the 16 standard QQs (the descs corpus guarantees it)."""
    rows = polygons.collect()
    n_townships = (datagen.TWP_MAX - datagen.TWP_MIN + 1) * \
        (datagen.RGE_MAX - datagen.RGE_MIN + 1)
    assert len(rows) == n_townships * 36 * 16
    by_trs = {}
    for r in rows:
        by_trs.setdefault(r['trs'], set()).add(r['qq'])
    expected_qqs = {f"{i}{o}" for i in ('NE', 'NW', 'SE', 'SW')
                    for o in ('NE', 'NW', 'SE', 'SW')}
    for trs, qqs in by_trs.items():
        assert qqs == expected_qqs, trs
    # Geometry spot check: every box is exactly 0.25 x 0.25 mi and
    # inside the domain.
    for r in rows[:500]:
        assert abs((r['xmax'] - r['xmin']) - 0.25) < 1e-12
        assert abs((r['ymax'] - r['ymin']) - 0.25) < 1e-12
        assert datagen.X0 <= r['xmin'] < datagen.X1
        assert datagen.Y0 <= r['ymin'] < datagen.Y1


def test_tile_assignment_matches_bruteforce(spark, polygons, images):
    """Engine tile assignment == numpy all-pairs half-open box oracle."""
    result = assign_images_to_tiles(images, polygons)
    got = {r['image_id']: (r['trs'], r['qq'], r['caption'], r['x'], r['y'])
           for r in result.collect()}

    polys = polygons.select('trs', 'qq', 'xmin', 'ymin', 'xmax',
                            'ymax').collect()
    pxmin = np.array([p['xmin'] for p in polys])
    pymin = np.array([p['ymin'] for p in polys])
    pxmax = np.array([p['xmax'] for p in polys])
    pymax = np.array([p['ymax'] for p in polys])
    keys = [(p['trs'], p['qq']) for p in polys]

    imgs = images.select('image_id', 'phash', 'caption').collect()
    assert len(got) == len(imgs), "every image must land in a tile"
    phash = np.array([r['phash'] for r in imgs], dtype=np.int64)
    x, y = datagen.phash_to_xy(phash)
    for i, row in enumerate(imgs):
        hits = np.nonzero((pxmin <= x[i]) & (x[i] < pxmax)
                          & (pymin <= y[i]) & (y[i] < pymax))[0]
        assert len(hits) >= 1, (row['image_id'], x[i], y[i])
        expected = min(keys[h] for h in hits)   # smallest (trs, qq)
        trs, qq, caption, gx, gy = got[row['image_id']]
        assert (trs, qq) == expected, row['image_id']
        assert abs(gx - x[i]) < 1e-9 and abs(gy - y[i]) < 1e-9
        # caption embeds the expected tile (datagen closed form).
        assert caption == row['caption']
        assert caption.endswith(f"in {trs}:{qq}"), (caption, trs, qq)


def test_salted_join_same_result(spark, polygons, images):
    """The salted shuffle-join path must produce the identical
    assignment set as the broadcast path."""
    base = assign_images_to_tiles(images, polygons, salt=0)
    salted = assign_images_to_tiles(images, polygons, salt=4)
    a = {tuple(r) for r in
         base.select('image_id', 'trs', 'qq').collect()}
    b = {tuple(r) for r in
         salted.select('image_id', 'trs', 'qq').collect()}
    assert a == b


def _assignment_set(df):
    return {tuple(r) for r in
            df.select('image_id', 'trs', 'qq').collect()}


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_fused_tier1_disjoint_layer_is_all_native(spark, polygons,
                                                  images, tmp_path):
    """The descs-corpus QQ lattice is a verified-disjoint uniform-
    arity tiling, so the fused assignment must take the zero-Python
    tier: no MapInArrow/Arrow-eval stage anywhere in the plan, and
    output identical to the unfused kernel composition.

    Images are read back from parquet so the plan under test is the
    production shape (the in-memory test generator is itself a
    MapInPandas stage and would trip the no-Python assertion)."""
    from pytrs_spark.spatial.join import (
        assign_tiles_local,
        spatial_join,
    )
    from pytrs_spark.spatial.grid import with_anchor
    path = str(tmp_path / 'imgs')
    images.write.mode('overwrite').parquet(path)
    images = spark.read.parquet(path)
    fused = assign_images_to_tiles(images, polygons, payload_cols=())
    plan = _plan(fused)
    assert 'MapInArrow' not in plan and 'MapInPandas' not in plan \
        and 'ArrowEvalPython' not in plan, plan
    unfused = assign_tiles_local(
        spatial_join(with_anchor(images), polygons))
    assert _assignment_set(fused) == _assignment_set(unfused)


def test_fused_tier2_overlapping_layer_reduces_in_kernel(
        spark, polygons, images):
    """Adding a whole-section 'ALL' box on top of its 16 QQs makes the
    layer overlap: the fused path must fall back to the kernel winner
    reduction (tier 2) and still match the unfused composition --
    including the lexicographic-min tie-break ('ALL' < 'NENE', so the
    section box wins every point inside it)."""
    from pyspark.sql import functions as F

    from pytrs_spark.spatial.grid import with_anchor
    from pytrs_spark.spatial.join import (
        assign_tiles_local,
        spatial_join,
    )
    # The dense skew section is guaranteed ~10% of the images, so the
    # ALL-wins assertion below has rows to check.
    some = (f"{datagen.DENSE_TWP}n{datagen.DENSE_RGE}w"
            f"{datagen.DENSE_SEC}")
    extra = polygons.filter(F.col('trs') == some).groupBy('trs').agg(
        F.lit('ALL').alias('qq'), F.lit(0).alias('depth'),
        F.min('xmin').alias('xmin'), F.min('ymin').alias('ymin'),
        F.max('xmax').alias('xmax'), F.max('ymax').alias('ymax'))
    extra = extra.select(
        'trs', 'qq', 'depth', 'xmin', 'ymin', 'xmax', 'ymax',
        F.array('xmin', 'xmax', 'xmax', 'xmin').alias('ring_xs'),
        F.array('ymin', 'ymin', 'ymax', 'ymax').alias('ring_ys'))
    overlapping = polygons.unionByName(extra)
    fused = assign_images_to_tiles(images, overlapping,
                                   payload_cols=())
    assert 'MapInArrow' in _plan(fused)
    unfused = assign_tiles_local(
        spatial_join(with_anchor(images), overlapping))
    got = _assignment_set(fused)
    assert got == _assignment_set(unfused)
    # Every image inside `some` must be assigned its ALL box.
    in_sec = {(i, t, q) for (i, t, q) in got if t == some}
    assert in_sec and all(q == 'ALL' for (_, _, q) in in_sec)


def test_fused_tier3_variable_arity_uses_kernel_pip(spark, polygons,
                                                    images):
    """Splitting one box's top edge with a collinear midpoint vertex
    (same geometry, 5-vertex ring) breaks arity uniformity: the fused
    path must run the general Arrow PIP kernel and the assignment must
    be unchanged (the extra vertex is geometrically a no-op)."""
    from pyspark.sql import functions as F
    base = assign_images_to_tiles(images, polygons, payload_cols=())
    first = polygons.orderBy('trs', 'qq').limit(1) \
        .withColumn('ring_xs', F.array(
            'xmin', 'xmax', 'xmax', (F.col('xmin') + F.col('xmax')) / 2,
            'xmin')) \
        .withColumn('ring_ys', F.array(
            'ymin', 'ymin', 'ymax', 'ymax', 'ymax'))
    rest = polygons.exceptAll(polygons.orderBy('trs', 'qq').limit(1))
    mixed = rest.unionByName(first)
    fused = assign_images_to_tiles(images, mixed, payload_cols=())
    assert 'MapInArrow' in _plan(fused)
    assert _assignment_set(fused) == _assignment_set(base)


def test_bbox_disjoint_sweep():
    """Half-open boxes sharing an edge are disjoint; interior overlap
    is detected."""
    from pytrs_spark.spatial.join import _bboxes_disjoint
    xmin = np.array([0.0, 1.0, 0.0])
    ymin = np.array([0.0, 0.0, 1.0])
    xmax = np.array([1.0, 2.0, 1.0])
    ymax = np.array([1.0, 1.0, 2.0])
    assert _bboxes_disjoint(xmin, ymin, xmax, ymax)
    xmin2 = np.append(xmin, 0.5)
    ymin2 = np.append(ymin, 0.5)
    xmax2 = np.append(xmax, 1.5)
    ymax2 = np.append(ymax, 1.5)
    assert not _bboxes_disjoint(xmin2, ymin2, xmax2, ymax2)


def test_skew_slice_lands_in_dense_section(spark, images, polygons):
    """~10% of images are aimed at sec 14 of T154N-R97W."""
    result = assign_images_to_tiles(images, polygons)
    dense = result.filter(
        f"trs = '{datagen.DENSE_TWP}n{datagen.DENSE_RGE}w"
        f"{datagen.DENSE_SEC}'").count()
    assert dense >= int(N_IMAGES * datagen.SKEW_FRACTION_DEFAULT)


def test_fused_prep_over_cap_falls_back_to_shuffle(spark, polygons,
                                                   images):
    """A polygon layer whose size estimate exceeds the prep cap must
    NEVER be collected to the driver: the fused path estimates
    rows x ring-bytes with one skinny agg, then hands off to the
    shuffle-join + streaming winner reduction -- with assignments
    identical to the broadcast-index path."""
    from pytrs_spark.spatial.grid import with_anchor
    from pytrs_spark.spatial.join import assign_tiles_fused

    baseline = {tuple(r) for r in
                assign_images_to_tiles(images, polygons,
                                       payload_cols=())
                .select('image_id', 'trs', 'qq').collect()}

    # Fresh layer object: the prep memo sticks to the DataFrame, so
    # the capped decision must not poison the shared fixture.
    fresh = polygon_layer_from_descs(datagen.gen_descs(spark))
    points = with_anchor(images)
    out = assign_tiles_fused(points, fresh, payload_cols=(),
                             max_prep_bytes=1)
    got = {tuple(r) for r in
           out.select('image_id', 'trs', 'qq').collect()}
    assert got == baseline
    # The guard must have refused the driver collect: the memo holds
    # the shuffle marker, never the collected-prep tuple.
    from pytrs_spark.spatial.join import JOIN_RES
    assert fresh._fused_prep[JOIN_RES] == '_shuffle'


def test_knn_large_k_grows_radius_instead_of_crashing(spark):
    """k above the first window's capacity ((2r+2)^2 = 36 at r=2) must
    trigger ring expansion, not an IndexError inside the kernel."""
    from pytrs_spark.spatial.knn import knn_section_corners
    pts = spark.createDataFrame(
        [('a', -590.0, 905.0), ('b', -599.5, 901.5)],
        'image_id string, x double, y double')
    out = knn_section_corners(pts, k=40, max_radius=8)
    assert out.count() == 80
    # and ranks are dense 1..40 per point
    import pyspark.sql.functions as F
    mx = out.groupBy('image_id').agg(F.max('rank').alias('m')).collect()
    assert all(r['m'] == 40 for r in mx)


def test_knn_max_radius_validated(spark):
    from pytrs_spark.spatial.knn import knn_section_corners
    import pytest as _pt
    pts = spark.createDataFrame([('a', -590.0, 905.0)],
                                'image_id string, x double, y double')
    with _pt.raises(ValueError, match='max_radius'):
        knn_section_corners(pts, k=4, max_radius=1)
