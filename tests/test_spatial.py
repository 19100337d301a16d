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


def test_skew_slice_lands_in_dense_section(spark, images, polygons):
    """~10% of images are aimed at sec 14 of T154N-R97W."""
    result = assign_images_to_tiles(images, polygons)
    dense = result.filter(
        f"trs = '{datagen.DENSE_TWP}n{datagen.DENSE_RGE}w"
        f"{datagen.DENSE_SEC}'").count()
    assert dense >= int(N_IMAGES * datagen.SKEW_FRACTION_DEFAULT)
