"""Unit tests for the hierarchical rollup / k-ring / centroid ops
(pytrs_spark.spatial.rollup) and the keep_one dedup policy."""

import pytest
from pyspark.sql import functions as F

from pytrs_spark.spatial.rollup import (
    assemble_centroids,
    kring_density,
    tile_embedding_stats,
    tile_pyramid,
)
from pytrs_spark.operators.textops import keep_one


def test_tile_pyramid_levels_sum(spark):
    tiles = spark.createDataFrame(
        [('154n97w01', 'NENE'), ('154n97w01', 'NENE'),
         ('154n97w01', 'SWSW'), ('154n97w02', 'NENE'),
         ('7s3e36', 'NWNW')],
        'trs string, qq string')
    rows = {(r['twprge'], r['sec'], r['qq']): (r['level'], r['n_images'])
            for r in tile_pyramid(tiles).collect()}
    assert rows[('154n97w', '01', 'NENE')] == (3, 2)
    assert rows[('154n97w', '01', '*')] == (2, 3)
    assert rows[('154n97w', '*', '*')] == (1, 4)
    assert rows[('7s3e', '36', 'NWNW')] == (3, 1)
    assert rows[('*', '*', '*')] == (0, 5)
    # every level-3 count sums to its level-2 parent, etc.
    lvl3 = sum(n for (t, s, q), (l, n) in rows.items() if l == 3)
    assert lvl3 == rows[('*', '*', '*')][1] == 5


def test_kring_density_ring_sums(spark):
    # 3 points in cell (0,0), 1 in (1,0), 1 in (5,5) (isolated)
    pts = spark.createDataFrame(
        [(0.2, 0.3), (0.9, 0.1), (0.5, 0.5), (1.5, 0.5), (5.5, 5.5)],
        'x double, y double')
    rows = {(r['cell_x'], r['cell_y']): (r['n_self'], r['n_ring'])
            for r in kring_density(pts, k=1).collect()}
    assert rows[(0, 0)] == (3, 4)     # self 3 + neighbor (1,0)
    assert rows[(1, 0)] == (1, 4)
    assert rows[(5, 5)] == (1, 1)     # isolated
    assert len(rows) == 3             # only non-empty cells emit


def test_kring_density_k2(spark):
    pts = spark.createDataFrame(
        [(0.5, 0.5), (2.5, 0.5)], 'x double, y double')
    rows = {(r['cell_x'], r['cell_y']): r['n_ring']
            for r in kring_density(pts, k=2).collect()}
    assert rows[(0, 0)] == 2          # (2,0) is inside the 5x5 window
    with pytest.raises(ValueError):
        kring_density(pts, k=0)


def test_tile_embedding_stats_and_assemble(spark):
    assignments = spark.createDataFrame(
        [(0, '154n97w01'), (1, '154n97w02'), (2, '7s3e36')],
        'vec_id long, trs string')
    emb = spark.createDataFrame(
        [(0, [1.0, 3.0]), (1, [3.0, 5.0]), (2, [10.0, 20.0])],
        'vec_id long, embedding array<double>')
    stats = tile_embedding_stats(assignments, emb)
    rows = {(r['twprge'], r['pos']): (r['centroid_v'], r['n_vectors'])
            for r in stats.collect()}
    assert rows[('154n97w', 0)] == (2.0, 2)   # avg(1,3)
    assert rows[('154n97w', 1)] == (4.0, 2)   # avg(3,5)
    assert rows[('7s3e', 0)] == (10.0, 1)
    packed = {r['twprge']: r['centroid']
              for r in assemble_centroids(stats).collect()}
    assert packed['154n97w'] == [2.0, 4.0]
    assert packed['7s3e'] == [10.0, 20.0]


def test_keep_one_transitive_and_singletons(spark):
    docs = spark.createDataFrame(
        [(1,), (2,), (3,), (9,)], 'doc_id long')
    # chain 1-2, 2-3: pairwise keep-one would keep 1 and 3; the
    # transitive policy keeps only 1.  9 is a singleton (kept).
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], 'id_a long, id_b long')
    rows = {r['doc_id']: (r['component_id'], r['kept'])
            for r in keep_one(docs, pairs).collect()}
    assert rows == {1: (1, True), 2: (1, False), 3: (1, False),
                    9: (9, True)}


def test_qq_acres_component_areas(spark):
    from pytrs_spark.spatial.rollup import acreage_rollup
    qqs = spark.createDataFrame(
        [(1, 'NENE'), (1, 'S2N2NWSW'), (2, 'NE'), (2, 'N2')],
        'key long, qq string')
    rows = {r['key']: (r['total_acres'], r['n_aliquots'])
            for r in acreage_rollup(qqs).collect()}
    assert rows[1] == (40.0 + 10.0, 2)     # QQ + half-half-of-QQ
    assert rows[2] == (160.0 + 320.0, 2)   # quarter + half section
