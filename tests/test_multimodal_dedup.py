"""Joint image+caption dedup (multimodal.joint_keep_one, G21).

Semantics: edges = phash Hamming<=t pairs UNION exact normalized-
caption star edges (member -> caption-group min); labels = transitive
connected components; kept = min-id representative.  Null/empty
captions take no caption edges.
"""

import pytest

from pytrs_spark import multimodal


# Three phash "visual" clusters (ids grouped by near-identical hashes)
# plus captions that bridge clusters A and B but not C.
ROWS = [
    # cluster A: 1,2 (hamming 1)
    (1, 0b1010100, 'A mountain  lake at dawn'),
    (2, 0b1010101, 'unrelated caption one'),
    # cluster B: 10,11 (hamming 1); 10 shares A's caption (bridge!)
    (10, 0b1111000000, 'a mountain lake at dawn'),
    (11, 0b1111000001, 'unrelated caption two'),
    # cluster C: 20 alone, unique caption
    (20, 0b10011001100110011, 'a city street at night'),
    # null / empty captions must not link to each other (phashes are
    # pairwise many bits apart so no Hamming edges either)
    (30, 0x5555555555, None),
    (31, 0x2AAAAAAAAA, None),
    (32, 0x00FF00FF00FF, '   '),
]


@pytest.fixture(scope='module')
def labels(spark):
    df = spark.createDataFrame(
        ROWS, 'image_id long, phash long, caption string')
    out = multimodal.joint_keep_one(df, max_hamming=2)
    return {r['image_id']: (r['component_id'], r['kept'])
            for r in out.collect()}


def test_caption_bridges_phash_clusters(labels):
    # A (1,2) and B (10,11) merge through the shared caption 1<->10:
    # one component rooted at min id 1.
    assert {labels[i][0] for i in (1, 2, 10, 11)} == {1}
    assert labels[1][1] is True
    assert all(labels[i][1] is False for i in (2, 10, 11))


def test_isolated_cluster_untouched(labels):
    assert labels[20] == (20, True)


def test_null_and_blank_captions_take_no_edges(labels):
    for i in (30, 31, 32):
        assert labels[i] == (i, True)


def test_star_edges_equal_pair_edges(spark):
    # 4 images sharing one caption, disjoint phashes: the star
    # construction must produce the same single component as the
    # quadratic all-pairs edge set would.
    rows = [(i, 1 << (i + 10), 'same caption') for i in range(4)]
    df = spark.createDataFrame(
        rows, 'image_id long, phash long, caption string')
    out = multimodal.joint_keep_one(df, max_hamming=1).collect()
    assert {r['component_id'] for r in out} == {0}
    assert sorted(r['image_id'] for r in out if r['kept']) == [0]


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(
        ROWS, 'image_id long, phash long, caption string')
    a = sorted(tuple(r) for r in multimodal.joint_keep_one(
        df.repartition(1), max_hamming=2)
        .select('image_id', 'component_id', 'kept').collect())
    b = sorted(tuple(r) for r in multimodal.joint_keep_one(
        df.repartition(5, 'phash'), max_hamming=2)
        .select('image_id', 'component_id', 'kept').collect())
    assert a == b
