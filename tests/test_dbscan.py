"""Exact grid DBSCAN (G18) vs a brute-force reference implementation."""

import numpy as np
import pytest

from pytrs_spark.datagen import X0, Y0
from pytrs_spark.spatial.dbscan import dbscan


def _brute_dbscan(pts, eps, min_pts):
    """Reference DBSCAN with the engine's deterministic tie-breaks:
    cluster_id = min core id in the component; border -> smallest
    candidate cluster_id; neighborhood includes self."""
    ids = sorted(pts)
    P = np.array([pts[i] for i in ids])
    d2 = ((P[:, None, :] - P[None, :, :]) ** 2).sum(axis=2)
    nbr = d2 <= eps * eps
    core = nbr.sum(axis=1) >= min_pts
    # union-find over core-core eps-edges
    parent = {i: i for i, c in enumerate(core) if c}

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    ci = np.flatnonzero(core)
    for a in ci:
        for b in ci:
            if a < b and nbr[a, b]:
                ra, rb = find(a), find(b)
                if ra != rb:
                    parent[max(ra, rb)] = min(ra, rb)
    out = {}
    comp_min = {}
    for a in ci:
        comp_min.setdefault(find(a), []).append(ids[a])
    comp_label = {r: min(v) for r, v in comp_min.items()}
    for a in ci:
        out[ids[a]] = (comp_label[find(a)], 'core')
    for a in np.flatnonzero(~core):
        cand = [comp_label[find(b)] for b in ci if nbr[a, b]]
        out[ids[a]] = (min(cand), 'border') if cand else (None, 'noise')
    return out


def _run(spark, pts, eps, min_pts, **kw):
    df = spark.createDataFrame(
        [(i, float(x), float(y)) for i, (x, y) in pts.items()],
        'id long, x double, y double')
    got = {r['id']: (r['cluster_id'], r['role'])
           for r in dbscan(df, eps, min_pts, **kw).collect()}
    assert got == _brute_dbscan(pts, eps, min_pts)
    return got


def test_two_clusters_border_noise(spark):
    # cluster A: 4 tight points; cluster B: 3 tight points far away;
    # a border point hanging off A; an isolated noise point.
    pts = {
        1: (X0 + 5.0, Y0 + 5.0), 2: (X0 + 5.1, Y0 + 5.0),
        3: (X0 + 5.0, Y0 + 5.1), 4: (X0 + 5.1, Y0 + 5.1),
        10: (X0 + 5.35, Y0 + 5.25),         # border: near 4 only
        20: (X0 + 20.0, Y0 + 20.0), 21: (X0 + 20.1, Y0 + 20.0),
        22: (X0 + 20.0, Y0 + 20.1),
        99: (X0 + 40.0, Y0 + 40.0),         # noise
    }
    got = _run(spark, pts, eps=0.3, min_pts=3)
    assert got[1] == (1, 'core') and got[4] == (1, 'core')
    assert got[10] == (1, 'border')
    assert got[20] == (20, 'core')
    assert got[99] == (None, 'noise')


def test_isolated_core_singleton(spark):
    # min_pts=2: two mutually-near points are each other's only
    # neighbor -> both core, one 2-cluster; a lone point is noise.
    pts = {5: (X0 + 3.0, Y0 + 3.0), 6: (X0 + 3.1, Y0 + 3.0),
           9: (X0 + 9.0, Y0 + 9.0)}
    got = _run(spark, pts, eps=0.5, min_pts=2)
    assert got == {5: (5, 'core'), 6: (5, 'core'), 9: (None, 'noise')}


def test_chain_merges_through_cores(spark):
    # chain of cores: a-b-c each within eps of the next but a-c
    # beyond eps -> one cluster via transitivity.
    pts = {1: (X0 + 1.0, Y0 + 1.0), 2: (X0 + 1.25, Y0 + 1.0),
           3: (X0 + 1.5, Y0 + 1.0), 4: (X0 + 1.75, Y0 + 1.0)}
    got = _run(spark, pts, eps=0.3, min_pts=2)
    assert {v[0] for v in got.values()} == {1}
    assert all(v[1] == 'core' for v in got.values())


@pytest.mark.parametrize('broadcast', [True, False, 'auto'])
@pytest.mark.parametrize('seed,eps,min_pts', [(7, 0.4, 4), (11, 0.7, 3)])
def test_random_vs_bruteforce(spark, seed, eps, min_pts, broadcast):
    rng = np.random.RandomState(seed)
    # mixture: a few gaussian blobs + uniform background
    pts = {}
    i = 0
    for b in range(4):
        cx, cy = X0 + 5 + b * 8, Y0 + 5 + (b % 2) * 8
        for _ in range(25):
            pts[i] = (cx + rng.randn() * 0.3, cy + rng.randn() * 0.3)
            i += 1
    for _ in range(40):
        pts[i] = (X0 + rng.rand() * 40, Y0 + rng.rand() * 40)
        i += 1
    _run(spark, pts, eps, min_pts, broadcast=broadcast)
