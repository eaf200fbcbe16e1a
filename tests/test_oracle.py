"""Sanity tests for the NumPy oracle itself (the parity target).

These pin the oracle's behavior on a synthetic orchard: the perception stack
must find the tree rows, and the Zhang-Suen thinning must satisfy skeleton
invariants. Where OpenCV is available, morph-open is cross-checked against it.
"""

import numpy as np
import pytest

from aosx.oracle import perceive as op
from aosx.orchards import OrchardSpec, make_orchard_np


@pytest.fixture(scope="module")
def orchard():
    return make_orchard_np(OrchardSpec(), seed=0)


@pytest.fixture(scope="module")
def result(orchard):
    xyz, poly = orchard
    return op.perceive(xyz, poly)


def test_grid_shapes(result, orchard):
    _, poly = orchard
    bounds = op.active_bounds(poly, None)
    w = int(np.ceil((bounds[1] - bounds[0]) / 0.05))
    h = int(np.ceil((bounds[3] - bounds[2]) / 0.05))
    assert result.occupancy.data.shape == (h, w)
    assert set(np.unique(result.occupancy.data)) <= {0, 100}


def test_borders_marked(result):
    g = result.occupancy.data
    assert (g[:5, :] == 100).all()
    assert (g[-5:, :] == 100).all()
    assert (g[:, :5] == 100).all()
    assert (g[:, -5:] == 100).all()


def test_skeleton_thinner_than_inflated(result):
    # skeleton must be a subset of the opened/inflated mask and much sparser
    skel = result.skeleton.data == 100
    occ = result.occupancy.data == 100
    assert skel.sum() > 0
    assert skel.sum() < 0.2 * occ.sum()


def test_zhang_suen_is_thin():
    # a solid rectangle thins to a 1-px-wide line
    img = np.zeros((30, 60), np.uint8)
    img[10:16, 5:55] = 1
    thin = op.zhang_suen_thin(img)
    assert thin.sum() > 0
    # no 2x2 block fully set (thinness invariant)
    blocks = thin[:-1, :-1] & thin[1:, :-1] & thin[:-1, 1:] & thin[1:, 1:]
    assert blocks.sum() == 0
    # preserved connectivity: single component
    cl = op.cluster_occupied_cells(
        op.Grid((thin * 100).astype(np.int8), 0.0, 0.0, 0.05), None
    )
    assert len(cl) == 1


def test_finds_tree_rows(result):
    # 4 generated rows -> 4 detected rows (rows are ~18 m >= 2 m min length)
    assert len(result.rows_all) == 4
    for r in result.rows_all:
        assert r.length > 10.0


def test_rows_sorted_by_y(result):
    ys = [r.center[1] for r in result.rows_sorted]
    assert ys == sorted(ys)


def test_seeds_generated(result):
    assert len(result.virtual_seeds) > 10
    assert len(result.endpoint_seeds) > 0
    # endpoint/virtual seeds dedupe: no two seeds of the same list within 0.5m
    vs = np.array(result.virtual_seeds)
    d = np.linalg.norm(vs[:, None] - vs[None, :], axis=-1)
    np.fill_diagonal(d, 1e9)
    assert d.min() >= 0.5 - 1e-9


def test_ray_seeds_outside_polygon(result, orchard):
    _, poly = orchard
    for p in result.ray_seeds:
        assert not op.point_in_polygon(p[0], p[1], poly)


def test_morph_open_matches_cv2(result):
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    img = (rng.random((64, 96)) < 0.4).astype(np.uint8)
    ours = op.morph_open(img)
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
    ref = (cv2.morphologyEx(img * 255, cv2.MORPH_OPEN, k) > 0).astype(np.uint8)
    assert (ours == ref).all()
