"""Parity of clustering + tree-row extraction vs the oracle."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aosx.config import TEST_STATICS as S, AosParams, params_as_f32
from aosx.oracle import perceive as op
from aosx.orchards import OrchardSpec, make_orchard_np
from aosx.perceive import rows as jrows
from aosx.types import GridWorld, Polygon


@pytest.fixture(scope="module")
def setup():
    xyz, poly = make_orchard_np(OrchardSpec(n_rows=3, row_len=12.0), seed=3)
    res = op.perceive(xyz, poly)
    skel_np = (res.skeleton.data == 100).astype(np.uint8)
    h, w = skel_np.shape
    occ = np.zeros((S.grid_h, S.grid_w), np.uint8)
    occ[:h, :w] = skel_np
    grid = GridWorld(
        occ=jnp.asarray(occ),
        origin_x=jnp.float32(res.skeleton.origin_x),
        origin_y=jnp.float32(res.skeleton.origin_y),
        h_cells=jnp.int32(h),
        w_cells=jnp.int32(w),
    )
    poly_j = Polygon.from_array(poly.astype(np.float32), S)
    params = params_as_f32(AosParams())

    @jax.jit
    def run(grid, poly_j, params):
        clusters = jrows.cluster_grid(grid, poly_j, params, S)
        rows = jrows.rows_from_clusters(clusters, grid, poly_j, params, S)
        rows_sorted = jrows.sort_rows(rows)
        return clusters, rows, rows_sorted

    clusters, rows, rows_sorted = run(grid, poly_j, params)
    return res, clusters, rows, rows_sorted


def test_cluster_count_and_sizes(setup):
    res, clusters, _, _ = setup
    n = int(clusters["n_clusters"])
    assert n == len(res.clusters)
    sizes = np.asarray(clusters["count"])[:n].astype(int)
    assert list(sizes) == [c.size for c in res.clusters]


def test_cluster_centers_and_lengths(setup):
    res, clusters, _, _ = setup
    n = int(clusters["n_clusters"])
    cx = np.asarray(clusters["center_x"])[:n]
    cy = np.asarray(clusters["center_y"])[:n]
    ln = np.asarray(clusters["length"])[:n]
    for i, c in enumerate(res.clusters):
        assert abs(cx[i] - c.center_x) < 1e-3
        assert abs(cy[i] - c.center_y) < 1e-3
        assert abs(ln[i] - c.length) < 1e-4, (i, ln[i], c.length)


def test_rows_match(setup):
    res, _, rows, _ = setup
    nv = int(np.asarray(rows.valid).sum())
    assert nv == len(res.rows_all)
    ep1 = np.asarray(rows.ep1)[:nv]
    ep2 = np.asarray(rows.ep2)[:nv]
    ctr = np.asarray(rows.center)[:nv]
    for i, r in enumerate(res.rows_all):
        assert np.allclose(ctr[i], r.center, atol=1e-4)
        assert np.allclose(ep1[i], r.start_point, atol=1e-4), (i, ep1[i], r.start_point)
        assert np.allclose(ep2[i], r.end_point, atol=1e-4), (i, ep2[i], r.end_point)


def test_rows_sorted(setup):
    res, _, _, rows_sorted = setup
    nv = int(np.asarray(rows_sorted.valid).sum())
    ctr = np.asarray(rows_sorted.center)[:nv]
    ref = res.rows_sorted
    for i, r in enumerate(ref):
        assert np.allclose(ctr[i], r.center, atol=1e-4)
