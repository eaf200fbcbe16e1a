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


@pytest.mark.parametrize("seed,density", [(0, 0.08), (1, 0.25), (2, 0.6), (3, 0.02)])
def test_run_level_labels_match_cell_level(seed, density):
    """The run-level union-find fast path must produce exactly the labels of
    the cell-level path on arbitrary masks (random densities cover isolated
    cells, zigzag chains, and near-dense blobs)."""
    rng = np.random.default_rng(seed)
    h, w = 48, 64
    mask = rng.random((h, w)) < density
    mask_j = jnp.zeros((S.grid_h, S.grid_w), bool).at[:h, :w].set(jnp.asarray(mask))

    @jax.jit
    def both(mask_j):
        cell_flat, cell_ok, inv = jrows.compact_cells(mask_j, S)
        L_fast, overflow = jrows.run_level_labels(
            cell_flat, cell_ok, S.grid_h, S.grid_w, S
        )
        nbrs = jrows.neighbor_table(cell_flat, cell_ok, inv, S.grid_h, S.grid_w)
        nbrs6 = nbrs[:, jnp.array([0, 1, 2, 5, 6, 7])]
        L_cell = jrows.union_find_labels(
            nbrs6, S, L0=jrows.run_collapse_init(cell_flat, cell_ok, S.grid_w)
        )
        return L_fast, L_cell, overflow

    L_fast, L_cell, overflow = both(mask_j)
    if bool(overflow):
        # dense masks exceed the run/pair buffers: the production path
        # (cluster_grid) takes the cell-level branch; here we only check
        # the detection fires where expected
        assert density >= 0.2, "sparse mask unexpectedly overflowed"
    else:
        np.testing.assert_array_equal(np.asarray(L_fast), np.asarray(L_cell))


def test_run_level_overflow_falls_back_exactly():
    """cluster_grid must produce cell-level-exact components when the
    run-level buffers overflow (GUARD_CCL_CELL_FALLBACK set)."""
    from aosx.guards import GUARD_CCL_CELL_FALLBACK

    rng = np.random.default_rng(7)
    h, w = 40, 50
    mask = rng.random((h, w)) < 0.55
    occ = np.zeros((S.grid_h, S.grid_w), np.uint8)
    occ[:h, :w] = mask
    grid = GridWorld(
        occ=jnp.asarray(occ),
        origin_x=jnp.float32(0.0),
        origin_y=jnp.float32(0.0),
        h_cells=jnp.int32(S.grid_h),
        w_cells=jnp.int32(S.grid_w),
    )
    poly_j = Polygon.from_array(np.zeros((0, 2), np.float32), S)
    params = params_as_f32(AosParams())
    clusters = jax.jit(lambda g, p, pr: jrows.cluster_grid(g, p, pr, S))(
        grid, poly_j, params
    )
    assert int(clusters["guards"]) & GUARD_CCL_CELL_FALLBACK

    # oracle BFS component count + sizes on the same mask
    from aosx.oracle.perceive import Grid as OGrid, cluster_occupied_cells

    og = OGrid(
        data=(occ * 100).astype(np.int8),
        origin_x=0.0,
        origin_y=0.0,
        resolution=float(S.resolution),
    )
    ref = cluster_occupied_cells(og, None)
    n = int(clusters["n_clusters"])
    assert n == len(ref)
    # discovery order on both sides; only the first max_clusters are kept
    kept = min(n, S.max_clusters)
    sizes = np.asarray(clusters["count"])[:kept].astype(int).tolist()
    assert sizes == [c.size for c in ref[:kept]]


def test_run_level_labels_diagonal_staircase():
    """Worst case for run collapse: every cell its own run, one long chain."""
    side = min(S.grid_h, S.grid_w, 200)
    mask_j = jnp.zeros((S.grid_h, S.grid_w), bool)
    idx = jnp.arange(side)
    mask_j = mask_j.at[idx, idx].set(True)

    @jax.jit
    def fast(mask_j):
        cell_flat, cell_ok, _ = jrows.compact_cells(mask_j, S)
        return jrows.run_level_labels(cell_flat, cell_ok, S.grid_h, S.grid_w, S)

    L, overflow = fast(mask_j)
    assert not bool(overflow)
    lab = np.asarray(L)[np.asarray(jnp.arange(side))]
    # one component rooted at compact index 0
    assert (lab == 0).all()


def test_rows_sorted(setup):
    res, _, _, rows_sorted = setup
    nv = int(np.asarray(rows_sorted.valid).sum())
    ctr = np.asarray(rows_sorted.center)[:nv]
    ref = res.rows_sorted
    for i, r in enumerate(ref):
        assert np.allclose(ctr[i], r.center, atol=1e-4)
