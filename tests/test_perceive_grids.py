"""Bit-parity of the jitted grid stages vs the NumPy oracle
(BASELINE.md: "bit-identical grids")."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aosx.config import TEST_STATICS as S, AosParams, params_as_f32
from aosx.oracle import perceive as op
from aosx.orchards import OrchardSpec, make_orchard_np
from aosx.perceive import points as jpoints
from aosx.perceive import raster as jraster
from aosx.perceive import skeleton as jskel
from aosx.types import PointCloud, Polygon


@pytest.fixture(scope="module")
def data():
    xyz, poly = make_orchard_np(OrchardSpec(n_rows=3, row_len=12.0), seed=3)
    return xyz.astype(np.float32), poly.astype(np.float32)


@pytest.fixture(scope="module")
def oracle_result(data):
    xyz, poly = data
    return op.perceive(xyz.astype(np.float64), poly.astype(np.float64))


def _pc(xyz):
    n = len(xyz)
    buf = np.zeros((S.max_points, 3), np.float32)
    buf[:n] = xyz
    valid = np.zeros(S.max_points, bool)
    valid[:n] = True
    return PointCloud(xyz=jnp.asarray(buf), valid=jnp.asarray(valid))


@pytest.fixture(scope="module")
def jax_grids(data):
    xyz, poly_np = data
    pc = _pc(xyz)
    poly = Polygon.from_array(poly_np, S)
    params = params_as_f32(AosParams())
    excl = np.zeros((S.max_exclusions, 3), np.float32)

    @jax.jit
    def run(pc, poly, params, excl):
        xy, keep, bounds, _ = jpoints.preprocess(pc, poly, params, excl, S)
        grid = jraster.generate_grid(xy, keep, bounds, S)
        inflated = jraster.inflate(grid, S)
        occupancy = jraster.mark_borders(inflated)
        skel = jskel.skeletonize(inflated, S)
        skel_pub = jraster.mark_polygon_rect(skel, poly, params.polygon_margin, S)
        return grid, inflated, occupancy, skel, skel_pub

    return run(pc, poly, params, excl)


def _live(jgrid):
    h = int(jgrid.h_cells)
    w = int(jgrid.w_cells)
    return np.asarray(jgrid.occ)[:h, :w]


def test_raw_grid_parity(jax_grids, oracle_result, data):
    xyz, poly = data
    # recompute oracle raw grid (pre-inflation)
    keep = op.radius_outlier_removal(xyz.astype(np.float64))
    pts = op.preprocess_points(
        xyz[keep].astype(np.float64), poly.astype(np.float64),
        (-0.4, 0.5), (-5.0, 72.0, -10.0, 20.0), np.zeros((0, 3)))
    bounds = op.active_bounds(poly.astype(np.float64), None)
    og = op.generate_occupancy_grid(pts, bounds, 0.05)
    jg = _live(jax_grids[0])
    assert jg.shape == og.data.shape
    assert (jg == (og.data == 100)).all()


def test_inflated_parity(jax_grids, oracle_result):
    # oracle_result.occupancy has borders; compare against inflated-only
    jg = _live(jax_grids[1])
    # reconstruct oracle inflated (occupancy minus borders isn't recoverable,
    # so recompute)
    # cheaper: skeleton input == inflated, so compare occupancy-with-borders
    jocc = _live(jax_grids[2])
    assert jocc.shape == oracle_result.occupancy.data.shape
    assert (jocc == (oracle_result.occupancy.data == 100)).all()
    assert jg.sum() <= jocc.sum()


def test_skeleton_parity(jax_grids, oracle_result):
    jg = _live(jax_grids[3])
    ref = oracle_result.skeleton.data == 100
    assert jg.shape == ref.shape
    mism = (jg != ref).sum()
    assert mism == 0, f"{mism} skeleton cells differ"


def test_skeleton_pub_parity(jax_grids, oracle_result):
    jg = _live(jax_grids[4])
    ref = oracle_result.skeleton_pub.data == 100
    assert (jg == ref).all()


def test_ror_sorted_matches_exact():
    """The sorted-sweep ROR (TPU fast path) is count-identical to the exact
    pairwise path on orchard-like data."""
    import jax.numpy as jnp
    from aosx.perceive.points import ror_counts

    rng = np.random.default_rng(9)
    xyz = np.stack(
        [rng.uniform(0, 40, 4000), rng.uniform(0, 12, 4000), rng.uniform(-0.3, 0.4, 4000)], 1
    ).astype(np.float32)
    valid = np.ones(4000, bool)
    valid[3900:] = False
    a, _ = ror_counts(jnp.asarray(xyz), jnp.asarray(valid), 0.2, method="exact")
    b, span = ror_counts(jnp.asarray(xyz), jnp.asarray(valid), 0.2, method="sorted")
    a, b = np.asarray(a), np.asarray(b)
    assert (a[:3900] == b[:3900]).all()
    assert not bool(span)  # exactness precondition holds on this data


def test_nan_points_dropped_like_absent():
    """PCL marks invalid returns with NaN points; preprocess must produce
    the same keep-set as if those points were never there (isfinite hygiene
    at the input boundary, ref voronoi_diagram.cpp:28-30), even on the
    sorted-sweep ROR path whose sort keys NaNs would poison."""
    xyz, poly = make_orchard_np(OrchardSpec(n_rows=3, row_len=12.0), seed=5)
    xyz = xyz.astype(np.float32)
    params = params_as_f32(AosParams())
    poly_j = Polygon.from_array(poly.astype(np.float32), S)
    excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)

    n = len(xyz)
    N = S.max_points
    assert n + 8 <= N
    clean = np.zeros((N, 3), np.float32)
    clean[:n] = xyz
    cvalid = np.zeros(N, bool)
    cvalid[:n] = True

    poisoned = clean.copy()
    pvalid = cvalid.copy()
    bad = np.array([np.nan, np.inf, -np.inf], np.float32)
    for i in range(8):
        poisoned[n + i] = np.roll(bad, i)[:3] * (1 if i % 2 else -1)
    pvalid[n : n + 8] = True

    @jax.jit
    def run(buf, valid):
        pc = PointCloud(xyz=jnp.asarray(buf), valid=jnp.asarray(valid))
        xy, keep, _, _ = jpoints.preprocess(
            pc, poly_j, params, excl, S, ror_method="sorted"
        )
        return keep

    keep_clean = np.asarray(run(clean, cvalid))
    keep_pois = np.asarray(run(poisoned, pvalid))
    assert not keep_pois[n : n + 8].any()
    np.testing.assert_array_equal(keep_clean[:n], keep_pois[:n])
