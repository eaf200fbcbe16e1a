"""Robustness sweep: the full pipeline must stay well-formed (no NaN leaks,
no malformed graphs, no crashes) across random orchard draws and degenerate
inputs (empty cloud, all-NaN cloud, single tree). The reference would throw
or publish garbage on several of these; the TPU build must degrade to empty
outputs + guard bits instead."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aosx.config import DRYRUN_STATICS as S, AosParams, params_as_f32
from aosx.gvd import build_gvd_graph
from aosx.orchards import OrchardSpec, make_orchard
from aosx.perceive import perceive
from aosx.plan.astar import cost_matrix
from aosx.plan.mission import build_waypoints
from aosx.types import PointCloud

PARAMS = params_as_f32(AosParams())
SPEC = OrchardSpec(
    n_rows=2, row_len=4.0, row_spacing=2.0, tree_spacing=1.0,
    trunk_pts=10, noise_pts=16, origin=(2.0, 2.0), polygon_pad=1.0,
)


@jax.jit
def _pipeline(pc, poly):
    excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)
    out = perceive(pc, poly, PARAMS, excl, S, ror_method="exact")
    g = build_gvd_graph(out.seeds, out.rows_sorted, out.skeleton, PARAMS, S)
    cm = cost_matrix(g, S)
    wp = build_waypoints(g, PARAMS, S)
    return out, g, cm, wp


def _check_wellformed(out, g, wp):
    n_nodes = int(g.num_nodes)
    n_edges = int(g.num_edges)
    nodes = np.asarray(g.nodes)[:n_nodes]
    ea = np.asarray(g.edges)[:n_edges, 0]
    eb = np.asarray(g.edges)[:n_edges, 1]
    lengths = np.asarray(g.edge_lengths)[:n_edges]
    assert np.isfinite(nodes).all()
    if n_edges:
        assert (ea >= 0).all() and (ea < n_nodes).all()
        assert (eb >= 0).all() and (eb < n_nodes).all()
        assert (ea != eb).all()
        assert (lengths > 0).all()
    n_seeds = int(np.asarray(out.seeds.valid).sum())
    assert np.isfinite(np.asarray(out.seeds.xy)[:n_seeds]).all()
    n_wp = int(wp.count)
    assert np.isfinite(np.asarray(wp.xy)[:n_wp]).all()


@pytest.mark.parametrize("seed", [11, 23, 37, 51, 67, 83, 101, 119])
def test_random_draws_wellformed(seed):
    pc, poly = make_orchard(jax.random.PRNGKey(seed), SPEC, S)
    out, g, cm, wp = _pipeline(pc, poly)
    _check_wellformed(out, g, wp)


def _cloud(xyz_np):
    n = S.max_points
    buf = np.zeros((n, 3), np.float32)
    valid = np.zeros((n,), bool)
    k = min(len(xyz_np), n)
    buf[:k] = xyz_np[:k]
    valid[:k] = True
    return PointCloud(xyz=jnp.asarray(buf), valid=jnp.asarray(valid))


def _poly_of(pc_poly):
    return pc_poly[1]


def test_empty_cloud_degrades_cleanly():
    pc, poly = make_orchard(jax.random.PRNGKey(0), SPEC, S)
    empty = PointCloud(xyz=jnp.zeros_like(pc.xyz),
                       valid=jnp.zeros_like(pc.valid))
    out, g, cm, wp = _pipeline(empty, poly)
    assert int(np.asarray(out.rows.valid).sum()) == 0
    assert int(np.asarray(out.seeds.valid).sum()) == 0
    assert int(wp.count) == 0
    _check_wellformed(out, g, wp)


def test_all_nan_cloud_equals_empty():
    pc, poly = make_orchard(jax.random.PRNGKey(0), SPEC, S)
    nan = PointCloud(xyz=jnp.full_like(pc.xyz, jnp.nan), valid=pc.valid)
    empty = PointCloud(xyz=jnp.zeros_like(pc.xyz),
                       valid=jnp.zeros_like(pc.valid))
    out_n, g_n, _, wp_n = _pipeline(nan, poly)
    out_e, g_e, _, wp_e = _pipeline(empty, poly)
    assert np.array_equal(np.asarray(out_n.occupancy.occ),
                          np.asarray(out_e.occupancy.occ))
    assert int(g_n.num_nodes) == int(g_e.num_nodes)
    assert int(wp_n.count) == int(wp_e.count)


def test_single_tree_no_rows():
    """One trunk: no row reaches the 2 m min length -> no rows, no seeds,
    still well-formed."""
    _, poly = make_orchard(jax.random.PRNGKey(0), SPEC, S)
    pts = np.array([[2.0, 2.0, 0.1]] * 8, np.float32)
    pts += np.random.default_rng(1).normal(0, 0.02, pts.shape).astype(np.float32)
    out, g, cm, wp = _pipeline(_cloud(pts), poly)
    assert int(np.asarray(out.rows.valid).sum()) == 0
    _check_wellformed(out, g, wp)
