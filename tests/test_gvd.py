"""Decision-level parity of the jitted GVD graph vs the Subdiv2D oracle
(SURVEY.md hard part #2: tolerant node matching, identical label decisions,
valid connectivity), plus the graph invariants from SURVEY.md section 4."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aosx.config import TEST_STATICS as S, AosParams, params_as_f32
from aosx.oracle import perceive as op
from aosx.oracle import gvd as og
from aosx.orchards import OrchardSpec, make_orchard_np
from aosx.gvd import build_gvd_graph
from aosx.gvd.graph import merge_seeds
from aosx.types import GridWorld, Polygon, SeedSet, TreeRows


def _mk(ores):
    skel_np = (ores.skeleton.data == 100).astype(np.uint8)
    h, w = skel_np.shape
    occ = np.zeros((S.grid_h, S.grid_w), np.uint8)
    occ[:h, :w] = skel_np
    skel = GridWorld(
        occ=jnp.asarray(occ),
        origin_x=jnp.float32(ores.skeleton.origin_x),
        origin_y=jnp.float32(ores.skeleton.origin_y),
        h_cells=jnp.int32(h),
        w_cells=jnp.int32(w),
    )
    ns = len(ores.seeds)
    sxy = np.zeros((S.max_seeds, 2), np.float32)
    sxy[:ns] = ores.seeds
    sval = np.zeros(S.max_seeds, bool)
    sval[:ns] = True
    seeds = SeedSet(
        xy=jnp.asarray(sxy), valid=jnp.asarray(sval), kind=jnp.zeros(S.max_seeds, jnp.int8)
    )
    R = S.max_rows
    e1 = np.zeros((R, 2), np.float32)
    e2 = np.zeros((R, 2), np.float32)
    ctr = np.zeros((R, 2), np.float32)
    ln = np.zeros(R, np.float32)
    va = np.zeros(R, bool)
    for i, r in enumerate(ores.rows_sorted):
        ctr[i] = r.center
        e1[i] = r.start_point
        e2[i] = r.end_point
        ln[i] = r.length
        va[i] = True
    rows = TreeRows(
        center=jnp.asarray(ctr), ep1=jnp.asarray(e1), ep2=jnp.asarray(e2),
        length=jnp.asarray(ln), valid=jnp.asarray(va),
    )
    return skel, seeds, rows


@pytest.fixture(scope="module")
def setup():
    xyz, poly = make_orchard_np(OrchardSpec(n_rows=3, row_len=12.0), seed=3)
    ores = op.perceive(xyz, poly)
    skel, seeds, rows = _mk(ores)
    params = params_as_f32(AosParams())
    g = jax.jit(lambda se, ro, sk, pr: build_gvd_graph(se, ro, sk, pr, S))(
        seeds, rows, skel, params
    )
    ref = og.gvd_graph(ores.seeds, ores.skeleton, ores.rows_sorted)
    return ores, g, ref, (skel, seeds, rows, params)


def test_seed_merge_parity(setup):
    ores, _, _, (skel, seeds, rows, params) = setup
    merged = jax.jit(lambda se, pr: merge_seeds(se, pr, S))(seeds, params)
    n = int(np.asarray(merged.valid).sum())
    ref = og.merge_seeds(ores.seeds)
    assert n == len(ref)
    got = np.asarray(merged.xy)[:n]
    assert np.abs(got - ref).max() < 1e-3


def test_graph_well_formed(setup):
    _, g, _, _ = setup
    n = int(g.num_nodes)
    e = int(g.num_edges)
    assert n > 0 and e > 0
    edges = np.asarray(g.edges)[:e]
    assert (edges >= 0).all() and (edges < n).all()
    assert (edges[:, 0] != edges[:, 1]).all()
    lengths = np.asarray(g.edge_lengths)[:e]
    nodes = np.asarray(g.nodes)
    d = np.linalg.norm(nodes[edges[:, 0]] - nodes[edges[:, 1]], axis=1)
    assert np.allclose(lengths, d, atol=1e-4)


def test_no_edge_crosses_skeleton(setup):
    """Invariant at aos_gvd_node.cpp:846-848: no edge samples an occupied
    skeleton cell (checked densely here, step res/4)."""
    ores, g, _, _ = setup
    skel = ores.skeleton
    e = int(g.num_edges)
    edges = np.asarray(g.edges)[:e]
    nodes = np.asarray(g.nodes)
    bad = 0
    for a, b in edges:
        pa, pb = nodes[a], nodes[b]
        L = np.linalg.norm(pb - pa)
        if L < 1e-6:
            continue
        steps = max(int(L / (skel.resolution * 0.5)) + 1, 1)
        for i in range(steps + 1):
            t = i / steps
            p = pa + t * (pb - pa)
            mx = int((p[0] - skel.origin_x) / skel.resolution)
            my = int((p[1] - skel.origin_y) / skel.resolution)
            if 0 <= mx < skel.w and 0 <= my < skel.h and skel.data[my, mx] == 100:
                bad += 1
                break
    assert bad == 0, f"{bad}/{e} edges cross the skeleton"


def test_node_coverage(setup):
    """Every oracle (Subdiv2D) node inside the grid has a jitted node within
    3 grid cells - the grid-space construction finds the same junctions."""
    _, g, ref, _ = setup
    n = int(g.num_nodes)
    jn = np.asarray(g.nodes)[:n]
    tol = 3 * 0.05
    misses = 0
    for p in ref.nodes:
        d = np.linalg.norm(jn - p, axis=1).min()
        if d > tol:
            misses += 1
    assert misses <= max(2, int(0.1 * len(ref.nodes))), (
        f"{misses}/{len(ref.nodes)} oracle nodes uncovered"
    )


def test_label_decisions(setup):
    """TL/TR/BL/BR per cluster: both implementations find a labelled node,
    and the label points agree within 0.5 m (different node discretization)."""
    ores, g, ref, _ = setup
    C = len(ores.rows_sorted)
    jln = np.asarray(g.label_node)
    jnodes = np.asarray(g.nodes)
    for c in range(C):
        for li in range(4):
            ref_has = ref.label_node[c, li] >= 0
            jax_has = jln[c, li] >= 0
            assert jax_has == ref_has, (c, li, ref_has, jax_has)
            if ref_has:
                rp = ref.nodes[ref.label_node[c, li]]
                jp = jnodes[jln[c, li]]
                assert np.linalg.norm(rp - jp) < 0.5, (c, li, rp, jp)


def test_label_bitmasks_consistent(setup):
    _, g, _, _ = setup
    n = int(g.num_nodes)
    labels = np.asarray(g.node_labels)[:n]
    ln = np.asarray(g.label_node)
    for c in range(ln.shape[0]):
        for li in range(4):
            ni = ln[c, li]
            if ni >= 0:
                assert labels[ni] & (1 << li), (c, li, ni, labels[ni])
