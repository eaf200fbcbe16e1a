"""IO layer: PCD roundtrips, checkpoint/resume, YAML param schema, ROS
message exporters, native library parity."""

import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aosx.config import TEST_STATICS as S, AosParams, load_yaml
from aosx.io import pcd as iop
from aosx.io import checkpoint as ckpt
from aosx.io import ros_msgs


def test_pcd_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    xyz = rng.normal(0, 5, (500, 3)).astype(np.float32)
    for binary in (True, False):
        p = str(tmp_path / f"t_{binary}.pcd")
        iop.save_pcd(p, xyz, binary=binary)
        back = iop.load_pcd(p)
        assert back.shape == xyz.shape
        assert np.allclose(back, xyz, atol=1e-5)


def test_native_matches_python_oracle():
    from aosx.native import binding

    if not binding.available():
        pytest.skip("no compiler")
    from aosx.oracle import perceive as op

    rng = np.random.default_rng(3)
    img = (rng.random((64, 96)) < 0.5).astype(np.uint8)
    assert (binding.thin(img) == op.zhang_suen_thin(img)).all()


def test_checkpoint_roundtrip(tmp_path):
    from aosx import engine
    from aosx.types import GridWorld, GvdGraph, Waypoints

    # minimal fabricated world/state
    occ = jnp.zeros((S.grid_h, S.grid_w), jnp.uint8)
    grid = GridWorld(occ=occ, origin_x=jnp.float32(0), origin_y=jnp.float32(0),
                     h_cells=jnp.int32(S.grid_h), w_cells=jnp.int32(S.grid_w))
    N, E, C, W = S.max_nodes, S.max_edges, S.max_rows, S.max_waypoints
    g = GvdGraph(
        nodes=jnp.zeros((N, 2), jnp.float32), node_valid=jnp.zeros(N, bool),
        node_labels=jnp.zeros(N, jnp.int32), label_node=jnp.full((C, 4), -1, jnp.int32),
        edges=jnp.full((E, 2), -1, jnp.int32), edge_valid=jnp.zeros(E, bool),
        edge_lengths=jnp.zeros(E, jnp.float32), edge_clearances=jnp.zeros(E, jnp.float32),
        num_nodes=jnp.int32(0), num_edges=jnp.int32(0))
    from aosx.plan.astar import cost_matrix

    world = engine.World(skeleton=grid, occupancy=grid, graph=g,
                         costmat=cost_matrix(g, S),
                         waypoints=Waypoints(xy=jnp.zeros((W, 2)), node_idx=jnp.full((W,), -1, jnp.int32), count=jnp.int32(0)))
    st = engine.initial_state(world, S)
    st = engine.EngineState(
        robot=engine.Robot(xy=jnp.array([1.5, -2.5]), yaw=jnp.float32(0.7)),
        mission=st.mission, control=st.control, wp=st.wp, plan=st.plan,
        raw_path=st.raw_path, last_mod=jnp.int32(2), t=jnp.int32(123))
    path = str(tmp_path / "ck")
    ckpt.save_state(path, st)
    back = ckpt.load_state(path, st)
    for a, b in zip(jax.tree_util.tree_leaves(st), jax.tree_util.tree_leaves(back)):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_yaml_schema_roundtrip(tmp_path):
    """The reference aos_planner_params.yaml schema parses into AosParams."""
    ref = "/root/reference/config/aos_planner_params.yaml"
    if os.path.exists(ref):
        params, statics = load_yaml(ref)
        assert float(params.clipping_minz) == -0.4   # node override section
        assert float(params.clipping_maxx) == 72.0
        assert statics["resolution"] == 0.05
        assert statics["inflation_radius"] == 0.8
    # our dashboard param patcher round-trips
    from aosx.dashboard import params_set

    p = tmp_path / "p.yaml"
    p.write_text("/**:\n  ros__parameters:\n    grid_resolution: 0.05\n")
    params_set(str(p), {"inflation_radius": 0.9})
    _, st = load_yaml(str(p))
    assert st["inflation_radius"] == 0.9


def test_gvd_graph_msg_export():
    from aosx.types import GvdGraph

    N, E, C = S.max_nodes, S.max_edges, S.max_rows
    nodes = np.zeros((N, 2), np.float32)
    nodes[:4] = [[0, 0], [1, 0], [0, 1], [1, 1]]
    label_node = np.full((C, 4), -1, np.int32)
    label_node[0] = [0, 1, 2, 3]
    label_node[1, 0] = 1  # node 1 also TL of cluster 1
    labels = np.zeros(N, np.int32)
    labels[0], labels[1], labels[2], labels[3] = 1, 2 | 1, 4, 8
    g = GvdGraph(
        nodes=jnp.asarray(nodes), node_valid=jnp.arange(N) < 4,
        node_labels=jnp.asarray(labels), label_node=jnp.asarray(label_node),
        edges=jnp.asarray(np.array([[0, 1], [1, 3]] + [[-1, -1]] * (E - 2), np.int32)),
        edge_valid=jnp.arange(E) < 2,
        edge_lengths=jnp.asarray(np.array([1.0, 1.0] + [0.0] * (E - 2), np.float32)),
        edge_clearances=jnp.zeros(E, jnp.float32),
        num_nodes=jnp.int32(4), num_edges=jnp.int32(2))
    msg = ros_msgs.gvd_graph_to_msg(g, 0.05, -1.0, -2.0)
    assert msg["num_nodes"] == 4 and msg["num_edges"] == 2
    assert msg["node_label_counts"] == [1, 2, 1, 1]
    assert msg["node_label_clusters"] == [0, 0, 1, 0, 0]
    assert msg["node_label_types"] == [0, 1, 0, 2, 3]
    assert msg["node_cluster_indices"] == [0, 0, 0, 0]
    assert msg["edges"] == [0, 1, 1, 3]
    # inverse direction reconstructs the dense table
    nodes2, edges2, lens2, ln2 = ros_msgs.msg_to_gvd_arrays(msg)
    assert (ln2[0] == [0, 1, 2, 3]).all()
    assert ln2[1, 0] == 1


def test_pcd_replay_end_to_end(tmp_path):
    """C16 episode replay: synthetic orchard -> PCD file -> perceive."""
    from aosx.orchards import OrchardSpec, make_orchard_np
    from aosx.perceive import perceive
    from aosx.types import PointCloud, Polygon
    from aosx.config import AosParams, params_as_f32

    xyz, poly = make_orchard_np(OrchardSpec(n_rows=2, row_len=6.0), seed=1)
    p = str(tmp_path / "map.pcd")
    iop.save_pcd(p, xyz.astype(np.float32))
    back = iop.load_pcd(p)
    buf = np.zeros((S.max_points, 3), np.float32)
    buf[: len(back)] = back
    valid = np.zeros(S.max_points, bool)
    valid[: len(back)] = True
    pc = PointCloud(xyz=jnp.asarray(buf), valid=jnp.asarray(valid))
    out = jax.jit(
        lambda pc, poly, pr, ex: perceive(pc, poly, pr, ex, S, ror_method="exact")
    )(pc, Polygon.from_array(poly.astype(np.float32), S), params_as_f32(AosParams()),
      jnp.zeros((S.max_exclusions, 3), jnp.float32))
    assert int(np.asarray(out.rows.valid).sum()) == 2
