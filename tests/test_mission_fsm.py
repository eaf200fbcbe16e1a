"""Mission FSM unit semantics (reference aos_path_gen_node.cpp:195-416):
docking freeze/advance, origin append, forced advance via the
/aos/next_waypoint service equivalent, and the failed-planning fallback."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aosx.config import TEST_STATICS as S, AosParams, params_as_f32
from aosx.plan.mission import _append_origin, force_next_waypoint, mission_tick
from aosx.types import MissionState, Waypoints


@pytest.fixture
def params():
    return params_as_f32(AosParams())


def _wp(points):
    W = S.max_waypoints
    xy = np.zeros((W, 2), np.float32)
    xy[: len(points)] = points
    ni = np.full(W, -1, np.int32)
    ni[: len(points)] = np.arange(len(points))
    return Waypoints(xy=jnp.asarray(xy), node_idx=jnp.asarray(ni), count=jnp.int32(len(points)))


def _state(**kw):
    st = MissionState.initial()
    return MissionState(**{**{f.name: getattr(st, f.name) for f in
                              __import__("dataclasses").fields(st)}, **kw})


def test_initial_waypoint_reach(params):
    wp = _wp([[10.0, 5.0], [12.0, 5.0]])
    st = MissionState.initial()
    robot = jnp.array([7.5, 0.3], jnp.float32)  # within 1 m of (8,0)
    st2, wp2, replan = mission_tick(st, wp, robot, jnp.int32(0), params)
    assert bool(st2.initial_reached)
    assert int(st2.target_wp) == 0
    assert int(st2.prev_wp) == -1


def test_docking_freeze_and_advance(params):
    wp = _wp([[10.0, 5.0], [12.0, 5.0], [14.0, 5.0]])
    st = _state(initial_reached=jnp.bool_(True), target_wp=jnp.int32(0),
                prev_wp=jnp.int32(-1))
    # robot within 0.7 m of WP0 -> freeze
    st2, _, replan = mission_tick(st, wp, jnp.array([10.3, 5.0]), jnp.int32(0), params)
    assert bool(st2.waiting_for_docking)
    assert not bool(replan)
    # mod 3 while frozen -> advance to WP1
    st3, _, replan = mission_tick(st2, wp, jnp.array([10.05, 5.0]), jnp.int32(3), params)
    assert int(st3.target_wp) == 1
    assert int(st3.prev_wp) == 0
    assert bool(replan)


def test_origin_append_on_last(params):
    wp = _wp([[10.0, 5.0], [12.0, 5.0]])
    st = _state(initial_reached=jnp.bool_(True), target_wp=jnp.int32(1),
                prev_wp=jnp.int32(0), waiting_for_docking=jnp.bool_(True))
    st2, wp2, _ = mission_tick(st, wp, jnp.array([12.0, 5.0]), jnp.int32(3), params)
    assert bool(st2.exploration_completed)
    assert int(wp2.count) == 3
    assert np.allclose(np.asarray(wp2.xy)[2], [0, 0])
    assert int(np.asarray(wp2.node_idx)[2]) == -1
    assert int(st2.target_wp) == 2
    assert int(st2.status) == 2  # Returning...


def test_origin_not_duplicated(params):
    wp = _wp([[10.0, 5.0], [0.05, 0.05]])  # last already ~origin
    wp2 = _append_origin(wp, params)
    assert int(wp2.count) == 2


def test_force_next_waypoint(params):
    wp = _wp([[10.0, 5.0], [12.0, 5.0], [14.0, 5.0]])
    st = _state(initial_reached=jnp.bool_(True), target_wp=jnp.int32(0),
                prev_wp=jnp.int32(-1), waiting_for_docking=jnp.bool_(True))
    st2, wp2, from_cur = force_next_waypoint(st, wp, params)
    assert int(st2.target_wp) == 1
    assert int(st2.prev_wp) == 0
    assert not bool(st2.waiting_for_docking)
    assert bool(from_cur)
    # at last -> origin append + completed
    st3 = _state(initial_reached=jnp.bool_(True), target_wp=jnp.int32(2),
                 prev_wp=jnp.int32(1))
    st4, wp3, _ = force_next_waypoint(st3, wp, params)
    assert bool(st4.exploration_completed)
    assert int(wp3.count) == 4
    # not yet at the initial waypoint -> refused
    st5 = MissionState.initial()
    st6, _, from_cur = force_next_waypoint(st5, wp, params)
    assert int(st6.target_wp) == int(st5.target_wp)
    assert not bool(from_cur)


def test_failed_planning_keeps_last_path(params):
    """Graph with no edges -> planning fails -> engine keeps the last path
    (cpp:1036-1043) and reports status Failed."""
    from aosx import engine
    from aosx.types import GridWorld, GvdGraph

    N, E, C = S.max_nodes, S.max_edges, S.max_rows
    g = GvdGraph(
        nodes=jnp.zeros((N, 2), jnp.float32),
        node_valid=jnp.arange(N) < 2,
        node_labels=jnp.zeros(N, jnp.int32),
        label_node=jnp.full((C, 4), -1, jnp.int32),
        edges=jnp.full((E, 2), -1, jnp.int32),
        edge_valid=jnp.zeros(E, bool),
        edge_lengths=jnp.zeros(E, jnp.float32),
        edge_clearances=jnp.zeros(E, jnp.float32),
        num_nodes=jnp.int32(2),
        num_edges=jnp.int32(0),
    )
    from aosx.plan.astar import cost_matrix

    occ = jnp.zeros((S.grid_h, S.grid_w), jnp.uint8)
    grid = GridWorld(occ=occ, origin_x=jnp.float32(-5.0), origin_y=jnp.float32(-5.0),
                     h_cells=jnp.int32(S.grid_h), w_cells=jnp.int32(S.grid_w))
    wp = _wp([[10.0, 5.0]])
    world = engine.World(skeleton=grid, occupancy=grid, graph=g,
                         costmat=cost_matrix(g, S), waypoints=wp)
    st = engine.initial_state(world, S)
    step = jax.jit(lambda st, w, p: engine.step(st, w, p, S))
    st, m = step(st, world, params)      # pre-initial: straight plan published
    straight_count = int(st.raw_path.count)
    assert straight_count > 0
    assert int(m["status"]) == 0
    # teleport to (8,0): initial reached, graph planning fails
    st = engine.EngineState(
        robot=engine.Robot(xy=jnp.array([8.0, 0.0], jnp.float32), yaw=jnp.float32(0)),
        mission=st.mission, control=st.control, wp=st.wp, plan=st.plan,
        raw_path=st.raw_path, last_mod=st.last_mod, t=st.t)
    st, m = step(st, world, params)
    assert int(m["status"]) == 1                     # Failed
    assert int(st.raw_path.count) == straight_count  # last path retained


def test_docking_stop_despite_accumulated_yaw(params):
    """Regression for the 13/4096 deterministic MC docking deadlocks
    (benchmarks/EXHAUSTED.json, diagnosed by probe_ctrl_trace.py): the
    unicycle's accumulated yaw drifted past +-2pi, so a robot sitting
    EXACTLY on its goal pose reported yaw_diff = 2pi through control's
    single-wrap normalized_angle (faithful to cpp:196-204) and mode 2
    never reached the stop state that releases the docking freeze.
    _move_robot now keeps the published yaw in (-pi, pi] (the invariant a
    quaternion-derived odometry yaw always satisfies); from the recorded
    stuck pose (yaw = goal_yaw + 4pi) the loop must recover the invariant
    and reach mode 3 within a few decimation cycles."""
    from aosx.engine import Robot, _move_robot
    from aosx.plan.control import control_tick, on_path
    from aosx.types import ControlState, Path

    goal_yaw = -1.471
    Q = S.max_plan
    xy = np.zeros((Q, 2), np.float32)
    xy[0] = [7.65, 0.95]
    yaw = np.zeros(Q, np.float32)
    yaw[0] = goal_yaw
    plan = Path(xy=jnp.asarray(xy), yaw=jnp.asarray(yaw), count=jnp.int32(1))
    robot = Robot(xy=jnp.array([7.65, 0.95], jnp.float32),
                  yaw=jnp.float32(goal_yaw + 4 * np.pi))  # two full wraps
    ctrl = ControlState.initial()
    reached_stop = False
    for _ in range(40):
        ctrl = on_path(ctrl, plan)
        ctrl, fired, mod, gxy, gyaw = control_tick(
            ctrl, robot.xy, robot.yaw, params)
        if int(mod) == 3:
            reached_stop = True
            break
        robot = _move_robot(robot, mod, plan, gxy, gyaw)
    assert reached_stop, "docking stop never fired: yaw-wrap deadlock"
    # invariant: the published yaw is back in (-pi, pi]
    assert abs(float(robot.yaw)) <= np.pi + 1e-6


def test_wrap_angle_properties():
    """wrap_angle (geom.py): bitwise no-op on [-pi, pi] (so the serving
    boundary can apply it unconditionally), full normalization for
    arbitrarily-wrapped inputs (where the reference-faithful single-wrap
    normalized_angle is wrong by construction)."""
    from aosx.geom import wrap_angle

    a = jnp.asarray(np.linspace(-np.pi, np.pi, 41), jnp.float32)
    assert (np.asarray(wrap_angle(a)) == np.asarray(a)).all()
    big = jnp.float32([11.095, -1.471 + 4 * np.pi, -13.0, 100.0, -4 * np.pi])
    w = np.asarray(wrap_angle(big))
    assert (np.abs(w) <= np.pi + 1e-5).all()
    assert np.allclose(np.sin(w), np.sin(np.asarray(big)), atol=1e-4)
    assert np.allclose(np.cos(w), np.cos(np.asarray(big)), atol=1e-4)


def test_follower_escapes_self_crossing_plan():
    """Regression for the realism key-942 capture (benchmarks/
    RESIDUAL_SUSTAINED_REALISM.json): a lasso-shaped plan that revisits an
    early point traps a pure nearest-point follower forever - at the
    crossing, the global argmin snaps back to the first pass and the loop
    repeats. Robot.follow_i's monotone window must carry the robot through
    the crossing to the plan's end."""
    from aosx.engine import Robot, _move_robot
    from aosx.types import Path

    # plan: straight east 0..2m, loop up-and-back crossing itself at x=1,
    # then continue east to (3, 0): indices ~20 and ~56 coincide at (1, 0)
    import numpy as np

    pts = []
    for i in range(41):                      # 0 .. 2.0 east (idx 20 = (1,0))
        pts.append((i * 0.05, 0.0))
    # loop: north from (2,0) to (2,1), west to (1,1), south THROUGH (1,0)
    # down to (1,-0.0) continuing east again - crosses idx 20
    for i in range(1, 21):
        pts.append((2.0, i * 0.05))
    for i in range(1, 21):
        pts.append((2.0 - i * 0.05, 1.0))
    for i in range(1, 21):
        pts.append((1.0, 1.0 - i * 0.05))    # ends exactly at (1, 0)
    for i in range(1, 41):
        pts.append((1.0 + i * 0.05, 0.0))    # east to (3, 0)
    Q = S.max_plan
    n = len(pts)
    xy = np.zeros((Q, 2), np.float32)
    xy[:n] = np.asarray(pts, np.float32)
    plan = Path(xy=jnp.asarray(xy), yaw=jnp.zeros(Q), count=jnp.int32(n))
    goal = xy[n - 1]

    robot = Robot(xy=jnp.zeros(2, jnp.float32), yaw=jnp.float32(0.0))
    for _ in range(400):                     # plan length ~5 m, 0.12/tick
        robot = _move_robot(robot, jnp.int32(0), plan,
                            jnp.asarray(goal), jnp.float32(0.0))
    d_end = float(np.hypot(*(np.asarray(robot.xy) - goal)))
    assert d_end < 0.6, (
        f"follower never reached the plan end (d={d_end:.2f}) - "
        "self-crossing capture regressed")
    assert int(np.asarray(robot.follow_i)) > n - 15


def test_follower_window_fallback_on_shrunk_plan():
    """The monotone window's GLOBAL fallback (engine._move_robot): when the
    carried follow_i exceeds the plan count (a dynamic-map rebuild replaced
    the plan with a shorter one without a config change), the follower must
    recover via the global nearest-point search instead of parking at a
    bogus early index forever."""
    from aosx.engine import Robot, _move_robot
    from aosx.types import Path
    import numpy as np

    Q = S.max_plan
    n = 30
    xy = np.zeros((Q, 2), np.float32)
    xy[:n, 0] = np.arange(n, dtype=np.float32) * 0.05   # straight east
    plan = Path(xy=jnp.asarray(xy), yaw=jnp.zeros(Q), count=jnp.int32(n))
    goal = xy[n - 1]

    robot = Robot(xy=jnp.array([0.5, 0.0], jnp.float32),
                  yaw=jnp.float32(0.0), follow_i=jnp.int32(200))  # > count
    for _ in range(40):
        robot = _move_robot(robot, jnp.int32(0), plan,
                            jnp.asarray(goal), jnp.float32(0.0))
    d_end = float(np.hypot(*(np.asarray(robot.xy) - goal)))
    assert d_end < 0.6, f"fallback failed: robot stuck {d_end:.2f} m from end"
    # progress restarted inside the live plan
    assert 0 <= int(np.asarray(robot.follow_i)) < n
