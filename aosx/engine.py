"""Closed-loop exploration engine (C16/C17).

The reference's six ROS nodes communicating over DDS collapse into pure
function composition: perceive -> GVD graph -> waypoints happen once per map
(prepare_world), then a jitted per-tick step runs
    control mode update  (aos_state_machine_node)
    mission FSM + replan (aos_path_gen_node)
    path linearization   (aos_path_linearization_node)
    robot kinematics     (external in the reference; a simple unicycle here)
The whole episode is a lax.scan, vmappable over thousands of procedural
orchards and shardable across a TPU mesh (aosx.parallel).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .config import AosParams, Statics
from .gvd import build_gvd_graph
from .perceive import perceive
from .plan.astar import cost_matrix
from .plan.control import control_tick, on_path
from .plan.linearize import linearize
from .plan.mission import build_waypoints, mission_tick, plan_current_path
from .types import (
    ControlState,
    GridWorld,
    GvdGraph,
    MissionState,
    Path,
    PointCloud,
    Polygon,
    Waypoints,
)


def _dc(cls):
    return jax.tree_util.register_dataclass(dataclasses.dataclass(frozen=True)(cls))


@_dc
class World:
    """Static per-episode data (one SLAM map)."""

    skeleton: Any      # GridWorld
    occupancy: Any     # GridWorld
    graph: Any         # GvdGraph
    costmat: Any       # plan.astar.CsrCosts ([N, D] padded adjacency)
    waypoints: Any     # Waypoints (initial tour)
    guards: Any = dataclasses.field(
        default_factory=lambda: jnp.int32(0))  # aosx.guards bitmask
    # skeleton dilated by the trim disc (plan.mission.trim_distance_plane);
    # None -> _trim uses the per-offset formulation (identical decisions,
    # ~50x more gathers - fine unbatched, expensive under vmap)
    trim_skel: Any = None


@_dc
class Robot:
    xy: Any
    yaw: Any
    # monotone plan-follow progress: the smallest plan index _move_robot may
    # snap to. A pure nearest-point follower is CAPTURED for ever by a
    # self-crossing plan (diagnosed on realism key 942: a 26.8 m plan whose
    # indices ~20-25 and ~432-437 coincide within 8 cm - the robot reaches
    # the crossing on its second pass, the global argmin snaps back to the
    # first pass, and the loop repeats; ~470 m traveled, mission never
    # completes). Reset to 0 at every plan adoption (engine.step /
    # plancache.step_cached use_new) - the index only ever advances while
    # one plan is followed. The reference delegates following to an
    # external controller, so this is a property of our stand-in, not of
    # reference semantics.
    follow_i: Any = dataclasses.field(default_factory=lambda: jnp.int32(0))


@_dc
class EngineState:
    robot: Any         # Robot
    mission: Any       # MissionState
    control: Any       # ControlState
    wp: Any            # Waypoints (mutates when origin is appended)
    plan: Any          # Path (linearized /plan)
    raw_path: Any      # Path (/aos/path)
    last_mod: Any      # last published control mode
    t: Any


def prepare_world_full(pc: PointCloud, poly: Polygon, params: AosParams,
                       exclusions, s: Statics, *, ror_method: str = "sorted",
                       with_owner: bool = False, stencil_mesh=None,
                       stencil_axis: str = "space"):
    """One full perception + graph pass over a static map. Returns
    (World, PerceiveOut, owner-plane-or-None); the extras feed the renderer's
    seed / tree-row / Voronoi-cell marker families (io/render.py).
    stencil_mesh: optional Mesh - row-shard the grid stencils across chips
    (see perceive.pipeline)."""
    out = perceive(pc, poly, params, exclusions, s, ror_method=ror_method,
                   stencil_mesh=stencil_mesh, stencil_axis=stencil_axis)
    world = world_from_perceive(out, params, s, stencil_mesh=stencil_mesh,
                                stencil_axis=stencil_axis)
    owner = owner_plane(out, params, s) if with_owner else None
    return world, out, owner


def owner_plane(out, params: AosParams, s: Statics):
    """Voronoi ownership plane for the renderer's cell overlay — the one
    merge_seeds + jump_flood composition, shared by prepare_world_full's
    with_owner path and the dashboard's --pcd-seq --cells path."""
    from .gvd.graph import merge_seeds
    from .gvd.voronoi import jump_flood

    return jump_flood(out.skeleton, merge_seeds(out.seeds, params, s), s)


def world_from_perceive(out, params: AosParams, s: Statics, *,
                        stencil_mesh=None, stencil_axis: str = "space") -> World:
    """Graph + costmat + waypoints + trim plane from a PerceiveOut: the
    world-assembly tail shared by prepare_world_full and the incremental
    path (aosx/incremental.py), so their bit-equivalence is structural."""
    graph = build_gvd_graph(out.seeds, out.rows_sorted, out.skeleton, params, s,
                            stencil_mesh=stencil_mesh, stencil_axis=stencil_axis)
    from .plan.mission import trim_distance_plane

    costmat = cost_matrix(graph, s)
    return World(
        skeleton=out.skeleton,
        occupancy=out.occupancy,
        graph=graph,
        costmat=costmat,
        waypoints=build_waypoints(graph, params, s),
        guards=out.guards | graph.guards | costmat.guards,
        trim_skel=trim_distance_plane(out.skeleton, s),
    )


def prepare_world(pc: PointCloud, poly: Polygon, params: AosParams, exclusions,
                  s: Statics, *, ror_method: str = "sorted",
                  stencil_mesh=None, stencil_axis: str = "space") -> World:
    """One full perception + graph pass over a static map."""
    world, _, _ = prepare_world_full(pc, poly, params, exclusions, s,
                                     ror_method=ror_method,
                                     stencil_mesh=stencil_mesh,
                                     stencil_axis=stencil_axis)
    return world


def initial_state(world: World, s: Statics) -> EngineState:
    P, Q = s.max_path, s.max_plan
    empty_raw = Path(xy=jnp.zeros((P, 2), jnp.float32), yaw=jnp.zeros(P), count=jnp.int32(0))
    empty_plan = Path(xy=jnp.zeros((Q, 2), jnp.float32), yaw=jnp.zeros(Q), count=jnp.int32(0))
    return EngineState(
        robot=Robot(xy=jnp.zeros(2, jnp.float32), yaw=jnp.float32(0.0)),
        mission=MissionState.initial(),
        control=ControlState.initial(),
        wp=world.waypoints,
        plan=empty_plan,
        raw_path=empty_raw,
        last_mod=jnp.int32(3),
        t=jnp.int32(0),
    )


def _move_robot(robot: Robot, mod, plan: Path, goal_xy, goal_yaw,
                v_dt=jnp.float32(0.12), yaw_rate=jnp.float32(0.6)):
    """Minimal unicycle stand-in for the external controller: follow the
    plan in mode 0, converge on the goal pose in modes 1/2, freeze in 3."""
    Q = plan.xy.shape[0]
    idx = jnp.arange(Q)
    d = jnp.sqrt(jnp.sum((plan.xy - robot.xy[None, :]) ** 2, axis=1))
    # monotone window (Robot.follow_i docstring): never snap backward past
    # the carried progress index - identical to the plain nearest-point
    # search except on self-crossing plans, where the plain search loops.
    # If the window is empty (the plan was replaced by a SHORTER one
    # without a config change - dynamic-map rebuild), fall back to the
    # global search and restart progress there.
    live_g = idx < plan.count
    live_w = live_g & (idx >= robot.follow_i)
    d_w = jnp.where(live_w, d, 3.4e38)
    d_g = jnp.where(live_g, d, 3.4e38)
    ci = jnp.where(jnp.any(live_w), jnp.argmin(d_w), jnp.argmin(d_g))
    follow_i = ci.astype(jnp.int32)
    look = jnp.minimum(ci + 10, jnp.maximum(plan.count - 1, 0))
    follow_tgt = plan.xy[look]

    tgt = jnp.where(mod == 0, follow_tgt, goal_xy)
    delta = tgt - robot.xy
    dist = jnp.sqrt(jnp.sum(delta**2))
    step = jnp.minimum(v_dt, dist)
    move = jnp.where(dist > 1e-6, delta / jnp.maximum(dist, 1e-6) * step, jnp.zeros(2))
    new_xy = jnp.where(mod == 3, robot.xy, robot.xy + move)

    desired = jnp.where(
        (mod == 1) | (mod == 2) | (dist <= 1e-6),
        jnp.where(dist < 0.3, goal_yaw, jnp.arctan2(delta[1], delta[0])),
        jnp.arctan2(delta[1], delta[0]),
    )
    dyaw = jnp.arctan2(jnp.sin(desired - robot.yaw), jnp.cos(desired - robot.yaw))
    new_yaw = jnp.where(
        mod == 3, robot.yaw, robot.yaw + jnp.clip(dyaw, -yaw_rate, yaw_rate)
    )
    # Keep the published yaw wrapped to (-pi, pi], like the quaternion-derived
    # odometry yaw the reference consumes (aos_state_machine_node.cpp:83-141
    # reads tf2-converted yaw, always single-wrap). Without this invariant the
    # accumulated yaw can drift past +-2pi and control's single-wrap
    # normalized_angle (faithful to cpp:196-204) reports |diff| = 2pi for a
    # robot facing EXACTLY at goal_yaw - the stop transition then never fires
    # and docking deadlocks forever (the 13/4096 budget-exhausted Monte-Carlo
    # lanes in benchmarks/EXHAUSTED.json, diagnosed by probe_ctrl_trace.py:
    # yaw=11.095 == goal_yaw + 4pi, ydiff pinned at 6.283; fixed in dbfc325).
    # geom.wrap_angle handles ANY magnitude - yaw_rate is caller-overridable,
    # so a >= pi override must not silently re-open the deadlock - and is
    # bitwise identical to a single conditional wrap on |yaw| < 3*pi inputs,
    # which every default-rate trajectory satisfies (ADVICE r3).
    from .geom import wrap_angle

    return Robot(xy=new_xy, yaw=wrap_angle(new_yaw), follow_i=follow_i)


def step(state: EngineState, world: World, params: AosParams, s: Statics,
         *, v_dt=jnp.float32(0.12)):
    """One engine tick. Returns (state, metrics dict). v_dt is the stand-in
    robot's per-tick travel (the external controller's speed x tick period;
    tests raise it to shorten episodes without changing FSM semantics)."""
    # 1. control tick on the current /plan (odometry message equivalent)
    ctrl = on_path(state.control, state.plan)
    ctrl, fired, mod, goal_xy, goal_yaw = control_tick(
        ctrl, state.robot.xy, state.robot.yaw, params
    )
    mod_pub = jnp.where(fired | ~ctrl.goal_initialized, mod, state.last_mod)

    # 2. mission FSM + replanning
    mission, wp, should_replan = mission_tick(
        state.mission, state.wp, state.robot.xy, mod_pub, params
    )
    raw, success = plan_current_path(
        mission, wp, world.graph, world.costmat, world.skeleton, params, s,
        trim_plane=world.trim_skel,
    )
    # keep last path when frozen or failed (cpp:265-271, 1036-1043)
    use_new = should_replan & success
    raw_path = Path(
        xy=jnp.where(use_new, raw.xy, state.raw_path.xy),
        yaw=jnp.where(use_new, raw.yaw, state.raw_path.yaw),
        count=jnp.where(use_new, raw.count, state.raw_path.count),
    )
    plan_path = linearize(raw_path, params, s)
    status = jnp.where(
        mission.status == 3, 3,
        jnp.where(mission.status == 2, 2, jnp.where(success, 0, 1)),
    )
    mission = MissionState(
        target_wp=mission.target_wp,
        prev_wp=mission.prev_wp,
        initial_reached=mission.initial_reached,
        exploration_completed=mission.exploration_completed,
        waiting_for_docking=mission.waiting_for_docking,
        status=status,
        origin_appended=mission.origin_appended,
    )

    # 3. robot kinematics. The follower's monotone progress index resets
    # when the adopted plan's CONTENT changes - NOT on use_new alone, which
    # fires every unfrozen tick under the replan-every-tick contract and
    # (on a static world) re-adopts the same path. Comparing content also
    # covers every dynamic-map case a config-change test would miss: a
    # late adoption after a graph rebuild (config changed ticks earlier,
    # when the replan still failed) and a rebuild that replaces the plan
    # for the SAME config. step_cached's row-index reset is the same
    # condition in cache coordinates (distinct rows hold distinct plans -
    # consecutive legs end at waypoints >= 0.2 m apart).
    # BITWISE content compare (int32 bitcast): a float != would treat a
    # NaN-carrying path as "changed" every tick (NaN != NaN), resetting
    # the monotone index exactly where the path is already degenerate
    raw_bits = jax.lax.bitcast_convert_type(raw.xy, jnp.int32)
    old_bits = jax.lax.bitcast_convert_type(state.raw_path.xy, jnp.int32)
    content_changed = use_new & (
        (raw.count != state.raw_path.count) | jnp.any(raw_bits != old_bits)
    )
    robot_in = dataclasses.replace(
        state.robot,
        follow_i=jnp.where(content_changed, 0,
                           state.robot.follow_i).astype(jnp.int32),
    )
    robot = _move_robot(robot_in, mod_pub, plan_path, ctrl.goal_xy,
                        ctrl.goal_yaw, v_dt=v_dt)

    new_state = EngineState(
        robot=robot,
        mission=mission,
        control=ctrl,
        wp=wp,
        plan=plan_path,
        raw_path=raw_path,
        last_mod=mod_pub,
        t=state.t + 1,
    )
    from .plan.mission import current_cluster_index

    # isfinite hygiene on everything this tick publishes (the reference
    # checks isfinite throughout, e.g. voronoi_diagram.cpp:28-30,67-69;
    # padding is zero-filled so the full padded arrays are checkable)
    nonfinite = (
        jnp.sum((~jnp.isfinite(robot.xy)).astype(jnp.int32))
        + jnp.sum((~jnp.isfinite(plan_path.xy)).astype(jnp.int32))
        + jnp.sum((~jnp.isfinite(raw_path.xy)).astype(jnp.int32))
        + jnp.sum((~jnp.isfinite(ctrl.goal_xy)).astype(jnp.int32))
    )
    from .guards import GUARD_NONFINITE, GUARD_PLAN_CAP

    # a /plan that FILLS max_plan was almost certainly truncated by
    # linearize's fixed buffer (it caps ocount at the buffer size with no
    # in-function signal) — a short plan ends before the docking ring and
    # stalls the mission with no other flag. Conservative: a plan exactly
    # at capacity is flagged even if nothing was dropped.
    plan_capped = plan_path.count >= jnp.int32(s.max_plan)
    metrics = dict(
        xy=robot.xy,
        yaw=robot.yaw,
        mod=mod_pub,
        status=status,
        target_wp=mission.target_wp,
        cluster_idx=current_cluster_index(mission.target_wp, world.graph),
        waiting=mission.waiting_for_docking,
        completed=mission.exploration_completed,
        plan_len=plan_path.count,
        nonfinite=nonfinite,
        guards=world.guards
        | jnp.where(nonfinite > 0, jnp.int32(GUARD_NONFINITE), 0)
        | jnp.where(plan_capped, jnp.int32(GUARD_PLAN_CAP), 0),
    )
    return new_state, metrics


def replay_episode(
    pc_frames: PointCloud,   # stacked [F, ...] map snapshots (growing SLAM map)
    poly: Polygon,
    params: AosParams,
    exclusions,
    s: Statics,
    steps_per_frame: int,
    *,
    ror_method: str = "sorted",
):
    """Dynamic-map closed loop (BASELINE config 4): per map frame, re-run the
    full perceive -> GVD -> waypoints pass (the reference recomputes the graph
    on every map update, aos_gvd_node.cpp:152-177), restore the mission
    target across the rebuild (aos_path_gen_node.cpp:456-560), then run
    `steps_per_frame` control ticks. Returns (final state, per-frame metrics
    pytree stacked [F, steps_per_frame, ...])."""
    from .plan.mission import rebuild_waypoints

    world0 = prepare_world(
        jax.tree_util.tree_map(lambda x: x[0], pc_frames), poly, params,
        exclusions, s, ror_method=ror_method,
    )
    st0 = initial_state(world0, s)

    def frame_body(st, pc_f):
        world = prepare_world(pc_f, poly, params, exclusions, s, ror_method=ror_method)
        mission, wp = rebuild_waypoints(st.mission, st.wp, world.graph, params, s)
        st = EngineState(
            robot=st.robot, mission=mission, control=st.control, wp=wp,
            plan=st.plan, raw_path=st.raw_path, last_mod=st.last_mod, t=st.t,
        )

        def tick(st, _):
            return step(st, world, params, s)

        st, metrics = jax.lax.scan(tick, st, None, length=steps_per_frame)
        return st, metrics

    return jax.lax.scan(frame_body, st0, pc_frames)


def episode(world: World, params: AosParams, s: Statics, n_steps: int,
            *, v_dt=jnp.float32(0.12)):
    """Full closed-loop rollout via lax.scan. Returns (final state, stacked
    per-step metrics)."""
    st0 = initial_state(world, s)

    def body(st, _):
        st, m = step(st, world, params, s, v_dt=v_dt)
        return st, m

    return jax.lax.scan(body, st0, None, length=n_steps)
