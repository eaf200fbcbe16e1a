"""Precomputed plan cache: replan-free closed-loop ticks on a static world.

The reference replans on EVERY position message (currentPosCallback,
aos_path_gen_node.cpp:195-278) — but planAndPublishPath's start point is the
PREVIOUS WAYPOINT, not the robot pose (cpp:1046-1060; the robot position is
used only by the /aos/next_waypoint service). So on a static world (fixed
graph/costmat/skeleton — exactly the Monte-Carlo rollout setting, where the
world is built once per orchard) the raw path is a pure function of the
DISCRETE mission configuration:

    (initial_reached, target_wp, prev_wp, origin_appended)

and a closed-loop episode (no service calls, no graph rebuilds) visits at
most W+4 distinct configurations:

    row 0        initial straight line (0,0)->(8,0)   [~initial_reached]
    rows 1..W    target t in 0..W-1, prev = t-1       [mid-tour; prev=-1 at t=0]
    row W+1      origin return, prev = last tour wp   [first completing advance]
    row W+2      origin return, prev == target        [repeat advance at origin]
    row W+3      target_wp < 0 with initial_reached   [degenerate; always fails]
    row W+4      the initial empty path               [linearize(empty) — the
                 pre-first-adoption /plan content]

Precomputing plan_current_path + linearize for every row once per world and
SELECTING by row index per tick is therefore BIT-IDENTICAL to replanning
every tick (tests/test_plancache.py pins full-episode metric equality) while
removing the A* and linearization while_loops — the components whose lockstep
tails grow with path length under vmap (CLAUDE.md round-3 ablation: 8.5 ->
13.6 ms/step from t30 to t200 at batch 128) — from the per-tick step
entirely.

Per-tick costs that replace them:
  - row index: scalar integer math on the mission state
  - scalars (count/goal/success/nonfinite): 1-element gathers
  - the plan xy buffer for the follower/controller: an exact bitwise
    masked-sum select over the [R, max_plan, 2] cache (R ~ 25 for the MC
    config; bandwidth-bound sequential reads, NOT a serial gather). The
    select sums int32 BITCASTS with a one-hot mask, so even -0.0 / NaN
    payloads survive exactly — a float masked-sum would rewrite -0.0 to
    +0.0 ((-0.0) + (+0.0) = +0.0 in IEEE).

step_cached contains no lax.cond, so it is safe under vmap (a vmapped cond
executes both branches — CLAUDE.md). build_plan_cache runs once per world in
the rollout begin phase.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..config import AosParams, Statics
from ..types import ControlState, MissionState, Path, Waypoints
from .control import control_tick
from .linearize import linearize
from .mission import (
    _append_origin,
    cluster_index_from_total,
    labeled_cluster_total,
    mission_tick,
    plan_current_path,
)


def _dc(cls):
    return jax.tree_util.register_dataclass(dataclasses.dataclass(frozen=True)(cls))


@_dc
class PlanCache:
    """Per-world precomputed plans, one row per reachable mission config."""

    plan_xy: Any     # [R, max_plan, 2] f32 linearized /plan points
    plan_yaw: Any    # [R, max_plan] f32 per-point yaw (serving /plan export;
    #                  step_cached itself never reads it - the follower and
    #                  control tick consume xy + the goal pose only)
    plan_count: Any  # [R] i32
    goal_xy: Any     # [R, 2] f32 = plan_xy[r, max(count-1, 0)]
    goal_yaw: Any    # [R] f32  = plan_yaw[r, max(count-1, 0)]
    success: Any     # [R] bool plan_current_path success
    nonfinite: Any   # [R] i32 count of nonfinite in plan.xy + raw.xy


@_dc
class WorldLite:
    """Everything step_cached still needs from the World once the plans are
    cached: two scalars. Batched rollouts keep ONLY this + the cache per
    lane after begin — the grids / graph / costmat leave HBM entirely."""

    guards: Any         # i32 world-build guard bitmask
    cluster_total: Any  # i32 labeled-cluster count (mission.labeled_cluster_total)


def world_lite(world) -> WorldLite:
    return WorldLite(guards=world.guards,
                     cluster_total=labeled_cluster_total(world.graph))


@_dc
class CachedEngineState:
    """engine.EngineState with the carried paths replaced by the adopted
    cache row index (keep-last-path == keep-last-index)."""

    robot: Any
    mission: Any
    control: Any
    wp: Any
    adopted: Any     # i32 cache row currently published as /plan
    last_mod: Any
    t: Any


def num_rows(s: Statics) -> int:
    return s.max_waypoints + 5


def cache_row_index(mission: MissionState, s: Statics):
    """Map a mission configuration to its cache row (module docstring)."""
    W = s.max_waypoints
    return jnp.where(
        ~mission.initial_reached, 0,
        jnp.where(
            mission.target_wp < 0, W + 3,
            jnp.where(
                ~mission.origin_appended, 1 + mission.target_wp,
                jnp.where(mission.prev_wp == mission.target_wp, W + 2, W + 1),
            ),
        ),
    ).astype(jnp.int32)


def build_plan_cache(world, params: AosParams, s: Statics,
                     wp_base=None) -> PlanCache:
    """Run plan_current_path + linearize for every reachable mission config
    of this (static) world. One-time cost per rollout, vmapped over rows.

    wp_base is the waypoint tour the engine carries (default
    world.waypoints, the closed-loop initial state). When rebuilding the
    cache after a graph change mid-replay, pass the POST-rebuild_waypoints
    carried wp: if exploration completed, that tour is the kept old tour
    with origin appended, and _append_origin's 0.2 m near-guard makes the
    W+1/W+2 re-append a no-op on it, so rows W+1/W+2 match the engine
    exactly (rows 1..W are then never selected: origin_appended routes
    cache_row_index to W+1/W+2 only)."""
    W = s.max_waypoints
    R = num_rows(s)
    wp0 = world.waypoints if wp_base is None else wp_base
    wp2 = _append_origin(wp0, params)
    c2 = wp2.count

    rows = jnp.arange(R, dtype=jnp.int32)
    # rows 1..W: target = row-1, prev = row-2 (prev=-1 at target 0)
    target = rows - 1
    prev = rows - 2
    target = target.at[0].set(-1).at[W + 1].set(c2 - 1).at[W + 2].set(c2 - 1)
    target = target.at[W + 3].set(-1).at[W + 4].set(-1)
    prev = prev.at[0].set(-1).at[W + 1].set(c2 - 2).at[W + 2].set(c2 - 1)
    prev = prev.at[W + 3].set(-1).at[W + 4].set(-1)
    init_reached = rows != 0
    use_wp2 = (rows == W + 1) | (rows == W + 2)

    f = jnp.bool_(False)
    missions = MissionState(
        target_wp=target,
        prev_wp=prev,
        initial_reached=init_reached,
        exploration_completed=jnp.broadcast_to(f, (R,)),
        waiting_for_docking=jnp.broadcast_to(f, (R,)),
        status=jnp.zeros((R,), jnp.int32),
        origin_appended=use_wp2,
    )
    wps = Waypoints(
        xy=jnp.where(use_wp2[:, None, None], wp2.xy[None], wp0.xy[None]),
        node_idx=jnp.where(use_wp2[:, None], wp2.node_idx[None], wp0.node_idx[None]),
        count=jnp.where(use_wp2, wp2.count, wp0.count),
    )

    def one(m, wp):
        # dead-row gate: the graph search's result is provably never read
        # for rows where it cannot be adopted —
        #   row 0 (~initial_reached): the straight-line branch is selected
        #     unconditionally (plan_current_path: use_straight), gxy is dead;
        #   rows with target outside [0, wp.count): success = found & have_wp
        #     is already forced False, count is forced 0, and step_cached
        #     only ever reads xy/nonfinite of ADOPTED rows (adoption requires
        #     success) — mid-tour rows past the actual tour, W+3, W+4.
        # Skipping their A* keeps episodes bit-identical
        # (tests/test_plancache.py) and makes dead rows ~free under the
        # sequential row scan: with the bench's ~9-waypoint tours only ~12 of
        # the 25 rows pay a search.
        live = m.initial_reached & (m.target_wp >= 0) & (m.target_wp < wp.count)
        raw, success = plan_current_path(
            m, wp, world.graph, world.costmat, world.skeleton, params, s,
            trim_plane=world.trim_skel, astar_enabled=live,
        )
        plan = linearize(raw, params, s)
        return raw, plan, success

    # lax.map (sequential scan over rows), NOT jax.vmap: under an OUTER lane
    # vmap (parallel/batch.rollout_begin_cached) the 3-level nest
    # lanes x rows x astar-candidates is MISCOMPILED by the axon TPU
    # toolchain at lane width >= 16 — specific rows come back
    # success=False/count=0 (deterministic, data-dependent, bit-clean at
    # widths 4/8, reproduced with the SAME world tiled into every lane, real
    # v5e 2026-08-19; this silently stalled 86% of plan-cached sustained MC
    # rollouts). The scan keeps the primitive-level batch 2-D
    # (lanes x candidates), the shape the plain per-tick path runs at width
    # 128 with full parity. Sequentializing rows costs nothing measurable:
    # the lockstep A* while_loop already ran every row to the max trip
    # count. tests/test_plancache.py pins bitwise episode equality on CPU;
    # benchmarks/repro_cached_divergence.py is the TPU-scale check.
    raws, plans, success = jax.lax.map(lambda mw: one(*mw), (missions, wps))

    # row W+4 = the engine's initial empty /aos/path and its linearization
    # (the /plan content every tick publishes until the first adoption)
    P = s.max_path
    empty_raw = Path(xy=jnp.zeros((P, 2), jnp.float32),
                     yaw=jnp.zeros(P), count=jnp.int32(0))
    empty_plan = linearize(empty_raw, params, s)
    raws = Path(
        xy=raws.xy.at[W + 4].set(empty_raw.xy),
        yaw=raws.yaw.at[W + 4].set(empty_raw.yaw),
        count=raws.count.at[W + 4].set(empty_raw.count),
    )
    plans = Path(
        xy=plans.xy.at[W + 4].set(empty_plan.xy),
        yaw=plans.yaw.at[W + 4].set(empty_plan.yaw),
        count=plans.count.at[W + 4].set(empty_plan.count),
    )
    success = success.at[W + 4].set(False)

    return PlanCache(**jax.vmap(_row_payload)(raws, plans, success))


def _row_payload(raw: Path, plan: Path, success) -> dict:
    """One cache row's payload from a (raw, linearized) plan pair. Shared by
    build_plan_cache (vmapped over rows) and pin_live_row so the goal /
    nonfinite formulas cannot drift between built and pinned rows — they are
    bit-exactness-critical (step_cached metrics must match engine.step)."""
    gi = jnp.maximum(plan.count - 1, 0)
    nf = (jnp.sum((~jnp.isfinite(plan.xy)).astype(jnp.int32))
          + jnp.sum((~jnp.isfinite(raw.xy)).astype(jnp.int32)))
    return dict(plan_xy=plan.xy, plan_yaw=plan.yaw, plan_count=plan.count,
                goal_xy=plan.xy[gi], goal_yaw=plan.yaw[gi], success=success,
                nonfinite=nf)


def tour_feasibility(cache: PlanCache, wp, params: AosParams, s: Statics,
                     *, dock_margin=0.0):
    """Static mission-completion feasibility of this world, from its plan
    cache. Mission advance has exactly ONE route (reference semantics,
    aos_path_gen_node.cpp:280-343 + :248-256): the robot must come within
    ``docking_radius`` of the target waypoint (docking freeze) and then
    reach control mode 3 — there is no skip, timeout, or alternate path
    (the /aos/next_waypoint service is a manual escape hatch). The stand-in
    follower tracks the linearized /plan and converges exactly on its last
    point, so a leg is completable iff
      - its plan exists (``cache.success``), and
      - some linearized plan point lies within docking_radius of the target
        waypoint (the robot passes through / converges on those points).

    SCOPE OF THE LABEL (VERDICT r4 weak #4): the dockability test is exact
    for THIS REPO'S stand-in follower, which converges on plan points
    (engine._move_robot). A real external controller (the serving path's
    ``external_pose=True`` consumer) can cut corners or overshoot and fail
    a leg this predicate calls feasible — "infeasible" is still absolute
    (no controller can dock where no plan point enters the ring), but
    "feasible" is relative to the plan-point-converging contract. A
    consumer with a sloppier controller passes ``dock_margin`` > 0 to
    tighten the ring: the predicate then requires a plan point within
    ``docking_radius - dock_margin`` of the target, i.e. the controller
    may miss the plan by up to dock_margin and still trigger docking.
    Every committed artifact that carries this label records the contract
    (bench_sustained's ``feasibility_contract`` field; MIGRATION.md).
    Completion additionally needs the initial straight leg to end within
    ``initial_arrive_dist`` of the initial waypoint (trim can cut it) and a
    nonempty tour. ``exploration_completed`` is set at the advance FROM the
    last tour waypoint (mission_tick ``completing``), so the origin-return
    legs (rows W+1/W+2) affect only the final status / distance-to-origin,
    reported separately as ``returnable``.

    A world that fails this predicate stalls under the REFERENCE's own
    semantics too (it would sit republishing the last path until an operator
    calls the service) — recording it as ``infeasible`` instead of
    ``budget_exhausted`` removes survivorship bias from Monte-Carlo sweep
    statistics (VERDICT r3 next-round #1b). Validated empirically against
    full episodes in benchmarks/probe_realism_diag.py.

    Returns a dict of scalars: feasible (bool), row0_ok (bool),
    first_bad_leg (i32 cache-row index, num_rows(s) if none), bad_legs
    (i32), returnable (bool)."""
    W = s.max_waypoints
    R = num_rows(s)
    rows = jnp.arange(R, dtype=jnp.int32)

    wp2 = _append_origin(wp, params)
    origin_tgt = wp2.xy[jnp.clip(wp2.count - 1, 0, wp2.xy.shape[0] - 1)]
    tgt = wp.xy[jnp.clip(rows - 1, 0, wp.xy.shape[0] - 1)]      # [R,2]
    is_origin_row = (rows == W + 1) | (rows == W + 2)
    tgt = jnp.where(is_origin_row[:, None], origin_tgt[None, :], tgt)

    d = jnp.sqrt(jnp.sum((cache.plan_xy - tgt[:, None, :]) ** 2, axis=-1))
    valid = jnp.arange(cache.plan_xy.shape[1])[None, :] < cache.plan_count[:, None]
    mind = jnp.min(jnp.where(valid, d, jnp.float32(3.4e38)), axis=1)
    dockable = cache.success & (cache.plan_count > 0) & (
        mind <= params.docking_radius - dock_margin)

    live = (rows >= 1) & (rows <= wp.count)      # mid-tour legs: targets 0..count-1
    legs_ok = jnp.where(live, dockable, True)
    init_wp = jnp.stack([params.initial_waypoint_x, params.initial_waypoint_y])
    row0_ok = jnp.sqrt(jnp.sum((cache.goal_xy[0] - init_wp) ** 2)) \
        <= params.initial_arrive_dist
    feasible = row0_ok & jnp.all(legs_ok) & (wp.count > 0)
    first_bad = jnp.min(jnp.where(legs_ok, R, rows)).astype(jnp.int32)
    first_bad = jnp.where(row0_ok, first_bad, jnp.int32(0))
    return dict(
        feasible=feasible,
        row0_ok=row0_ok,
        first_bad_leg=first_bad,
        bad_legs=jnp.sum((~legs_ok).astype(jnp.int32))
        + (~row0_ok).astype(jnp.int32),
        returnable=dockable[W + 1],
    )


def add_carry_row(cache: PlanCache, s: Statics) -> PlanCache:
    """Append one CARRY row (index num_rows(s)) for dynamic-map replays.

    engine.step keeps the last adopted raw path when a replan is frozen or
    fails (engine.py:193-199), and a graph rebuild does not itself replan —
    so across a rebuild the published /plan is still the OLD world's plan.
    With an index-carried plan that content would be lost when the cache
    rows are rebuilt; the carry row preserves it: on a rebuild, set it to
    the old cache's adopted row (carry_adopted_row) and point adopted at it.
    Initialized to the empty row W+4 (the engine's initial carried path).
    cache_row_index never returns the carry index, so a successful replan
    moves adoption back into rows 0..R-1."""
    W4 = num_rows(s) - 1  # the empty-path row

    def app(a):
        return jnp.concatenate([a, a[W4:W4 + 1]], axis=0)

    return jax.tree_util.tree_map(app, cache)


def carry_adopted_row(new_cache: PlanCache, old_cache: PlanCache,
                      old_adopted) -> PlanCache:
    """new_cache with its carry row := old_cache[old_adopted] (exact
    keep-last-path across a world rebuild). Both caches must have the
    carry row (add_carry_row); old_adopted may itself be the carry row."""
    R = new_cache.plan_xy.shape[0] - 1

    def put(a, b):
        return a.at[R].set(b[old_adopted])

    return jax.tree_util.tree_map(put, new_cache, old_cache)


def rows_bitwise_equal(cache: PlanCache, i, j):
    """True iff rows i and j of every cache leaf are bitwise identical
    (floats compared as int32 bitcasts, so NaN payloads and -0.0 count as
    equal to themselves — the same convention as engine.step's
    content-changed compare, engine.py:277-281)."""

    def leaf_eq(a):
        x, y = a[i], a[j]
        if jnp.issubdtype(x.dtype, jnp.floating):
            x = jax.lax.bitcast_convert_type(x, jnp.int32)
            y = jax.lax.bitcast_convert_type(y, jnp.int32)
        return jnp.all(x == y)

    eqs = [leaf_eq(l) for l in jax.tree_util.tree_leaves(cache)]
    return jnp.all(jnp.stack(eqs))


def pin_live_row(cache: PlanCache, world, mission: MissionState,
                 wp: Waypoints, params: AosParams, s: Statics) -> PlanCache:
    """Overwrite the row cache_row_index(mission) selects with the plan for
    the ACTUAL (prev_wp, target_wp) pair of this mission state.

    The row encoding assumes prev_wp == target_wp - 1 mid-tour (and the
    c2-1/c2-2 pairs at the origin rows), which every mission_tick advance
    preserves (prev := old target). But rebuild_waypoints restores target_wp
    by POSITION while keeping prev_wp (plan/mission.py:214-277) — so right
    after a graph rebuild the live config can violate the encoding, and
    engine.step plans from wp[prev_wp] regardless (the reference replans
    from the previous waypoint, aos_path_gen_node.cpp:1046-1060). One extra
    plan_current_path + linearize per rebuild, keyed on the live config,
    restores exact bit-identity; the anomalous pair can only exist until
    the next advance, which re-establishes the encoding."""
    raw, success = plan_current_path(
        mission, wp, world.graph, world.costmat, world.skeleton, params, s,
        trim_plane=world.trim_skel,
    )
    pay = _row_payload(raw, linearize(raw, params, s), success)
    r = cache_row_index(mission, s)
    return PlanCache(**{
        k: getattr(cache, k).at[r].set(v) for k, v in pay.items()
    })


def initial_cached_state(world, s: Statics) -> CachedEngineState:
    from ..engine import initial_state

    st = initial_state(world, s)
    return CachedEngineState(
        robot=st.robot, mission=st.mission, control=st.control, wp=st.wp,
        adopted=jnp.int32(s.max_waypoints + 4), last_mod=st.last_mod, t=st.t,
    )


def _on_path_cached(state: ControlState, cache: PlanCache, adopted):
    """plan.control.on_path on the cached plan: only the goal pose (last
    /plan point) and count>0 are read, both precomputed per row."""
    has = cache.plan_count[adopted] > 0
    new_xy = cache.goal_xy[adopted]
    new_yaw = cache.goal_yaw[adopted]
    changed = has & (
        ~state.goal_initialized
        | jnp.any(new_xy != state.goal_xy)
        | (new_yaw != state.goal_yaw)
    )
    return ControlState(
        mode=state.mode,
        is_path_received=state.is_path_received | changed,
        goal_initialized=state.goal_initialized | changed,
        odom_cnt=state.odom_cnt,
        goal_xy=jnp.where(changed, new_xy, state.goal_xy),
        goal_yaw=jnp.where(changed, new_yaw, state.goal_yaw),
    )


def select_row(arr, adopted):
    """Exact row select of an [R, ...] f32 array via one-hot masked sum of
    int32 BITCASTS (bandwidth-bound; a gather would be serial, a float sum
    would lose -0.0 / NaN payloads)."""
    R = arr.shape[0]
    bits = jax.lax.bitcast_convert_type(arr, jnp.int32)
    sel = (jnp.arange(R, dtype=jnp.int32) == adopted).reshape(
        (R,) + (1,) * (arr.ndim - 1))
    picked = jnp.sum(jnp.where(sel, bits, 0), axis=0)
    return jax.lax.bitcast_convert_type(picked, jnp.float32)


def step_cached(state: CachedEngineState, lite: WorldLite, cache: PlanCache,
                params: AosParams, s: Statics, *, v_dt=jnp.float32(0.12),
                external_pose: bool = False):
    """engine.step with the per-tick replan + linearization replaced by the
    cache row select. Bit-identical metrics and robot/mission/control
    trajectories (tests/test_plancache.py). No lax.cond — vmap-safe.

    external_pose=True (static): the robot is REAL — state.robot already
    holds the measured pose for this tick (serving.serve_control_tick
    injected it) and nothing simulates motion, so _move_robot is skipped
    and the pose passes through unchanged. Everything the tick decides
    (control mode, mission arrival/docking, plan adoption) is computed
    from that measured pose exactly as from a simulated one."""
    from ..engine import _move_robot
    from ..guards import GUARD_NONFINITE, GUARD_PLAN_CAP

    # 1. control tick on the currently-published /plan
    ctrl = _on_path_cached(state.control, cache, state.adopted)
    ctrl, fired, mod, goal_xy, goal_yaw = control_tick(
        ctrl, state.robot.xy, state.robot.yaw, params
    )
    mod_pub = jnp.where(fired | ~ctrl.goal_initialized, mod, state.last_mod)

    # 2. mission FSM; the "replan" is the cache row lookup
    mission, wp, should_replan = mission_tick(
        state.mission, state.wp, state.robot.xy, mod_pub, params
    )
    idx_now = cache_row_index(mission, s)
    success = cache.success[idx_now]
    use_new = should_replan & success
    adopted = jnp.where(use_new, idx_now, state.adopted)

    plan_count = cache.plan_count[adopted]
    plan_xy = select_row(cache.plan_xy, adopted)
    plan_path = Path(xy=plan_xy, yaw=jnp.zeros((s.max_plan,), jnp.float32),
                     count=plan_count)

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

    # 3. robot kinematics (reads plan xy + count only); a real robot moves
    # itself - external_pose keeps the measured pose. A plan adoption
    # resets the follower's monotone progress index (engine.Robot.follow_i
    # docstring) - same reset condition as engine.step, so the episodes
    # stay bit-identical.
    if external_pose:
        robot = state.robot
    else:
        # reset the follower's monotone progress when the ADOPTED ROW
        # changes - the cache-coordinate version of engine.step's
        # content-changed reset (distinct rows hold distinct plans; a
        # graph rebuild parks adoption on the carry row UNLESS the rebuilt
        # live row is bitwise-identical to the carried plan, in which case
        # serving parks at the live row — rows_bitwise_equal, ADVICE r4 —
        # so a row change implies a content change on the rebuild path
        # too). Same-row re-adoption (use_new every unfrozen tick) keeps
        # the index.
        robot_in = dataclasses.replace(
            state.robot,
            follow_i=jnp.where(use_new & (idx_now != state.adopted), 0,
                               state.robot.follow_i).astype(jnp.int32),
        )
        robot = _move_robot(robot_in, mod_pub, plan_path, ctrl.goal_xy,
                            ctrl.goal_yaw, v_dt=v_dt)

    new_state = CachedEngineState(
        robot=robot, mission=mission, control=ctrl, wp=wp,
        adopted=adopted, last_mod=mod_pub, t=state.t + 1,
    )

    # same isfinite hygiene as engine.step: plan/raw counts are per-row
    # constants (engine.py:234-239)
    nonfinite = (
        jnp.sum((~jnp.isfinite(robot.xy)).astype(jnp.int32))
        + cache.nonfinite[adopted]
        + jnp.sum((~jnp.isfinite(ctrl.goal_xy)).astype(jnp.int32))
    )
    metrics = dict(
        xy=robot.xy,
        yaw=robot.yaw,
        mod=mod_pub,
        status=status,
        target_wp=mission.target_wp,
        cluster_idx=cluster_index_from_total(mission.target_wp,
                                             lite.cluster_total),
        waiting=mission.waiting_for_docking,
        completed=mission.exploration_completed,
        plan_len=plan_count,
        nonfinite=nonfinite,
        guards=lite.guards
        | jnp.where(nonfinite > 0, jnp.int32(GUARD_NONFINITE), 0)
        # same conservative truncation flag as engine.step (its comment):
        # identical formula on identical plan content keeps the episodes
        # bit-identical
        | jnp.where(plan_count >= jnp.int32(s.max_plan),
                    jnp.int32(GUARD_PLAN_CAP), 0),
    )
    if external_pose:
        # serving export: hand the already-selected plan to the caller so
        # serve_control_tick doesn't re-run the [R, max_plan, 2] row select
        metrics["plan_xy"] = plan_xy
    return new_state, metrics


def episode_cached(world, params: AosParams, s: Statics, n_steps: int,
                   *, v_dt=jnp.float32(0.12)):
    """engine.episode through the plan cache. Returns (final CachedEngineState,
    stacked per-step metrics) — metrics bit-identical to engine.episode."""
    cache = build_plan_cache(world, params, s)
    lite = world_lite(world)
    st0 = initial_cached_state(world, s)

    def body(st, _):
        return step_cached(st, lite, cache, params, s, v_dt=v_dt)

    return jax.lax.scan(body, st0, None, length=n_steps)
