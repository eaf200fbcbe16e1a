"""Mission planner: boustrophedon waypoint tour + progressive-planning FSM
(C10; reference: aos_path_gen_node.cpp).

The reference spreads this over four ROS callbacks (graph / position /
control-mod / service). Here it is two pure functions:

- build_waypoints(graph)            <- buildClusterWaypointMapping +
                                       buildWaypointSequence (cpp:588-765)
- mission_tick(state, ...)          <- currentPosCallback (cpp:195-278) +
                                       controlModCallback (cpp:280-343)
- plan_current_path(...)            <- planAndPublishPath (cpp:976-1567) +
                                       trimPathNearOccupiedRegions (cpp:1570-1630)

Status codes: 0 Success, 1 Failed, 2 Returning..., 3 Exploration Complete.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import AosParams, Statics
from ..types import GridWorld, GvdGraph, MissionState, Path, Waypoints
from .astar import INF, k_nearest_nodes, plan_between


# ---------------------------------------------------------------------------
# waypoint tour
# ---------------------------------------------------------------------------


def build_waypoints(graph: GvdGraph, params: AosParams, s: Statics) -> Waypoints:
    """Even cluster BR->BL, odd TL->TR; tail TR on the last cluster when the
    max cluster index is even, BL when odd; consecutive waypoints <= 0.2 m
    apart are dropped (cpp:588-702). One extra slot is reserved for the
    origin-return waypoint appended at exploration completion."""
    C = s.max_rows
    N = s.max_nodes
    ln = graph.label_node                      # [C,4] TL,TR,BL,BR
    present = jnp.any(ln >= 0, axis=1)         # cluster participates
    cidx = jnp.arange(C)
    max_c = jnp.max(jnp.where(present, cidx, -1))
    last_odd = (max_c % 2) == 1
    is_last = cidx == max_c
    even = (cidx % 2) == 0

    # slots [C,3]: per cluster, up to 3 waypoint node indices
    n0 = jnp.where(even, ln[:, 3], ln[:, 0])   # BR | TL
    n1 = jnp.where(even, ln[:, 2], ln[:, 1])   # BL | TR
    tail_even = is_last & ~last_odd & even
    tail_odd = is_last & last_odd & ~even
    n2 = jnp.where(tail_even, ln[:, 1], jnp.where(tail_odd, ln[:, 2], -1))
    slots = jnp.stack([n0, n1, n2], axis=1)    # [C,3]
    slot_ok = present[:, None] & (slots >= 0) & (slots < graph.num_nodes)
    flat = slots.reshape(-1)
    ok = slot_ok.reshape(-1)
    pos = graph.nodes[jnp.maximum(flat, 0)]    # [3C,2]

    # sequential consecutive-distance filter (tiny, <= 3C entries)
    T = 3 * C

    def body(i, st):
        keep, last_xy, any_kept = st
        p = pos[i]
        d = jnp.sqrt(jnp.sum((p - last_xy) ** 2))
        k = ok[i] & ((~any_kept) | (d > params.min_waypoint_distance))
        keep = keep.at[i].set(k)
        last_xy = jnp.where(k, p, last_xy)
        return keep, last_xy, any_kept | k

    keep, _, _ = jax.lax.fori_loop(
        0, T, body, (jnp.zeros(T, bool), jnp.full((2,), 1e9, jnp.float32), jnp.bool_(False))
    )

    W = s.max_waypoints
    rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    tgt = jnp.where(keep & (rank < W - 1), rank, W)  # reserve last slot
    xy = jnp.zeros((W + 1, 2), jnp.float32).at[tgt].set(pos, mode="drop")[:W]
    node_idx = jnp.full((W + 1,), -1, jnp.int32).at[tgt].set(flat, mode="drop")[:W]
    count = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), W - 1)
    return Waypoints(xy=xy, node_idx=node_idx, count=count)


def labeled_cluster_total(graph: GvdGraph):
    """Number of clusters with any TL/TR/BL/BR label — the `total` of
    calculateClusterIndex (cpp:1633-1652). A per-world scalar; the plan
    cache precomputes it so ticks need not carry the graph."""
    return jnp.sum(jnp.any(graph.label_node >= 0, axis=1).astype(jnp.int32))


def cluster_index_from_total(target_wp, total):
    """calculateClusterIndex (cpp:1633-1652) given the labeled-cluster
    count: each cluster owns 2 waypoints except the last which owns 3; -1
    when the index is negative or there are no clusters; the reference's
    loop quirk returns 0 (not total-1) when the index is past the tour."""
    in_tail = target_wp < 2 * (total - 1) + 3
    cluster = jnp.where(target_wp < 2 * (total - 1), target_wp // 2, total - 1)
    cluster = jnp.where(in_tail, cluster, 0)
    return jnp.where((target_wp < 0) | (total <= 0), -1, cluster)


def current_cluster_index(target_wp, graph: GvdGraph):
    """Published on /aos/current_cluster_index (cpp:1655-1663)."""
    return cluster_index_from_total(target_wp, labeled_cluster_total(graph))


def _append_origin(wp: Waypoints, params: AosParams) -> Waypoints:
    """Append the (0,0) origin-return waypoint unless the last waypoint is
    already within 0.2 m of it (cpp:299-310)."""
    last = wp.xy[jnp.maximum(wp.count - 1, 0)]
    near = (wp.count > 0) & (jnp.sqrt(jnp.sum(last**2)) <= 0.2)
    W = wp.xy.shape[0]
    slot = jnp.minimum(wp.count, W - 1)
    xy = jnp.where(near, wp.xy, wp.xy.at[slot].set(jnp.zeros(2, jnp.float32)))
    node_idx = jnp.where(near, wp.node_idx, wp.node_idx.at[slot].set(-1))
    count = jnp.where(near, wp.count, jnp.minimum(wp.count + 1, W))
    return Waypoints(xy=xy, node_idx=node_idx, count=count)


# ---------------------------------------------------------------------------
# FSM tick
# ---------------------------------------------------------------------------


def mission_tick(
    state: MissionState,
    wp: Waypoints,
    robot_xy,
    control_mod,
    params: AosParams,
):
    """One mission update: control-mod handling (cpp:280-343) then position
    handling (cpp:195-278). Returns (state, wp, should_replan)."""
    # ---- controlModCallback: mod 3 while docking-frozen -> advance ---------
    advance = (control_mod == 3) & state.waiting_for_docking
    at_last = state.target_wp >= wp.count - 1
    completing = advance & at_last & ~state.exploration_completed
    wp2 = _append_origin(wp, params)
    wp = Waypoints(
        xy=jnp.where(completing, wp2.xy, wp.xy),
        node_idx=jnp.where(completing, wp2.node_idx, wp.node_idx),
        count=jnp.where(completing, wp2.count, wp.count),
    )
    # returning to origin also when already completed and advancing from last
    go_origin = advance & at_last
    new_prev = jnp.where(advance, state.target_wp, state.prev_wp)
    new_target = jnp.where(
        advance,
        jnp.where(go_origin, wp.count - 1, state.target_wp + 1),
        state.target_wp,
    )
    waiting = jnp.where(advance, False, state.waiting_for_docking)
    completed = state.exploration_completed | completing
    status = jnp.where(completing, 2, state.status)  # "Returning..."

    st = MissionState(
        target_wp=new_target,
        prev_wp=new_prev,
        initial_reached=state.initial_reached,
        exploration_completed=completed,
        waiting_for_docking=waiting,
        status=status,
        origin_appended=state.origin_appended | completing,
    )

    # ---- currentPosCallback -------------------------------------------------
    init_wp = jnp.stack([params.initial_waypoint_x, params.initial_waypoint_y])
    d_init = jnp.sqrt(jnp.sum((robot_xy - init_wp) ** 2))
    reach_init = (~st.initial_reached) & (d_init <= params.initial_arrive_dist)
    st = MissionState(
        target_wp=jnp.where(reach_init & (wp.count > 0), 0, st.target_wp),
        prev_wp=jnp.where(reach_init, -1, st.prev_wp),
        initial_reached=st.initial_reached | reach_init,
        exploration_completed=st.exploration_completed,
        waiting_for_docking=st.waiting_for_docking,
        status=st.status,
        origin_appended=st.origin_appended,
    )

    tvalid = (st.target_wp >= 0) & (st.target_wp < wp.count)
    target = wp.xy[jnp.clip(st.target_wp, 0, wp.xy.shape[0] - 1)]
    d_target = jnp.sqrt(jnp.sum((robot_xy - target) ** 2))

    # Exploration Complete at the origin (cpp:230-246)
    at_origin_goal = (
        st.exploration_completed
        & tvalid
        & (jnp.abs(target[0]) < 0.1)
        & (jnp.abs(target[1]) < 0.1)
        & (d_target <= 1.0)
    )
    status = jnp.where(at_origin_goal, 3, st.status)

    # docking freeze (cpp:248-256)
    enter_dock = (
        st.initial_reached & tvalid & (d_target <= params.docking_radius)
        & ~st.waiting_for_docking
    )
    waiting = st.waiting_for_docking | enter_dock

    st = MissionState(
        target_wp=st.target_wp,
        prev_wp=st.prev_wp,
        initial_reached=st.initial_reached,
        exploration_completed=st.exploration_completed,
        waiting_for_docking=waiting,
        status=status,
        origin_appended=st.origin_appended,
    )
    should_replan = ~st.waiting_for_docking | advance
    return st, wp, should_replan


def rebuild_waypoints(
    state: MissionState, old_wp: Waypoints, graph: GvdGraph, params: AosParams, s: Statics
):
    """graphCallback waypoint-sequence rebuild + target restoration by
    POSITION (cpp:456-560, SURVEY hard part #5):

    - the tour is rebuilt from the new graph unless exploration completed
      (cpp:483-485); when completed the old tour is kept and the origin is
      re-appended if it was there (cpp:487-494)
    - the target index is re-found as the closest new waypoint to the saved
      target position when within 0.5 m; else the saved index if still
      valid; else keep progress (never reset to 0 mid-mission).
    Returns (state, wp).
    """
    W = old_wp.xy.shape[0]
    saved_idx = state.target_wp
    saved_valid = (saved_idx >= 0) & (saved_idx < old_wp.count)
    saved_pos = old_wp.xy[jnp.clip(saved_idx, 0, W - 1)]

    new_wp = build_waypoints(graph, params, s)
    new_wp = Waypoints(
        xy=jnp.where(state.exploration_completed, old_wp.xy, new_wp.xy),
        node_idx=jnp.where(state.exploration_completed, old_wp.node_idx, new_wp.node_idx),
        count=jnp.where(state.exploration_completed, old_wp.count, new_wp.count),
    )
    # re-append origin when completed and it had been appended (cpp:487-494)
    wp2 = _append_origin(new_wp, params)
    use_append = state.exploration_completed & state.origin_appended
    wp = Waypoints(
        xy=jnp.where(use_append, wp2.xy, new_wp.xy),
        node_idx=jnp.where(use_append, wp2.node_idx, new_wp.node_idx),
        count=jnp.where(use_append, wp2.count, new_wp.count),
    )

    d = jnp.sqrt(jnp.sum((wp.xy - saved_pos[None, :]) ** 2, axis=1))
    d = jnp.where(jnp.arange(W) < wp.count, d, 3.4e38)
    best = jnp.argmin(d).astype(jnp.int32)
    best_ok = (wp.count > 0) & (d[best] < 0.5)
    idx_ok = (saved_idx >= 0) & (saved_idx < wp.count)
    keep_or_zero = jnp.where(state.target_wp < 0, 0, state.target_wp)
    fallback = jnp.where(
        state.exploration_completed,
        jnp.where(idx_ok, saved_idx, wp.count - 1),
        jnp.where(idx_ok, saved_idx, keep_or_zero),
    )
    new_target = jnp.where(saved_valid & best_ok, best, fallback)
    new_target = jnp.where(wp.count > 0, new_target, state.target_wp)

    st = MissionState(
        target_wp=new_target,
        prev_wp=state.prev_wp,
        initial_reached=state.initial_reached,
        exploration_completed=state.exploration_completed,
        waiting_for_docking=state.waiting_for_docking,
        status=state.status,
        origin_appended=state.origin_appended,
    )
    return st, wp


def force_next_waypoint(state: MissionState, wp: Waypoints, params: AosParams):
    """The /aos/next_waypoint Empty service (cpp:349-416): manual escape
    hatch that clears the docking freeze and force-advances the target
    (appending the origin and completing exploration when at the last
    waypoint). Returns (state, wp, plan_from_current_position: bool)."""
    waiting_cleared = MissionState(
        target_wp=state.target_wp,
        prev_wp=state.prev_wp,
        initial_reached=state.initial_reached,
        exploration_completed=state.exploration_completed,
        waiting_for_docking=jnp.bool_(False),
        status=state.status,
        origin_appended=state.origin_appended,
    )
    st = waiting_cleared
    not_ready = ~st.initial_reached
    at_last = (st.target_wp >= 0) & (st.target_wp >= wp.count - 1)
    mid = (st.target_wp >= 0) & (st.target_wp < wp.count - 1)
    unstarted = (st.target_wp < 0) & (wp.count > 0)

    wp2 = _append_origin(wp, params)
    use_append = ~not_ready & at_last
    wp = Waypoints(
        xy=jnp.where(use_append, wp2.xy, wp.xy),
        node_idx=jnp.where(use_append, wp2.node_idx, wp.node_idx),
        count=jnp.where(use_append, wp2.count, wp.count),
    )
    new_prev = jnp.where(
        ~not_ready & (at_last | mid), st.target_wp,
        jnp.where(~not_ready & unstarted, -1, st.prev_wp),
    )
    new_target = jnp.where(
        not_ready, st.target_wp,
        jnp.where(at_last, wp.count - 1,
                  jnp.where(mid, st.target_wp + 1,
                            jnp.where(unstarted, 0, st.target_wp))),
    )
    completed = st.exploration_completed | (~not_ready & at_last)
    status = jnp.where(~not_ready & at_last, 2, st.status)
    out = MissionState(
        target_wp=new_target,
        prev_wp=new_prev,
        initial_reached=st.initial_reached,
        exploration_completed=completed,
        waiting_for_docking=jnp.bool_(False),
        status=status,
        origin_appended=st.origin_appended | (~not_ready & at_last),
    )
    plan_from_current = ~not_ready & (at_last | mid | unstarted)
    return out, wp, plan_from_current


# ---------------------------------------------------------------------------
# path planning
# ---------------------------------------------------------------------------


def _assemble(
    cand_xy,      # [K,2] candidate points in order
    cand_ok,      # [K]
    s: Statics,
):
    P = s.max_path
    rank = jnp.cumsum(cand_ok.astype(jnp.int32)) - 1
    tgt = jnp.where(cand_ok & (rank < P), rank, P)
    xy = jnp.zeros((P + 1, 2), jnp.float32).at[tgt].set(cand_xy, mode="drop")[:P]
    count = jnp.minimum(jnp.sum(cand_ok.astype(jnp.int32)), P)
    return xy, count


def _yaws(xy, count, last_yaw):
    P = xy.shape[0]
    nxt = jnp.roll(xy, -1, axis=0)
    d = nxt - xy
    yaw = jnp.arctan2(d[:, 1], d[:, 0])
    idx = jnp.arange(P)
    yaw = jnp.where(idx == count - 1, last_yaw, yaw)
    return jnp.where(idx < count, yaw, 0.0)


def _trim_offsets(s: Statics):
    """(dy, dx, dist_m) cell offsets within s.trim_max_distance — the STATIC
    enumeration cap for the sweepable params.trim_safety_distance. The
    distance is the same f64 hypot*res the reference computes per offset
    (cpp:1586-1597), cast to f32 at the comparison site."""
    import math

    res = s.resolution
    rc = int(math.ceil(s.trim_max_distance / res))
    return [
        (dy, dx, math.hypot(dx, dy) * res)
        for dy in range(-rc, rc + 1)
        for dx in range(-rc, rc + 1)
        if math.hypot(dx, dy) * res <= s.trim_max_distance
    ]


_TRIM_FAR = jnp.float32(3.4e38)


def trim_distance_plane(skel: GridWorld, s: Statics):
    """Per-cell min distance (m, f32) to an occupied skeleton cell within
    s.trim_max_distance (+3.4e38 where none), computed ONCE per world. With
    it, _trim is one lookup + compare per path point instead of one per
    (point, disc offset) - the offset gathers were ~7 ms/tick of the
    batched Monte-Carlo step at batch 128 (benchmarks/probe_step_ablation).

    A DISTANCE plane instead of the former binary dilation makes the
    reference's trim_safety_distance ROS parameter (declared 0.2,
    aos_path_gen_node.cpp:1575) a LIVE traced AosParams field — sweepable
    per lane (parallel/sweep.py) without rebuilding the world. At
    trim_safety_distance == trim_max_distance the decisions equal the old
    binary plane's bit-for-bit: the same offsets are enumerated and every
    enumerated f32 distance satisfies <= f32(cap) (membership == compare;
    pinned in tests/test_plan.py). Values above the cap trim as if capped —
    distances beyond it are recorded as +inf by construction.

    Occupied cells exist only inside the live region (zero elsewhere), so
    zero-fill shifts reproduce the per-offset in-grid test."""
    from ..perceive.raster import shift2d

    occ1 = (skel.occ == 1).astype(jnp.uint8)
    out = jnp.full(skel.occ.shape, _TRIM_FAR, jnp.float32)
    for dy, dx, dist in _trim_offsets(s):
        hit = shift2d(occ1, -dy, -dx) == 1
        out = jnp.minimum(out, jnp.where(hit, jnp.float32(dist), _TRIM_FAR))
    return out


def _trim(xy, yaw, count, skel: GridWorld, params: AosParams, s: Statics,
          trim_plane=None):
    """trimPathNearOccupiedRegions (cpp:1570-1630): first index i >= 1 whose
    params.trim_safety_distance disc touches an occupied skeleton cell
    truncates the path to i.

    With a precomputed trim_plane (trim_distance_plane), the disc test is
    one distance lookup + compare at the point's own cell. This deviates
    from the per-offset world arithmetic only when (x - origin)/res sits
    within one f32 ulp of a cell boundary (the reference does this
    arithmetic in f64 anyway - documented deviation PARITY.md #4) or when a
    path point lies OUTSIDE the grid with its disc poking in (paths stay
    inside the map)."""
    offs = _trim_offsets(s)
    resf = jnp.float32(s.resolution)
    trim = params.trim_safety_distance
    H, W = skel.occ.shape

    if trim_plane is not None:
        mx = ((xy[:, 0] - skel.origin_x) / resf).astype(jnp.int32)
        my = ((xy[:, 1] - skel.origin_y) / resf).astype(jnp.int32)
        ing = (mx >= 0) & (mx < skel.w_cells) & (my >= 0) & (my < skel.h_cells)
        flat = jnp.clip(my, 0, H - 1) * W + jnp.clip(mx, 0, W - 1)
        too_close = (trim_plane.reshape(-1)[flat] <= trim) & ing
        idx = jnp.arange(xy.shape[0])
        bad = too_close & (idx >= 1) & (idx < count)
        first_bad = jnp.min(jnp.where(bad, idx, xy.shape[0]))
        return xy, yaw, jnp.minimum(count, first_bad)
    # One [D,P] batch with the SAME per-offset arithmetic as the former
    # Python loop (bit-parity), then a single flat 1D gather (XLA:TPU runs
    # gathers near-scalar; one dispatch of D*P elements beats D dispatches
    # of P, and flat 1D indexing beats 2D — CLAUDE.md profile notes).
    dys = jnp.array([o[0] for o in offs], jnp.float32)[:, None]
    dxs = jnp.array([o[1] for o in offs], jnp.float32)[:, None]
    dst = jnp.array([o[2] for o in offs], jnp.float32)[:, None]
    cx = xy[None, :, 0] + dxs * resf
    cy = xy[None, :, 1] + dys * resf
    mx = ((cx - skel.origin_x) / resf).astype(jnp.int32)
    my = ((cy - skel.origin_y) / resf).astype(jnp.int32)
    ing = (mx >= 0) & (mx < skel.w_cells) & (my >= 0) & (my < skel.h_cells)
    flat = jnp.clip(my, 0, H - 1) * W + jnp.clip(mx, 0, W - 1)
    occ = skel.occ.reshape(-1)[flat.reshape(-1)].reshape(flat.shape) == 1
    too_close = jnp.any(occ & ing & (dst <= trim), axis=0)
    idx = jnp.arange(xy.shape[0])
    bad = too_close & (idx >= 1) & (idx < count)
    first_bad = jnp.min(jnp.where(bad, idx, xy.shape[0]))
    count = jnp.minimum(count, first_bad)
    return xy, yaw, count


def plan_current_path(
    state: MissionState,
    wp: Waypoints,
    graph: GvdGraph,
    costmat,
    skel: GridWorld,
    params: AosParams,
    s: Statics,
    *,
    use_current_position=None,  # robot xy for the next_waypoint service path
    trim_plane=None,            # precomputed trim_distance_plane (optional)
    astar_enabled=None,         # traced bool: skip the graph search entirely
    #                             (build_plan_cache dead rows; see astar)
):
    """planAndPublishPath (cpp:976-1567). Returns (Path, success bool)."""
    P = s.max_path
    N = s.max_nodes
    init_wp = jnp.stack([params.initial_waypoint_x, params.initial_waypoint_y])

    # ---------------- initial straight path (cpp:983-1031) -----------------
    dist0 = jnp.sqrt(jnp.sum(init_wp**2))
    num0 = jnp.ceil(dist0 / params.path_step).astype(jnp.int32)
    i0 = jnp.arange(P, dtype=jnp.float32)
    t0 = i0 / jnp.maximum(num0.astype(jnp.float32), 1.0)
    straight = t0[:, None] * init_wp[None, :]
    straight_ok = jnp.arange(P) <= num0
    straight_xy, straight_count = _assemble(straight, straight_ok, s)
    straight_xy = straight_xy.at[jnp.maximum(straight_count - 1, 0)].set(init_wp)
    yaw0 = jnp.arctan2(init_wp[1], init_wp[0])
    straight_yaw = jnp.where(jnp.arange(P) < straight_count, yaw0, 0.0)

    # ---------------- graph path (cpp:1046-1549) ---------------------------
    tw = jnp.clip(state.target_wp, 0, wp.xy.shape[0] - 1)
    target = wp.xy[tw]
    target_node = wp.node_idx[tw]
    prev_ok = (state.prev_wp >= 0) & (state.prev_wp < wp.count)
    start_point = jnp.where(
        prev_ok, wp.xy[jnp.clip(state.prev_wp, 0, wp.xy.shape[0] - 1)], init_wp
    )
    if use_current_position is not None:
        start_point = use_current_position

    origin_return = target_node < 0
    d_to_nodes = jnp.sqrt(jnp.sum((graph.nodes - target[None, :]) ** 2, axis=1))
    nearest_to_target = jnp.argmin(
        jnp.where(graph.node_valid, d_to_nodes, INF)
    ).astype(jnp.int32)
    goal = jnp.where(origin_return, nearest_to_target, jnp.maximum(target_node, 0))

    node_path, plen, found = plan_between(
        costmat, graph.nodes, graph.node_valid, start_point, goal, params, s,
        enabled=astar_enabled,
    )

    # candidates: [1 start] + [P nodes] + [P tail/target]
    first_node_xy = graph.nodes[jnp.maximum(node_path[0], 0)]
    add_start = jnp.sqrt(jnp.sum((start_point - first_node_xy) ** 2)) > 0.1
    node_xy = graph.nodes[jnp.maximum(node_path, 0)]
    node_ok = (jnp.arange(P) < plen) & (node_path >= 0)
    # drop exact-duplicate consecutive node positions (cpp:1446-1454)
    prev_xy = jnp.concatenate([start_point[None, :], node_xy[:-1]], axis=0)
    prev_ok_arr = jnp.concatenate(
        [jnp.array([True]) & add_start, node_ok[:-1]], axis=0
    )
    dup = node_ok & prev_ok_arr & jnp.all(node_xy == prev_xy, axis=1)
    node_ok = node_ok & ~dup

    last_node_xy = graph.nodes[jnp.maximum(node_path[jnp.maximum(plen - 1, 0)], 0)]
    # tail (origin return, cpp:1227-1250) or single target point (cpp:1488-1504)
    dtail = target - last_node_xy
    tail_dist = jnp.sqrt(jnp.sum(dtail**2))
    tail_num = jnp.ceil(tail_dist / params.path_step).astype(jnp.int32)
    it = jnp.arange(P, dtype=jnp.float32) + 1.0
    tt = it / jnp.maximum(tail_num.astype(jnp.float32), 1.0)
    tail_xy = last_node_xy[None, :] + tt[:, None] * dtail[None, :]
    tail_ok = (jnp.arange(P) < tail_num) & origin_return
    target_point_ok = (~origin_return) & (
        jnp.sqrt(jnp.sum((last_node_xy - target) ** 2)) > 0.01
    )
    tail_xy = jnp.where(
        (jnp.arange(P) == 0)[:, None] & ~origin_return, target[None, :], tail_xy
    )
    tail_ok = tail_ok | ((jnp.arange(P) == 0) & target_point_ok)

    cand_xy = jnp.concatenate([start_point[None, :], node_xy, tail_xy], axis=0)
    cand_ok = jnp.concatenate([add_start[None], node_ok, tail_ok], axis=0) & found
    gxy, gcount = _assemble(cand_xy, cand_ok, s)
    # exact target at the end (both branches force it; cpp:1252-1255,1494-1503)
    gxy = jnp.where(
        (found & (gcount > 0)),
        gxy.at[jnp.maximum(gcount - 1, 0)].set(target),
        gxy,
    )

    # last yaw: face the next waypoint if any (cpp:1517-1534)
    has_next = state.target_wp < wp.count - 1
    nxt_wp = wp.xy[jnp.clip(state.target_wp + 1, 0, wp.xy.shape[0] - 1)]
    last_pt = gxy[jnp.maximum(gcount - 1, 0)]
    prev_pt = gxy[jnp.maximum(gcount - 2, 0)]
    dn = jnp.where(has_next, nxt_wp - last_pt, last_pt - prev_pt)
    last_yaw = jnp.arctan2(dn[1], dn[0])
    gyaw = _yaws(gxy, gcount, last_yaw)

    # ---------------- select branch + trim ---------------------------------
    use_straight = ~state.initial_reached
    have_wp = (wp.count > 0) & (state.target_wp >= 0) & (state.target_wp < wp.count)
    success = jnp.where(use_straight, True, found & have_wp)
    xy = jnp.where(use_straight, straight_xy, gxy)
    yaw = jnp.where(use_straight, straight_yaw, gyaw)
    count = jnp.where(use_straight, straight_count, jnp.where(success, gcount, 0))
    xy, yaw, count = _trim(xy, yaw, count, skel, params, s,
                           trim_plane=trim_plane)
    return Path(xy=xy, yaw=yaw, count=count), success
