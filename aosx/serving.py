"""Production streaming API: drive the engine from a LIVE feed.

The replay entry points (engine.replay_episode,
incremental.replay_episode_incremental[_cached]) consume a pre-stacked
[F, ...] frame array — right for benchmarks and recorded-map replays, but a
real deployment receives map snapshots ONE AT A TIME from a running SLAM
stack (the reference's /lio_sam/mapping/global_map subscription,
aos_seed_gen_node.cpp:230) and odometry at 10-50 Hz from a REAL robot
(/odom_baselink + /Local/utm; aos_state_machine_node.cpp:83,
aos_path_gen_node.cpp:195). This module is that surface:

    sv = serve_init(pc0, poly, params, exclusions, s)
    sv, level = serve_map_frame(sv, pc_f, poly, params, exclusions, s)
    sv, cmd   = serve_control_tick(sv, robot_xy, robot_yaw, params, s)

(Wrap each entry point with serving.host_jit — NOT plain jax.jit — for the
host loop; host_jit's docstring explains the jax 0.9.0 repeat-dispatch bug
it works around.)

- serve_map_frame runs the exact incremental world gates (aosx.incremental)
  and rebuilds the plan cache only when the graph actually changed,
  preserving the currently published plan across the rebuild (carry row).
  Steady-state cost is the level-0 gate (~1.3 ms device, FLOOR.md §2).
- serve_control_tick takes the MEASURED pose — nothing simulates motion —
  and returns everything the reference published per odometry message:
  /Control/mod, /Planning/goal_point [x, y, yaw], the current /plan
  (points + per-point yaw + count), and the planner status topics. Its
  decisions are bit-identical to the closed-loop engine fed the same pose
  sequence (tests/test_serving.py).

ServeState is a pytree, so io.checkpoint.save_state/load_state give
crash-resume of a live survey mid-mission (also pinned by
tests/test_serving.py).

replay_episode_incremental_cached is the lax.scan composition of
serve_map_frame + step_cached over a recorded sequence — same code path,
so the replay parity tests (tests/test_incremental.py) pin the serving
loop's semantics end-to-end.

Single-instance only (inherits perceive_update's lax.cond structure — do
NOT vmap; CLAUDE.md's vmapped-cond rule). Per-call tunnel overhead on the
axon backend is ~30 ms, comfortably inside a 10 Hz map cadence.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .config import AosParams, Statics
from .incremental import LEVEL_DOWNSTREAM, perceive_init, perceive_update
from .plan import plancache
from .plan.mission import rebuild_waypoints
from .types import PointCloud, Polygon


def _dc(cls):
    return jax.tree_util.register_dataclass(dataclasses.dataclass(frozen=True)(cls))


def _noop():
    pass


def host_jit(fn):
    """jax.jit for HOST-LOOP calls of the serving entry points.

    jax 0.9.0's C++ jit fast path is broken for executables that retain
    runtime jaxpr constants (top-level lax.cond branches closing over
    non-scalar concrete arrays — perceive_update's gate structure): the
    compiled program expects args+consts buffers (e.g. 128) but the cached
    dispatch path supplies only the user args (68) — "Execution supplied 68
    buffers but compiled program expected 128". The first call per
    signature (Python dispatch, which holds the consts) always works;
    every subsequent call fails. The pjit source marks the C++ const-args
    path as unfinished ("TODO(necula): remove num_const_args when fixing
    the C++ path", pjit.py:1248).

    Workaround: a no-op host callback adds an (unordered) effect, and
    _get_fastpath_data refuses to build fast-path data for effectful
    executables — so every call takes the correct Python path. Costs ~a
    host round-trip per call; irrelevant at map-frame/odometry cadence.
    Unordered, because ordered effects reject multi-device programs
    ("ordered effects are not supported for more than 1 device") and the
    serving entry points accept a stencil_mesh. Inside lax.scan (the
    replay composition) the bug cannot occur — use plain jax.jit there.

    The axon TPU backend rejects ALL host-callback programs outright
    ("UNIMPLEMENTED: axon_pjrt does not support host send/recv callbacks"
    at first dispatch — killed the round-3 sustained/sweep TPU queue), so
    when the computation targets that platform the same fast-path veto is
    produced with a REF-STATE effect instead: an increment of a closed-over
    jax.new_ref sentinel puts Write/ReadEffect on the top-level jaxpr, and
    _get_fastpath_data equally refuses on `any(isinstance(e, RefEffect))`
    (verified: 3 repeat calls, sentinel==3, no buffer-count failure). The
    ref route is NOT used on CPU because the sentinel commits to one
    device, which conflicts with multi-device (stencil_mesh) programs;
    creating the ref INSIDE the jit doesn't work either — it is discharged
    and the top level carries no effect (measured: fast path stays on)."""
    # the axon device reports platform='tpu'; only client.platform_version
    # ("PJRT C API\naxon 0.1.0; ...") identifies the callback-less plugin
    dev = jax.config.jax_default_device or jax.devices()[0]
    pv = getattr(getattr(dev, "client", None), "platform_version", "") or ""
    return _host_jit_ref(fn) if "axon" in pv else _host_jit_callback(fn)


def host_jit_donated(fn, donate_argnums):
    """host_jit + jit(donate_argnums=...): input→output buffer aliasing for
    host-loop carries (the serving ServeState / IncrementalState), on top of
    the same fast-path veto. Donation indices refer to fn's own positional
    args (the veto wrapper adds no leading args). The caller must thread the
    returned carry — the donated input buffer is consumed."""
    dev = jax.config.jax_default_device or jax.devices()[0]
    pv = getattr(getattr(dev, "client", None), "platform_version", "") or ""
    mk = _host_jit_ref if "axon" in pv else _host_jit_callback
    return mk(fn, donate_argnums=donate_argnums)


def _host_jit_ref(fn, donate_argnums=()):
    """Fast-path veto via a ref-state effect (axon route; host_jit docstring).
    Single-device only: the sentinel commits to the default device."""
    sent = jax.new_ref(jnp.zeros((), jnp.int32))

    def wrapped(*args, **kwargs):
        sent[...] = sent[...] + 1
        return fn(*args, **kwargs)

    return jax.jit(wrapped, donate_argnums=donate_argnums)


def _host_jit_callback(fn, donate_argnums=()):
    """Fast-path veto via a no-op host callback (host_jit docstring)."""

    def wrapped(*args, **kwargs):
        jax.debug.callback(_noop)
        return fn(*args, **kwargs)

    return jax.jit(wrapped, donate_argnums=donate_argnums)


def _canon(tree):
    """Normalize weak_type on every leaf (x.astype(x.dtype) requests an
    explicit dtype, which drops weakness; a no-op copy XLA elides).

    The streaming carry must present a STABLE jit signature across calls:
    step_cached's status chain (jnp.where over int literals) yields a WEAK
    int32, so without this the second call retraces, and jax's retrace path
    (closure constants lifted to runtime parameters) then fails dispatch
    with "Execution supplied 96 buffers but compiled program expected 164".
    lax.scan canonicalizes its carry internally, which is why the replay
    composition of the same code never exposes the flip."""
    return jax.tree_util.tree_map(lambda x: x.astype(x.dtype), tree)


@_dc
class ServeState:
    """Everything a live survey carries between messages (a pytree —
    checkpoint/resume via io.checkpoint)."""

    inc: Any    # IncrementalState (world + incremental intermediates)
    cache: Any  # PlanCache with carry row
    st: Any     # plancache.CachedEngineState (mission/control/robot/adopted)
    lite: Any   # plancache.WorldLite — derived from inc.world, cached here
    # so the per-tick executable neither re-reduces the graph's label table
    # per odometry message nor needs the graph at all; refreshed wherever
    # the world can change (serve_init / serve_map_frame)


def serve_init(pc: PointCloud, poly: Polygon, params: AosParams, exclusions,
               s: Statics, *, ror_method: str = "exact",
               stencil_mesh=None, stencil_axis: str = "space") -> ServeState:
    """First map snapshot: full from-scratch world + plan cache.
    stencil_mesh: optional Mesh - row-shard the grid stencils + JFA of the
    world updates across chips (bit-identical; incremental.perceive_init)."""
    inc0 = perceive_init(pc, poly, params, exclusions, s,
                         ror_method=ror_method, stencil_mesh=stencil_mesh,
                         stencil_axis=stencil_axis)
    cache0 = plancache.add_carry_row(
        plancache.build_plan_cache(inc0.world, params, s), s)
    return _canon(ServeState(inc=inc0, cache=cache0,
                             st=plancache.initial_cached_state(inc0.world, s),
                             lite=plancache.world_lite(inc0.world)))


def serve_map_frame(sv: ServeState, pc_f: PointCloud, poly: Polygon,
                    params: AosParams, exclusions, s: Statics, *,
                    ror_method: str = "exact",
                    stencil_mesh=None, stencil_axis: str = "space"):
    """One SLAM map message. Returns (state, level i32) — level is the
    incremental reuse level taken (incremental.LEVEL_*).

    Mirrors the reference's graphCallback sequence on a graph change
    (aos_path_gen_node.cpp:418-579): waypoint tour rebuild + target
    restoration by position, keep-last-path until the next replan. The plan
    cache is rebuilt only at level >= 2 (the graph provably changed),
    carrying the adopted row and pinning the restored live config's row
    (plancache.pin_live_row)."""
    inc, level = perceive_update(sv.inc, pc_f, poly, params, exclusions, s,
                                 ror_method=ror_method,
                                 stencil_mesh=stencil_mesh,
                                 stencil_axis=stencil_axis)
    mission, wp = rebuild_waypoints(sv.st.mission, sv.st.wp, inc.world.graph,
                                    params, s)

    def rebuild(args):
        old_cache, _ = args
        fresh = plancache.add_carry_row(
            plancache.build_plan_cache(inc.world, params, s, wp_base=wp), s)
        fresh = plancache.carry_adopted_row(fresh, old_cache, sv.st.adopted)
        fresh = plancache.pin_live_row(fresh, inc.world, mission, wp,
                                       params, s)
        # ADVICE r4: engine.step resets the follower's monotone index only
        # when the adopted plan CONTENT changes bitwise (engine.py:264-288).
        # Parking adoption at the carry row when the rebuilt live row holds
        # the bitwise-identical plan would make the next re-adoption look
        # like a row change and spuriously reset follow_i — re-opening the
        # self-crossing-capture corner on dynamic-map rebuilds. Park at the
        # live row instead: the published bits are identical either way,
        # and re-adoption is then a row no-op exactly when engine.step's
        # content compare is a no-op. One [max_plan]-sized compare per
        # REBUILD (amortized; never on the per-tick path).
        carry_idx = jnp.int32(plancache.num_rows(s))
        live_idx = plancache.cache_row_index(mission, s)
        same = plancache.rows_bitwise_equal(fresh, carry_idx, live_idx)
        return fresh, jnp.where(same, live_idx, carry_idx).astype(jnp.int32)

    def keep(args):
        return args

    cache, adopted = jax.lax.cond(
        level >= LEVEL_DOWNSTREAM, rebuild, keep, (sv.cache, sv.st.adopted))
    st = plancache.CachedEngineState(
        robot=sv.st.robot, mission=mission, control=sv.st.control, wp=wp,
        adopted=adopted, last_mod=sv.st.last_mod, t=sv.st.t,
    )
    return _canon(ServeState(inc=inc, cache=cache, st=st,
                             lite=plancache.world_lite(inc.world))), level


def serve_control_tick(sv: ServeState, robot_xy, robot_yaw,
                       params: AosParams, s: Statics):
    """One odometry message with the MEASURED pose. Returns (state, cmd).

    cmd carries the reference's per-tick publications:
      mod        /Control/mod (0 follow / 1 precise / 2 semi / 3 stop)
      goal_xy, goal_yaw   /Planning/goal_point
      plan_xy, plan_yaw, plan_len   the current /plan
      status, target_wp, cluster_idx, waiting, completed   planner status
      nonfinite, guards   hygiene counters (engine.step parity)
    plus xy/yaw echoing the pose it acted on. Decision parity with the
    closed-loop engine fed the same poses: tests/test_serving.py."""
    from .engine import Robot
    from .geom import wrap_angle

    lite = sv.lite  # cached at world changes; the graph stays out of ticks
    # Wrap the measured yaw to [-pi, pi] (bitwise no-op when already in
    # range): the reference's yaw arrives via tf2 quaternion conversion and
    # cannot be multi-wrap, but a caller integrating heading could feed one
    # here - and control's single-wrap normalized_angle (cpp:196-204) then
    # deadlocks the docking stop (see engine._move_robot and EXHAUSTED.json).
    st = dataclasses.replace(
        sv.st,
        robot=Robot(xy=jnp.asarray(robot_xy, jnp.float32),
                    yaw=wrap_angle(jnp.asarray(robot_yaw, jnp.float32))),
    )
    st, metrics = plancache.step_cached(st, lite, sv.cache, params, s,
                                        external_pose=True)
    cmd = dict(
        metrics,  # includes plan_xy (selected once inside step_cached)
        goal_xy=st.control.goal_xy,
        goal_yaw=st.control.goal_yaw,
        plan_yaw=plancache.select_row(sv.cache.plan_yaw, st.adopted),
        # which cache row is published: callers simulating a follower reset
        # their monotone progress index when this changes (engine.Robot
        # .follow_i docstring; dashboard._serve_loop)
        adopted=st.adopted,
    )
    return _canon(ServeState(inc=sv.inc, cache=sv.cache, st=st,
                             lite=sv.lite)), cmd
