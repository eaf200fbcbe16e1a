"""Streaming serving API (aosx/serving.py): the live-feed surface must be
decision-identical to the recorded-replay composition, take MEASURED poses
(external_pose — nothing simulates motion), and checkpoint/resume
mid-survey. Reference semantics: per-map-message world update
(aos_seed_gen_node.cpp:230), per-odometry-message control
(aos_state_machine_node.cpp:83)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from helpers import eq_bits as _eq, frames_growing, pc_frame as _pc

from aosx import incremental, serving
from aosx.config import TEST_STATICS as S, AosParams, params_as_f32
from aosx.io.checkpoint import load_state, save_state
from aosx.types import PointCloud, Polygon

STEPS = 150  # ticks per map frame


@pytest.fixture(scope="module")
def setup():
    bufs, valids, poly = frames_growing([0.55, 0.8, 1.0], S)
    poly_j = Polygon.from_array(poly.astype(np.float32), S)
    params = params_as_f32(AosParams())
    excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)
    frames = PointCloud(xyz=jnp.asarray(bufs), valid=jnp.asarray(valids))

    # the reference run: the recorded-replay composition of the same code
    final, metrics = jax.jit(
        lambda fr: incremental.replay_episode_incremental_cached(
            fr, poly_j, params, excl, S, steps_per_frame=STEPS,
            ror_method="exact"),
    )(frames)

    # one jit instance per entry point, shared by every _drive call (a
    # fresh lambda per call would retrace these multi-minute compiles).
    # host_jit, not jax.jit: repeat host-loop dispatch of const-carrying
    # executables is broken in jax 0.9.0 (serving.host_jit docstring)
    jits = dict(
        init=serving.host_jit(lambda pc: serving.serve_init(
            pc, poly_j, params, excl, S)),
        frame=serving.host_jit(lambda sv, pc: serving.serve_map_frame(
            sv, pc, poly_j, params, excl, S)),
        tick=serving.host_jit(lambda sv, xy, yaw: serving.serve_control_tick(
            sv, xy, yaw, params, S)),
    )
    return bufs, valids, jits, final, metrics


def _pose_before(metrics, f, t, F, T):
    """The pose each replay tick ACTED on: the previous tick's output pose
    (step order: control tick reads state.robot, then motion updates it),
    or the engine's initial pose for the very first tick."""
    xs = np.asarray(metrics["xy"]).reshape(F * T, 2)
    ys = np.asarray(metrics["yaw"]).reshape(F * T)
    i = f * T + t
    if i == 0:
        return np.float32([0.0, 0.0]), np.float32(0.0)
    return xs[i - 1], ys[i - 1]


def _drive(bufs, valids, jits, metrics, frames_idx, sv=None, collect_from=0):
    """Host-side serving drive over the given frames, feeding the replay's
    recorded poses. Returns (final ServeState, cmds dict of stacked arrays
    collected from frame index collect_from on)."""
    F, T = np.asarray(metrics["mod"]).shape

    frame_j, tick_j = jits["frame"], jits["tick"]
    if sv is None:
        sv = jits["init"](_pc(bufs, valids, 0))

    cmds = []
    for f in frames_idx:
        sv, level = frame_j(sv, _pc(bufs, valids, f))
        assert int(level) == int(np.asarray(metrics["inc_level"])[f]), f
        for t in range(T):
            xy, yaw = _pose_before(metrics, f, t, F, T)
            sv, cmd = tick_j(sv, xy, yaw)
            if f >= collect_from:
                cmds.append(cmd)
    stacked = {k: np.stack([np.asarray(c[k]) for c in cmds])
               for k in cmds[0]}
    return sv, stacked


def test_serving_decision_parity_with_replay(setup):
    """Feeding the streaming API the replay's own pose sequence must
    reproduce every published decision bit-for-bit: control mode, goal
    pose, plan adoption/length, mission status/progress, hygiene
    counters."""
    bufs, valids, jits, final, metrics = setup
    F, T = np.asarray(metrics["mod"]).shape

    sv, cmds = _drive(bufs, valids, jits, metrics, frames_idx=range(F))

    for k in ("mod", "status", "target_wp", "cluster_idx", "waiting",
              "completed", "plan_len", "nonfinite", "guards"):
        ref = np.asarray(metrics[k]).reshape((F * T,) + cmds[k].shape[1:])
        assert _eq(cmds[k], ref), f"cmd {k!r} diverged"
    # cmd echoes the MEASURED pose it acted on; the replay's metrics record
    # the post-move pose (the NEXT tick's input), so the echo is the metric
    # sequence shifted by one with the initial pose prepended
    ref_xy = np.asarray(metrics["xy"]).reshape(-1, 2)
    ref_yaw = np.asarray(metrics["yaw"]).reshape(-1)
    fed_xy = np.vstack([np.zeros((1, 2), np.float32), ref_xy[:-1]])
    fed_yaw = np.concatenate([np.zeros(1, np.float32), ref_yaw[:-1]])
    assert _eq(cmds["xy"], fed_xy)
    assert _eq(cmds["yaw"], fed_yaw)

    # final mission/control state matches the replay's
    for fld in ("target_wp", "prev_wp", "initial_reached",
                "origin_appended", "exploration_completed",
                "waiting_for_docking", "status"):
        assert np.array_equal(
            np.asarray(getattr(final.mission, fld)),
            np.asarray(getattr(sv.st.mission, fld))), fld
    assert int(final.adopted) == int(sv.st.adopted)
    # the published /plan content matches the adopted cache row
    assert _eq(cmds["plan_xy"][-1],
               np.asarray(sv.cache.plan_xy)[int(sv.st.adopted)])
    assert _eq(cmds["plan_yaw"][-1],
               np.asarray(sv.cache.plan_yaw)[int(sv.st.adopted)])


def test_serving_checkpoint_resume(setup, tmp_path):
    """A live survey checkpointed after frame 1 and resumed from disk must
    continue exactly like the uninterrupted one (ServeState is a pytree;
    io.checkpoint round-trips it)."""
    bufs, valids, jits, _, metrics = setup
    F, _ = np.asarray(metrics["mod"]).shape
    assert F >= 3

    sv_mid, _ = _drive(bufs, valids, jits, metrics, frames_idx=range(2))
    path = str(tmp_path / "survey.ckpt")
    save_state(path, sv_mid)
    sv_loaded = load_state(path, like=sv_mid)
    for a, b in zip(jax.tree_util.tree_leaves(sv_mid),
                    jax.tree_util.tree_leaves(sv_loaded)):
        assert np.array_equal(np.asarray(a), np.asarray(b), equal_nan=True)

    _, cmds_cont = _drive(bufs, valids, jits, metrics,
                          frames_idx=[2], sv=sv_mid, collect_from=2)
    _, cmds_res = _drive(bufs, valids, jits, metrics,
                         frames_idx=[2], sv=sv_loaded, collect_from=2)
    assert set(cmds_cont) == set(cmds_res)
    for k in cmds_cont:
        assert _eq(cmds_cont[k], cmds_res[k]), k


def test_host_jit_mechanisms_force_python_dispatch():
    """Both host_jit routes must veto jax 0.9.0's C++ fast path (the
    const-dropping dispatch bug, serving.host_jit docstring) by carrying a
    top-level effect. The callback route is what CPU uses; the ref route is
    what the axon backend uses (its PJRT rejects ALL host callbacks:
    "UNIMPLEMENTED: axon_pjrt does not support host send/recv callbacks" —
    this killed the round-3 sustained/sweep TPU queue before the fix).
    On-chip verification of the ref route: 3 repeat calls, sentinel==3,
    2026-08-19."""
    from jax._src.state.types import RefEffect

    from aosx.serving import _host_jit_callback, _host_jit_ref

    def body(x):
        return x * 2 + 1

    x = jnp.ones((4,), jnp.float32)

    # ref route: RefEffect on the top-level jaxpr (what _get_fastpath_data
    # checks), repeat calls correct. Works single-device on any backend.
    g = _host_jit_ref(body)
    for _ in range(3):
        assert np.array_equal(np.asarray(g(x)), np.full(4, 3.0, np.float32))
    inner = g.__wrapped__  # the wrapped closure host_jit jitted
    eff = jax.make_jaxpr(inner)(x).effects
    assert any(isinstance(e, RefEffect) for e in eff), eff

    # callback route: unordered effects present, repeat calls correct
    f = _host_jit_callback(body)
    for _ in range(3):
        assert np.array_equal(np.asarray(f(x)), np.full(4, 3.0, np.float32))
    eff = jax.make_jaxpr(f.__wrapped__)(x).effects
    assert len(eff) > 0, eff

    # the selector: this suite runs with the axon plugin unloadable, so
    # host_jit must pick the callback route (identical wrapped behavior)
    h = serving.host_jit(body)
    assert np.array_equal(np.asarray(h(x)), np.full(4, 3.0, np.float32))


def test_serving_donated_entry_points(setup):
    """host_jit_donated on the production entry points (VERDICT r3 #6 /
    PROBE_DONATE.json): donating the ServeState carry must leave every
    published cmd and the final state bit-identical to the plain host_jit
    drive — the caller contract (re-thread the carry from every return,
    never touch the donated input again) is exactly what _drive does. On
    CPU donation is a no-op hint; the TPU path reuses the input buffers
    (the dashboard --serve loop is the production call site)."""
    bufs, valids, jits, _, metrics = setup
    _, _, poly = frames_growing([0.55, 0.8, 1.0], S)
    poly_j = Polygon.from_array(poly.astype(np.float32), S)
    params = params_as_f32(AosParams())
    excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)
    djits = dict(
        init=jits["init"],
        frame=serving.host_jit_donated(
            lambda sv, pc: serving.serve_map_frame(
                sv, pc, poly_j, params, excl, S),
            donate_argnums=(0,)),
        tick=serving.host_jit_donated(
            lambda sv, xy, yaw: serving.serve_control_tick(
                sv, xy, yaw, params, S),
            donate_argnums=(0,)),
    )
    sv_d, cmds_d = _drive(bufs, valids, djits, metrics, frames_idx=range(2))
    sv_p, cmds_p = _drive(bufs, valids, jits, metrics, frames_idx=range(2))
    assert set(cmds_d) == set(cmds_p)
    for k in cmds_p:
        assert _eq(cmds_d[k], cmds_p[k]), k
    for a, b in zip(jax.tree_util.tree_leaves(sv_d),
                    jax.tree_util.tree_leaves(sv_p)):
        assert np.array_equal(np.asarray(a), np.asarray(b), equal_nan=True)
