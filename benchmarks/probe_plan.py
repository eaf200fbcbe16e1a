"""Decompose the plan+control stage (engine.step minus perceive/graph) on
the bench instance. Floor calibration: a trivial jit measures the tunnel
overhead; subtract it, not a fixed 28."""
import os, sys, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
from aosx import engine
from aosx.config import BENCH_STATICS as S, AosParams, params_as_f32
from aosx.gvd import build_gvd_graph
from aosx.orchards import OrchardSpec, make_orchard
from aosx.perceive import perceive
from aosx.plan.astar import cost_matrix
from aosx.plan.mission import build_waypoints, plan_current_path, mission_tick
from aosx.plan.linearize import linearize
from aosx.plan.control import control_tick, on_path

spec = OrchardSpec(n_rows=20, row_len=180.0, row_spacing=9.0, tree_spacing=1.0,
                   trunk_pts=24, noise_pts=512, origin=(8.0, 8.0), jitter=0.15,
                   polygon_pad=2.0)
pc, poly = make_orchard(jax.random.PRNGKey(0), spec, S)
params = params_as_f32(AosParams())
excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)
out = jax.jit(lambda pc, poly, pr, ex: perceive(pc, poly, pr, ex, S, ror_method='sorted'))(pc, poly, params, excl)
g = jax.jit(lambda se, rs, sk, pr: build_gvd_graph(se, rs, sk, pr, S))(
    out.seeds, out.rows_sorted, out.skeleton, params)
cm = jax.jit(lambda g: cost_matrix(g, S))(g)
wp = jax.jit(lambda g, pr: build_waypoints(g, pr, S))(g, params)
world = engine.World(skeleton=out.skeleton, occupancy=out.occupancy,
                     graph=g, costmat=cm, waypoints=wp)
st0 = engine.initial_state(world, S)


def med_ms(f, *args, reps=7):
    g_ = jax.jit(f)
    o = g_(*args)
    float(np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = g_(*args)
        float(np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0])
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


FLOOR = med_ms(lambda x: x.sum() * 2.0, jnp.ones((8, 128)))
print(f"{'tunnel floor':26s} {FLOOR:8.2f} ms", flush=True)


def stage(name, f, *args):
    ms = med_ms(f, *args)
    print(f"{name:26s} {ms:8.2f} ms (device ~{max(ms - FLOOR, 0):.1f})", flush=True)


def probe(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return jnp.sum(leaf.astype(jnp.float32).ravel()[:65536])


st1, _ = jax.jit(lambda st, w, pr: engine.step(st, w, pr, S))(st0, world, params)

stage("engine.step (whole)", lambda st, w, pr: probe(engine.step(st, w, pr, S)[1]["plan_len"]),
      st0, world, params)


def ctl_only(st, w, pr):
    ctrl = on_path(st.control, st.plan)
    ctrl, fired, mod, goal_xy, goal_yaw = control_tick(ctrl, st.robot.xy, st.robot.yaw, pr)
    return probe(goal_xy) + mod.astype(jnp.float32)


stage("control_tick", ctl_only, st0, world, params)


def plan_only(st, w, pr):
    mission, wp, should_replan = None, None, None
    from aosx.plan.mission import mission_tick
    mission, wp, should_replan = mission_tick(st.mission, st.wp, st.robot.xy,
                                              jnp.int32(0), pr)
    raw, success = plan_current_path(mission, wp, w.graph, w.costmat,
                                     w.skeleton, pr, S)
    return probe(raw.xy)


stage("mission+plan_current_path", plan_only, st0, world, params)


def lin_only(st, w, pr):
    mission, wp, should_replan = mission_tick(st.mission, st.wp, st.robot.xy,
                                              jnp.int32(0), pr)
    raw, success = plan_current_path(mission, wp, w.graph, w.costmat,
                                     w.skeleton, pr, S)
    return probe(linearize(raw, pr, S).xy)


stage("plan+linearize", lin_only, st0, world, params)
