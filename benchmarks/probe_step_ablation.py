"""Ablate engine.step components (monkey-patched before tracing) and time a
10-step scan with ALL state consumed - the only DCE-proof attribution."""
import dataclasses
import os, sys, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
from aosx import engine
from aosx.config import TEST_STATICS, AosParams, params_as_f32
from aosx.orchards import OrchardSpec
from aosx.parallel.batch import rollout_begin
from aosx.types import Path

S = dataclasses.replace(TEST_STATICS, jfa_dynamic_shifts=False,
                        exact_fallbacks=False, max_plan=1024)
spec = OrchardSpec(n_rows=4, row_len=12.0, row_spacing=3.5, tree_spacing=1.0,
                   trunk_pts=16, noise_pts=64, origin=(4.0, 3.0), polygon_pad=1.5)
B = int(os.environ.get("PROBE_B", "128"))
params = params_as_f32(AosParams())
keys = jax.random.split(jax.random.PRNGKey(0), B)
world, st0, _ = jax.jit(jax.vmap(
    lambda k: rollout_begin(k, spec, params, S, 1200)))(keys)
adv = jax.jit(jax.vmap(lambda st, w: engine.step(st, w, params, S)[0],
                       in_axes=(0, 0)))
st = st0
for _ in range(30):
    st = adv(st, world)
st = jax.block_until_ready(st)
# a second state deep in the mission (A*-planning regime)
st_late = st
for _ in range(170):
    st_late = adv(st_late, world)
st_late = jax.block_until_ready(st_late)


def probe_all(x):
    return sum(jnp.sum(l.astype(jnp.float32).ravel()[:4096])
               for l in jax.tree_util.tree_leaves(x))


def med_s(f, reps=5):
    o = f()
    np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[:1]
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = f()
        np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def scan10(state):
    f = jax.jit(jax.vmap(
        lambda st, w: jax.lax.scan(
            lambda s_, _: (engine.step(s_, w, params, S)[0], 0.0), st, None,
            length=10)[0],
        in_axes=(0, 0)))
    return med_s(lambda: probe_all(f(state, world)))


FLOOR = med_s(lambda: (jnp.ones((8, 128)) * 2).sum())
print(f"floor {FLOOR*1e3:.1f} ms", flush=True)

orig_lin = engine.linearize
orig_plan = engine.plan_current_path
orig_move = engine._move_robot


def null_lin(path, pr, s):
    return Path(xy=jnp.zeros((s.max_plan, 2), jnp.float32),
                yaw=jnp.zeros((s.max_plan,), jnp.float32),
                count=jnp.minimum(path.count, s.max_plan))


def null_plan(mission, wp, graph, costmat, skel, pr, s, **kw):
    return Path(xy=jnp.zeros((s.max_path, 2), jnp.float32),
                yaw=jnp.zeros((s.max_path,), jnp.float32),
                count=jnp.int32(2)), jnp.bool_(True)


def null_move(robot, mod, plan, goal_xy, goal_yaw, params, s, v_dt):
    return robot


for name, patches in (
    ("full", {}),
    ("no linearize", {"linearize": null_lin}),
    ("no plan_current_path", {"plan_current_path": null_plan}),
    ("no both", {"linearize": null_lin, "plan_current_path": null_plan}),
):
    for k, v in patches.items():
        setattr(engine, k, v)
    try:
        for tag, state in (("t30", st), ("t200", st_late)):
            s_ = scan10(state)
            print(f"{name:22s} {tag:5s} {(s_ - FLOOR) * 1e3 / 10:8.2f} ms/step",
                  flush=True)
    finally:
        engine.linearize = orig_lin
        engine.plan_current_path = orig_plan
        engine._move_robot = orig_move
