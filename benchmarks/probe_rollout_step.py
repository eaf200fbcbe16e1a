"""Decompose the BATCHED engine.step cost at MC-rollout scale (batch x
TEST_STATICS): which part of the 1200-step sequential loop dominates
rollout throughput."""
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
from aosx.plan.mission import mission_tick, plan_current_path
from aosx.plan.linearize import linearize
from aosx.plan.control import control_tick, on_path

S = dataclasses.replace(TEST_STATICS, jfa_dynamic_shifts=False)
spec = OrchardSpec(n_rows=4, row_len=12.0, row_spacing=3.5, tree_spacing=1.0,
                   trunk_pts=16, noise_pts=64, origin=(4.0, 3.0), polygon_pad=1.5)
B = int(os.environ.get("PROBE_B", "64"))
params = params_as_f32(AosParams())
keys = jax.random.split(jax.random.PRNGKey(0), B)
world, st0, acc = jax.jit(jax.vmap(
    lambda k: rollout_begin(k, spec, params, S, 1200)))(keys)
# advance 30 ticks so the state is mid-mission (plan paths exist)
st = st0
adv = jax.jit(jax.vmap(lambda st, w: engine.step(st, w, params, S)[0],
                       in_axes=(0, 0)))
for _ in range(30):
    st = adv(st, world)
st = jax.block_until_ready(st)


def med_ms(f, *args, reps=30):
    g = jax.jit(f)
    o = g(*args)
    np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[:1]
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = g(*args)
        np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[:1]
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


FLOOR = med_ms(lambda x: x.sum() * 2.0, jnp.ones((8, 128)))
print(f"{'tunnel floor':28s} {FLOOR:8.2f} ms", flush=True)


def stage(name, f):
    ms = med_ms(f)
    print(f"{name:28s} {ms:8.2f} ms (device ~{max(ms - FLOOR, 0):.1f})", flush=True)


def probe(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return jnp.sum(leaf.astype(jnp.float32).ravel()[:4096])


stage(f"step (whole, B={B})", lambda: probe(jax.vmap(
    lambda st, w: engine.step(st, w, params, S)[1]["plan_len"],
    in_axes=(0, 0))(st, world)))

# scan of 10 steps: amortized per-step cost without per-call overhead
stage("scan x10 steps", lambda: probe(jax.vmap(
    lambda st, w: jax.lax.scan(
        lambda s_, _: (engine.step(s_, w, params, S)[0], 0.0), st, None,
        length=10)[1],
    in_axes=(0, 0))(st, world)))


def vm(f):
    return jax.vmap(f, in_axes=(0, 0))


stage("control_tick only", lambda: probe(vm(
    lambda st, w: control_tick(on_path(st.control, st.plan), st.robot.xy,
                               st.robot.yaw, params)[3])(st, world)))

stage("mission+plan_current_path", lambda: probe(vm(
    lambda st, w: plan_current_path(
        mission_tick(st.mission, st.wp, st.robot.xy, jnp.int32(0), params)[0],
        mission_tick(st.mission, st.wp, st.robot.xy, jnp.int32(0), params)[1],
        w.graph, w.costmat, w.skeleton, params, S)[0].xy)(st, world)))

stage("linearize only", lambda: probe(vm(
    lambda st, w: linearize(st.raw_path, params, S).xy)(st, world)))

# inside linearize
from aosx.plan.linearize import _find_breakpoints, _fit_tables, _backtrack_keep

P = S.max_path
stage("lin: find_breakpoints", lambda: probe(vm(
    lambda st, w: _find_breakpoints(st.raw_path.xy, st.raw_path.count,
                                    jnp.int32(4), params, P))(st, world)))

Q = S.max_plan
NSEG = S.max_segments + 6
rngl = np.random.default_rng(0)
oxy_t = jnp.asarray(rngl.random((B, Q, 2)), jnp.float32)
oseg_t = jnp.asarray(np.sort(rngl.integers(0, NSEG, (B, Q)), axis=1), jnp.int32)
ocnt_t = jnp.full((B,), 300, jnp.int32)
stage("lin: backtrack_keep", lambda: probe(jax.vmap(
    lambda o, sg, c: _backtrack_keep(o, sg, c, NSEG))(oxy_t, oseg_t, ocnt_t)))

# consume EVERYTHING (earlier step probes only read plan_len, so XLA DCE'd
# the state-update path and undercounted)
def probe_all(x):
    return sum(jnp.sum(l.astype(jnp.float32).ravel()[:4096])
               for l in jax.tree_util.tree_leaves(x))


stage(f"step full-consume (B={B})", lambda: probe_all(jax.vmap(
    lambda st, w: engine.step(st, w, params, S)[0], in_axes=(0, 0))(st, world)))

stage(f"scan10 full-consume (B={B})", lambda: probe_all(jax.vmap(
    lambda st, w: jax.lax.scan(
        lambda s_, _: (engine.step(s_, w, params, S)[0], 0.0), st, None,
        length=10)[0],
    in_axes=(0, 0))(st, world)))
