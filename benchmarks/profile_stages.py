"""Per-substage wall times on the real v5e (BENCH_STATICS instance).

Each substage is its own jit; timing fetches one scalar probe, so every
number carries the tunnel floor (calibrated with a trivial jit at start;
~28-35 ms and drifts with shared-chip load) — subtracted for device time.
Run: python benchmarks/profile_stages.py
"""
import os, sys, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp

jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)

from aosx.config import BENCH_STATICS as S, AosParams, params_as_f32
from aosx.orchards import OrchardSpec, make_orchard
from aosx.perceive import points as jp, raster as jr, rows as jrow, seeds as jsd, skeleton as jsk
from aosx.gvd import graph as gg
from aosx.gvd.voronoi import jump_flood
from aosx.plan.astar import cost_matrix
from aosx.plan.mission import build_waypoints

spec = OrchardSpec(n_rows=20, row_len=180.0, row_spacing=9.0, tree_spacing=1.0,
                   trunk_pts=24, noise_pts=512, origin=(8.0, 8.0), jitter=0.15,
                   polygon_pad=2.0)
pc, poly = make_orchard(jax.random.PRNGKey(0), spec, S)
params = params_as_f32(AosParams())
excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)


def probe(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return jnp.sum(leaf.astype(jnp.float32).ravel()[:65536])


def med_ms(f, *args, reps=5):
    out = f(*args)
    float(np.asarray(jax.tree_util.tree_leaves(out)[-1]).ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[-1]).ravel()[0])
        ts.append((time.perf_counter() - t0) * 1e3)
    return out, float(np.median(ts))


STAGES = []


FLOOR = med_ms(jax.jit(lambda x: (x, x.sum() * 2.0)), jnp.ones((8, 128)))[1]
print(f"tunnel floor: {FLOOR:.2f} ms", flush=True)


def stage(name, fn, *args):
    jf = jax.jit(lambda *a: (lambda r: (r, probe(r)))(fn(*a)))
    (out, _), ms = med_ms(jf, *args)
    STAGES.append((name, ms))
    print(f"{name:22s} {ms:8.2f} ms (device ~{max(ms - FLOOR, 0):.0f})", flush=True)
    return out


t0 = time.time()
pre = stage("preprocess", lambda pc, poly, pr, ex: jp.preprocess(pc, poly, pr, ex, S, ror_method="sorted"), pc, poly, params, excl)
xy, keep, bounds, _g = pre
grid = stage("generate_grid", lambda xy, k, b: jr.generate_grid(xy, k, b, S), xy, keep, bounds)
infl = stage("inflate+borders", lambda g: jr.mark_borders(jr.inflate(g, S)), grid)
infl2 = jax.jit(lambda g: jr.inflate(g, S))(grid)
skel = stage("skeletonize", lambda g: jsk.skeletonize(g, S), infl2)
clusters = stage("cluster_grid", lambda g, p, pr: jrow.cluster_grid(g, p, pr, S), skel, poly, params)
rows = stage("rows_from_clusters", lambda c, g, p, pr: jrow.rows_from_clusters(c, g, p, pr, S), clusters, skel, poly, params)
rows_sorted = jax.jit(jrow.sort_rows)(rows)
seeds = stage("generate_seeds", lambda r, g, p, pr: jsd.generate_seeds(r, g, p, pr, S), rows, skel, poly, params)
merged = stage("merge_seeds", lambda se, pr: gg.merge_seeds(se, pr, S), seeds, params)
owner = stage("jump_flood", lambda g, se: jump_flood(g, se, S), skel, merged)
verts = stage("extract_vertices", lambda g, o: gg.extract_vertices(g, o, S), skel, owner)
pos, owners, node_valid = verts
edges = stage("build_edges", lambda p, o, v, g, se, pr: gg.build_edges(p, o, v, g, se, pr, S), pos, owners, node_valid, skel, merged, params)
labels = stage("find_labels", lambda p, v, r, g, pr: gg.find_labels(p, v, r, g, pr, S), pos, node_valid, rows_sorted, skel, params)
lp, lv, _ = labels
al = stage("assign_labels", lambda p, v, a, b, pr: gg.assign_labels(p, v, a, b, pr, S), pos, node_valid, lp, lv, params)

from aosx.gvd import build_gvd_graph
g_full = jax.jit(lambda se, ro, sk, pr: build_gvd_graph(se, ro, sk, pr, S))(seeds, rows_sorted, skel, params)
cm = stage("cost_matrix", lambda g: cost_matrix(g, S), g_full)
wp = stage("build_waypoints", lambda g, pr: build_waypoints(g, pr, S), g_full, params)

total = sum(ms for _, ms in STAGES)
print(f"\nsum of staged: {total:.1f} ms ({len(STAGES)} stages x {FLOOR:.1f} ms floor "
      f"-> device ~{total - FLOOR * len(STAGES):.0f} ms); wall {time.time()-t0:.0f}s")

# committed artifact for FLOOR.md's per-stage table (VERDICT r3 #5): the
# reported ms carry the calibrated floor; device ~ reported - floor
import json
with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "STAGES.json"), "w") as f:
    json.dump({
        "metric": "per_stage_reported_ms_2000x2048",
        "tunnel_floor_ms": round(FLOOR, 2),
        "stages": {name: round(ms, 2) for name, ms in STAGES},
        "sum_reported_ms": round(total, 1),
        "sum_device_est_ms": round(total - FLOOR * len(STAGES), 1),
    }, f, indent=1)
