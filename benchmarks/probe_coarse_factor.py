"""Measure build_edges at crossing_coarse_factor 8 vs 16 on the bench
instance (real v5e), with a decision-parity assertion between the two.

The per-slot machinery (scans, coarse gather, window compaction) costs
~cap/C4; the fine gather costs F * 2*C4. Round 2 measured 4 -> 8 as a halving
of the stage; this probe decides whether 16 pays or the fine side wins.

Run: timeout 3000 python benchmarks/probe_coarse_factor.py
"""
import dataclasses
import os, sys, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
from aosx.config import BENCH_STATICS, AosParams, params_as_f32
from aosx.orchards import OrchardSpec, make_orchard
from aosx.perceive import perceive
from aosx.gvd import graph as gg
from aosx.gvd.voronoi import jump_flood

spec = OrchardSpec(n_rows=20, row_len=180.0, row_spacing=9.0, tree_spacing=1.0,
                   trunk_pts=24, noise_pts=512, origin=(8.0, 8.0), jitter=0.15,
                   polygon_pad=2.0)
S = BENCH_STATICS
pc, poly = make_orchard(jax.random.PRNGKey(0), spec, S)
params = params_as_f32(AosParams())
excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)
out = jax.jit(lambda pc, poly, pr, ex: perceive(pc, poly, pr, ex, S, ror_method='sorted'))(pc, poly, params, excl)
skel = out.skeleton
merged = jax.jit(lambda se, pr: gg.merge_seeds(se, pr, S))(out.seeds, params)
owner = jax.jit(lambda g, se: jump_flood(g, se, S))(skel, merged)
pos, owners, node_valid = jax.jit(lambda g, o: gg.extract_vertices(g, o, S))(skel, owner)


@jax.jit
def trivial(x):
    return (x * 2 + 1).sum()


def floor_ms(reps=7):
    x = jnp.arange(128, dtype=jnp.float32)
    float(trivial(x))
    ts = []
    for _ in range(reps):
        t = time.perf_counter()
        float(trivial(x))
        ts.append((time.perf_counter() - t) * 1e3)
    return float(np.median(ts))


results = {}
for c4 in (8, 16, 32):
    Sc = dataclasses.replace(S, crossing_coarse_factor=c4)

    def run(pos, owners, node_valid, skel, merged, params, _S=Sc):
        ea, eb, ev, lengths, n_edges, guards = gg.build_edges(
            pos, owners, node_valid, skel, merged, params, _S)
        return ea, eb, ev, n_edges, jnp.sum(ev.astype(jnp.int32)) + n_edges

    jf = jax.jit(run)
    t0 = time.time()
    o = jf(pos, owners, node_valid, skel, merged, params)
    float(np.asarray(o[-1]))
    fl = floor_ms()
    ts = []
    for _ in range(7):
        t = time.perf_counter()
        o = jf(pos, owners, node_valid, skel, merged, params)
        float(np.asarray(o[-1]))
        ts.append((time.perf_counter() - t) * 1e3)
    ms = float(np.median(ts))
    results[c4] = (ms, fl, o)
    print(f"C4={c4}: {ms:.1f} ms reported, floor {fl:.1f} -> ~{ms-fl:.1f} device "
          f"(n_edges={int(o[3])}, {time.time()-t0:.0f}s incl compile)", flush=True)

ref = results[8][2]
for c4 in (16, 32):
    o = results[c4][2]
    for k in range(3):
        assert np.array_equal(np.asarray(ref[k]), np.asarray(o[k])), (c4, k)
    assert int(ref[3]) == int(o[3])
print("decision parity C4=8 vs 16 vs 32: identical edges")
