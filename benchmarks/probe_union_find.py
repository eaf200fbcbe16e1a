"""Count union-find rounds on real bench skeleton data + time one round body."""
import os, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
from aosx.config import BENCH_STATICS as S, AosParams, params_as_f32
from aosx.orchards import OrchardSpec, make_orchard
from aosx.perceive import points as jp, raster as jr, skeleton as jsk, rows as jrow
from aosx.geom import point_in_polygon
from aosx.perceive.raster import live_mask

spec = OrchardSpec(n_rows=20, row_len=180.0, row_spacing=9.0, tree_spacing=1.0,
                   trunk_pts=24, noise_pts=512, origin=(8.0, 8.0), jitter=0.15, polygon_pad=2.0)
pc, poly = make_orchard(jax.random.PRNGKey(0), spec, S)
params = params_as_f32(AosParams())
excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)
xy, keep, bounds, _ = jax.jit(lambda pc, poly, pr, ex: jp.preprocess(pc, poly, pr, ex, S, ror_method='sorted'))(pc, poly, params, excl)
grid = jax.jit(lambda a, k, b: jr.generate_grid(a, k, b, S))(xy, keep, bounds)
infl = jax.jit(lambda g: jr.inflate(g, S))(grid)
skel = jax.jit(lambda g: jsk.skeletonize(g, S))(infl)


def mask_compact(g, p):
    h, w = g.occ.shape
    res = jnp.float32(S.resolution)
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    wx = g.origin_x + ix.astype(jnp.float32) * res
    wy = g.origin_y + iy.astype(jnp.float32) * res
    inp = point_in_polygon(wx, wy, p)
    mask = (g.occ == 1) & live_mask(g) & jnp.where(p.count >= 3, inp, True)
    return jrow.compact_cells(mask, S)

cf, cok, inv = jax.jit(mask_compact)(skel, poly)
h, w = skel.occ.shape
nbrs = jax.jit(lambda a, b, c: jrow.neighbor_table(a, b, c, h, w))(cf, cok, inv)
print("skel cells:", int(np.asarray(cok.sum())), flush=True)

M = nbrs.shape[0]
L0 = jnp.arange(M, dtype=jnp.int32)

@jax.jit
def body(L, hops):
    Lext = jnp.concatenate([L, jnp.array([M], jnp.int32)])
    nbmin = jnp.min(Lext[nbrs], axis=1)
    nbmin = jnp.minimum(nbmin, L)
    L1 = L.at[L].min(nbmin)
    def cbody(_, Lc):
        return jnp.minimum(Lc, Lc[Lc])
    L1 = jax.lax.fori_loop(0, hops, cbody, L1)
    return L1, jnp.any(L1 != L)

for hops in (6, 4, 10):
    L = L0
    rounds = 0
    while True:
        L, ch = body(L, hops)
        rounds += 1
        if not bool(ch):
            break
    print(f"hops={hops}: rounds={rounds} (+1 no-change round)", flush=True)

# time one round body
Lh = L0
f = jax.jit(lambda L: body(L, 6)[0])
np.asarray(f(Lh))
ts = []
for _ in range(6):
    t0 = time.perf_counter(); np.asarray(f(Lh)); ts.append((time.perf_counter()-t0)*1e3)
print(f"one round (hops=6): {np.median(ts):.1f} ms incl ~28 overhead", flush=True)

# run-collapse init: label = first compact index of the horizontal run
@jax.jit
def run_init():
    prev_flat = jnp.concatenate([jnp.array([-9], jnp.int32), cf[:-1]])
    xcol = jnp.where(cf >= 0, cf % w, 0)
    cont = (cf == prev_flat + 1) & (xcol > 0) & cok
    idx = jnp.arange(M, dtype=jnp.int32)
    starts = jnp.where(cont, -1, idx)
    def op(a, b):
        return jnp.maximum(a, b) * 0 + jnp.where(b >= 0, b, a)
    L = jax.lax.associative_scan(jnp.maximum, starts)  # cummax works: starts=-1 on cont
    return jnp.where(cok, L, idx)

Lr = run_init()
L = Lr
rounds = 0
while True:
    L, ch = body(L, 6)
    rounds += 1
    if not bool(ch):
        break
print(f"run-collapse init + hops=6: rounds={rounds}", flush=True)
