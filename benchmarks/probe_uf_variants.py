"""Sweep union-find variants on real bench skeleton data (real v5e).

Variants:
  A: current (8-nbr min, hook to root, hops=H)
  B: A + run-collapse init (horizontal runs pre-merged)
  C: 4-backward-nbr table, scatter cand to both roots, hops=H
  D: B + C combined
Timing: K rounds inside one jit (fori_loop) to amortize tunnel overhead;
round counts measured by the host loop with the convergence flag.
"""
import os, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
from aosx.config import BENCH_STATICS as S, AosParams, params_as_f32
from aosx.orchards import OrchardSpec, make_orchard
from aosx.perceive import points as jp, raster as jr, skeleton as jsk, rows as jrow

spec = OrchardSpec(n_rows=20, row_len=180.0, row_spacing=9.0, tree_spacing=1.0,
                   trunk_pts=24, noise_pts=512, origin=(8.0, 8.0), jitter=0.15,
                   polygon_pad=2.0)
pc, poly = make_orchard(jax.random.PRNGKey(0), spec, S)
params = params_as_f32(AosParams())
excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)
xy, keep, bounds, _ = jax.jit(
    lambda pc, poly, pr, ex: jp.preprocess(pc, poly, pr, ex, S, ror_method='sorted')
)(pc, poly, params, excl)
grid = jax.jit(lambda a, k, b: jr.generate_grid(a, k, b, S))(xy, keep, bounds)
infl = jax.jit(lambda g: jr.inflate(g, S))(grid)
skel = jax.jit(lambda g: jsk.skeletonize(g, S))(infl)

from aosx.geom import point_in_polygon
from aosx.perceive.raster import live_mask


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
nbrs8 = jax.jit(lambda a, b, c: jrow.neighbor_table(a, b, c, h, w))(cf, cok, inv)
M = nbrs8.shape[0]
print("skel cells:", int(np.asarray(cok.sum())), "M:", M, flush=True)

# backward-only 4-neighbor table (N, NW, NE, W in _NEIGH order: indices 0,1,2,3)
nbrs4 = nbrs8[:, :4]
L0 = jnp.arange(M, dtype=jnp.int32)


@jax.jit
def run_init():
    prev_flat = jnp.concatenate([jnp.array([-9], jnp.int32), cf[:-1]])
    xcol = jnp.where(cf >= 0, cf % w, 0)
    cont = (cf == prev_flat + 1) & (xcol > 0) & cok
    idx = jnp.arange(M, dtype=jnp.int32)
    starts = jnp.where(cont, -1, idx)
    L = jax.lax.associative_scan(jnp.maximum, starts)
    return jnp.where(cok, L, idx)


def make_round(nbrs, hops, both_roots):
    def round_fn(L):
        Lext = jnp.concatenate([L, jnp.array([M], jnp.int32)])
        nbL = Lext[nbrs]                      # [M,k]
        nbmin = jnp.minimum(jnp.min(nbL, axis=1), L)
        L1 = L.at[L].min(nbmin)
        if both_roots:
            # scatter cand onto the neighbor's root too (backward edges only
            # see u->v; v's tree must also receive the min)
            nb_root = jnp.where(nbrs < M, Lext[jnp.minimum(nbL, M - 1)], M)
            cand = jnp.minimum(nbmin[:, None], jnp.full_like(nbL, M))
            L1 = L1.at[jnp.where(nbrs < M, nb_root, M)].min(
                jnp.broadcast_to(nbmin[:, None], nbL.shape), mode="drop")
        def cbody(_, Lc):
            return jnp.minimum(Lc, Lc[Lc])
        L1 = jax.lax.fori_loop(0, hops, cbody, L1)
        return L1
    return round_fn


def count_rounds(round_fn, L):
    @jax.jit
    def step(L):
        L1 = round_fn(L)
        return L1, jnp.any(L1 != L)
    r = 0
    while True:
        L, ch = step(L)
        r += 1
        if not bool(np.asarray(ch)):
            break
    return r, L


def time_rounds(round_fn, L0v, K):
    @jax.jit
    def many(L):
        return jax.lax.fori_loop(0, K, lambda i, Lc: round_fn(Lc), L)
    out = many(L0v); np.asarray(out[:1])
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(many(L0v)[:1])
        ts.append((time.perf_counter() - t0) * 1e3)
    return (float(np.median(ts)) - 28.0) / K


ref_r, ref_L = count_rounds(make_round(nbrs8, 6, False), L0)
print(f"A(8nbr,hook-root,hops=6): rounds={ref_r}", flush=True)

for name, nbrs, hops, both, init in [
    ("A h4", nbrs8, 4, False, False),
    ("A h2", nbrs8, 2, False, False),
    ("B h4 (run-init)", nbrs8, 4, False, True),
    ("B h2 (run-init)", nbrs8, 2, False, True),
    ("C h4 (4nbr both-roots)", nbrs4, 4, True, False),
    ("D h4 (run-init+4nbr)", nbrs4, 4, True, True),
    ("D h2", nbrs4, 2, True, True),
]:
    Lv = run_init() if init else L0
    rf = make_round(nbrs, hops, both)
    r, Lf = count_rounds(rf, Lv)
    same = bool(np.asarray(jnp.all(jnp.where(cok, Lf == ref_L, True))))
    per = time_rounds(rf, Lv, 8)
    print(f"{name}: rounds={r} per_round={per:.2f} ms total~{r*per:.1f} ms "
          f"parity={same}", flush=True)
