"""Decompose cluster_grid's device time on the real bench instance."""
import os, sys, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
from aosx.config import BENCH_STATICS as S, AosParams, params_as_f32
from aosx.orchards import OrchardSpec, make_orchard
from aosx.perceive import points as jp, raster as jr, skeleton as jsk, rows as jrow
from aosx.geom import point_in_polygon
from aosx.perceive.raster import live_mask

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


def probe(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return jnp.sum(leaf.astype(jnp.float32).ravel()[:65536])


def stage(name, fn, *args):
    jf = jax.jit(lambda *a: (lambda r: (r, probe(r)))(fn(*a)))
    (out, _), ms = med_ms(jf, *args)
    print(f"{name:26s} {ms:8.2f} ms (device ~{max(ms - 28, 0):.0f})", flush=True)
    return out


def make_mask(g, p):
    h, w = g.occ.shape
    res = jnp.float32(S.resolution)
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    wx = g.origin_x + ix.astype(jnp.float32) * res
    wy = g.origin_y + iy.astype(jnp.float32) * res
    inp = point_in_polygon(wx, wy, p)
    return (g.occ == 1) & live_mask(g) & jnp.where(p.count >= 3, inp, True)


mask = stage("mask+pip", make_mask, skel, poly)
cells = stage("compact_cells", lambda m: jrow.compact_cells(m, S), mask)
cell_flat, cell_ok, inv = cells
h, w = skel.occ.shape
L = stage("run_level_labels",
          lambda cf, co: jrow.run_level_labels(cf, co, h, w, S)[0],
          cell_flat, cell_ok)


def seg_stats(L, cell_flat, cell_ok):
    M = cell_flat.shape[0]
    K = S.max_clusters
    is_root = cell_ok & (L == jnp.arange(M))
    rank = jnp.cumsum(is_root.astype(jnp.int32)) - 1
    root_rank = jnp.where(is_root, rank, 0)
    cid = jnp.where(cell_ok, root_rank[L], -1)
    seg = jnp.where((cid >= 0) & (cid < K), cid, K)
    safe = jnp.maximum(cell_flat, 0)
    cell_x = jnp.where(cell_ok, (safe % w).astype(jnp.float32), 0.0)
    cell_y = jnp.where(cell_ok, (safe // w).astype(jnp.float32), 0.0)
    ones = jnp.where(cell_ok, 1.0, 0.0)
    count = jax.ops.segment_sum(ones, seg, num_segments=K + 1)[:K]
    sum_x = jax.ops.segment_sum(cell_x, seg, num_segments=K + 1)[:K]
    sum_y = jax.ops.segment_sum(cell_y, seg, num_segments=K + 1)[:K]
    return count, sum_x, sum_y, cid, cell_x, cell_y


stats = stage("segment_stats", seg_stats, L, cell_flat, cell_ok)
count, sum_x, sum_y, cid, cell_x, cell_y = stats


def banded_len(cid, cell_x, cell_y, cell_ok, count):
    M = cell_x.shape[0]
    K = S.max_clusters
    cell_cid = jnp.where(cell_ok, jnp.minimum(cid, K), K)
    B = min(4096, M)
    nblk = (M + B - 1) // B
    sorder = jnp.argsort(cell_cid, stable=True)
    sx = jnp.where(cell_ok, cell_x, 1e9)[sorder]
    sy = jnp.where(cell_ok, cell_y, -1e9)[sorder]
    sc = cell_cid[sorder]
    sxb = sx.reshape(nblk, B)
    syb = sy.reshape(nblk, B)
    scb = sc.reshape(nblk, B)

    def nb_concat(a, fill):
        left = jnp.concatenate([jnp.full((1, B), fill, a.dtype), a[:-1]], 0)
        right = jnp.concatenate([a[1:], jnp.full((1, B), fill, a.dtype)], 0)
        return jnp.concatenate([left, a, right], axis=1)

    tx = nb_concat(sxb, jnp.float32(-1e9))
    ty = nb_concat(syb, jnp.float32(1e9))
    tc = nb_concat(scb, jnp.int32(K))
    C = min(512, B)

    def blk(carry, i):
        def chunk(best, j):
            rx = jax.lax.dynamic_slice(sxb[i], (j * C,), (C,))
            ry = jax.lax.dynamic_slice(syb[i], (j * C,), (C,))
            rc = jax.lax.dynamic_slice(scb[i], (j * C,), (C,))
            d2 = (rx[:, None] - tx[i][None, :]) ** 2 + (ry[:, None] - ty[i][None, :]) ** 2
            same = rc[:, None] == tc[i][None, :]
            row_max = jnp.max(jnp.where(same, d2, -1.0), axis=1)
            best = jnp.maximum(best, jax.ops.segment_max(row_max, rc, num_segments=K + 1))
            return best, None

        best, _ = jax.lax.scan(chunk, carry, jnp.arange(B // C))
        return best, None

    best, _ = jax.lax.scan(blk, jnp.full((K + 1,), -1.0), jnp.arange(nblk))
    return best


stage("banded_length", banded_len, cid, cell_x, cell_y, cell_ok, count)
full = stage("cluster_grid (whole)",
             lambda g, p, pr: jrow.cluster_grid(g, p, pr, S), skel, poly, params)
