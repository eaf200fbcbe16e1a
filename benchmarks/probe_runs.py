"""Count horizontal runs and run-adjacency pairs on the bench skeleton
(sizes the static buffers for the run-level union-find in rows.py)."""
import os, sys
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
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


@jax.jit
def stats(g, p):
    h, w = g.occ.shape
    res = jnp.float32(S.resolution)
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    wx = g.origin_x + ix.astype(jnp.float32) * res
    wy = g.origin_y + iy.astype(jnp.float32) * res
    inp = point_in_polygon(wx, wy, p)
    mask = (g.occ == 1) & live_mask(g) & jnp.where(p.count >= 3, inp, True)
    cf, cok, inv = jrow.compact_cells(mask, S)
    M = cf.shape[0]
    nbrs = jrow.neighbor_table(cf, cok, inv, h, w)
    # run starts
    prev = jnp.concatenate([jnp.array([-9], jnp.int32), cf[:-1]])
    xcol = jnp.where(cf >= 0, cf % w, 0)
    cont = (cf == prev + 1) & (xcol > 0) & cok
    is_start = cok & ~cont
    nrun = jnp.sum(is_start.astype(jnp.int32))
    rid = jnp.cumsum(is_start.astype(jnp.int32)) - 1
    # backward pairs (N, NW, NE = cols 0,1,2), consecutive-dup filtered
    ridx = jnp.concatenate([rid, jnp.array([-1], jnp.int32)])
    npairs_raw = 0
    npairs_dedup = 0
    for c in range(3):
        nb = nbrs[:, c]
        ok = cok & (nb < M)
        pb = jnp.where(ok, ridx[jnp.minimum(nb, M)], -1)
        pa = jnp.where(ok, rid, -1)
        valid = ok & (pa != pb)
        npairs_raw += jnp.sum(valid.astype(jnp.int32))
        # consecutive-duplicate filter along the compact list
        key = jnp.where(valid, pa * jnp.int32(M) + pb, -1)
        prevk = jnp.concatenate([jnp.array([-2], jnp.int32), key[:-1]])
        npairs_dedup += jnp.sum((valid & (key != prevk)).astype(jnp.int32))
    return jnp.sum(cok.astype(jnp.int32)), nrun, npairs_raw, npairs_dedup


ncell, nrun, praw, pded = stats(skel, poly)
print("cells:", int(ncell), "runs:", int(nrun),
      "pairs raw:", int(praw), "pairs dedup:", int(pded), flush=True)
