"""Decompose build_edges device time on the bench instance (real v5e)."""
import os, sys, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
from aosx.config import BENCH_STATICS as S, AosParams, params_as_f32
from aosx.orchards import OrchardSpec, make_orchard
from aosx.perceive import perceive
from aosx.gvd import graph as gg
from aosx.gvd.voronoi import jump_flood

spec = OrchardSpec(n_rows=20, row_len=180.0, row_spacing=9.0, tree_spacing=1.0,
                   trunk_pts=24, noise_pts=512, origin=(8.0, 8.0), jitter=0.15,
                   polygon_pad=2.0)
pc, poly = make_orchard(jax.random.PRNGKey(0), spec, S)
params = params_as_f32(AosParams())
excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)
out = jax.jit(lambda pc, poly, pr, ex: perceive(pc, poly, pr, ex, S, ror_method='sorted'))(pc, poly, params, excl)
skel = out.skeleton
merged = jax.jit(lambda se, pr: gg.merge_seeds(se, pr, S))(out.seeds, params)
owner = jax.jit(lambda g, se: jump_flood(g, se, S))(skel, merged)
pos, owners, node_valid = jax.jit(lambda g, o: gg.extract_vertices(g, o, S))(skel, owner)


def med_ms(f, *args, reps=5):
    o = f(*args)
    float(np.asarray(jax.tree_util.tree_leaves(o)[-1]).ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = f(*args)
        float(np.asarray(jax.tree_util.tree_leaves(o)[-1]).ravel()[0])
        ts.append((time.perf_counter() - t0) * 1e3)
    return o, float(np.median(ts))


def probe(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return jnp.sum(leaf.astype(jnp.float32).ravel()[:65536])


def stage(name, fn, *args):
    jf = jax.jit(lambda *a: (lambda r: (r, probe(r)))(fn(*a)))
    (o, _), ms = med_ms(jf, *args)
    print(f"{name:26s} {ms:8.2f} ms (device ~{max(ms - 28, 0):.0f})", flush=True)
    return o


N, E = S.max_nodes, S.max_edges
SS = merged.xy.shape[0]


def ridge_cands(pos, owners, node_valid):
    pairs = []
    for ii in range(4):
        for jj in range(ii + 1, 4):
            a = owners[:, ii]
            b = owners[:, jj]
            lo = jnp.minimum(a, b)
            hi = jnp.maximum(a, b)
            ok = (lo >= 0) & node_valid
            pairs.append((jnp.where(ok, lo, SS), jnp.where(ok, hi, SS), ok))
    lo = jnp.concatenate([p[0] for p in pairs])
    hi = jnp.concatenate([p[1] for p in pairs])
    pok = jnp.concatenate([p[2] for p in pairs])
    vidx = jnp.tile(jnp.arange(N, dtype=jnp.int32), 6)
    sx = jnp.concatenate([merged.xy[:, 0], jnp.zeros((1,), jnp.float32)])
    sy = jnp.concatenate([merged.xy[:, 1], jnp.zeros((1,), jnp.float32)])
    tx = sx[jnp.minimum(hi, SS)] - sx[jnp.minimum(lo, SS)]
    ty = sy[jnp.minimum(hi, SS)] - sy[jnp.minimum(lo, SS)]
    tangx, tangy = -ty, tx
    vposx = pos[jnp.minimum(vidx, N - 1), 0]
    vposy = pos[jnp.minimum(vidx, N - 1), 1]
    tproj = vposx * tangx + vposy * tangy
    key = jnp.where(pok, lo * (SS + 1) + hi, jnp.int32((SS + 1) * (SS + 1)))
    order = jnp.lexsort((tproj, key))
    key_s = key[order]
    vidx_s = vidx[order]
    same = (key_s[:-1] == key_s[1:]) & (key_s[:-1] < (SS + 1) * (SS + 1))
    ra = vidx_s[:-1]
    rb = vidx_s[1:]
    r_valid = same & (ra != rb)
    ea = jnp.minimum(ra, rb)
    eb = jnp.maximum(ra, rb)
    ekey = jnp.where(r_valid, ea * N + eb, jnp.int32(N) * N)
    order2 = jnp.argsort(ekey)
    ekey_s = ekey[order2]
    first = jnp.concatenate([jnp.array([True]), ekey_s[1:] != ekey_s[:-1]])
    ridge_valid = first & (ekey_s < jnp.int32(N) * N)
    return ridge_valid, ekey_s


def prox_cands(pos, node_valid):
    posm = jnp.where(node_valid[:, None], pos, 1e9)
    d2 = ((posm[:, None, 0] - posm[None, :, 0]) ** 2
          + (posm[:, None, 1] - posm[None, :, 1]) ** 2)
    iidx = jnp.arange(N)
    t = jnp.asarray(params.proximity_edge_dist, jnp.float32)
    prox = (d2 <= t * t) & (d2 > 1e-12) & (iidx[None, :] > iidx[:, None])
    row_j = jnp.where(prox, iidx[None, :], N)
    negj, _ = jax.lax.top_k(-row_j, 8)
    return -negj


def crossing_only(pos):
    a = pos
    b = pos + 0.3
    nmax = jnp.full((N,), 64, jnp.int32)
    return gg.edge_crossing_packed(skel, a, b, nmax, node_valid, S,
                                   cap=32 * S.max_edges)[0]


stage("ridge_candidates", ridge_cands, pos, owners, node_valid)
stage("prox_pairwise+topk", prox_cands, pos, node_valid)
stage("crossing_packed(N)", crossing_only, pos)
stage("build_edges (whole)",
      lambda p, o, v, se, pr: gg.build_edges(p, o, v, skel, se, pr, S),
      pos, owners, node_valid, merged, params)

# real-candidate buffer usage (sizes the cap/F statics honestly)
diag = jax.jit(lambda p, o, v, se, pr: gg.build_edges(
    p, o, v, skel, se, pr, S, return_diag=True)[6])(
    pos, owners, node_valid, merged, params)
print("diag: total coarse slots =", int(diag["total"]), "/ capp", int(diag["capp"]),
      "; fine windows =", int(diag["nwin_true"]), "/ F", int(diag["F"]))
