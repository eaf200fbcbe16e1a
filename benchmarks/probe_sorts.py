"""Micro-probe: TPU sort/top_k costs at build_edges' ridge-candidate sizes."""
import os, sys, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)

N = 8192
L = 6 * N          # 49152 ridge entries
CE = 2 * N         # compacted size
rng = np.random.default_rng(0)
key = jnp.asarray(rng.integers(0, 4096 * 4097, size=L), jnp.int32)
tproj = jnp.asarray(rng.normal(size=L), jnp.float32)
vidx = jnp.asarray(rng.integers(0, N, size=L), jnp.int32)
mask = jnp.asarray(rng.random(L) < 0.22)
ekey = jnp.asarray(rng.integers(0, N * N, size=L), jnp.int32)
key16 = key[:CE]; tproj16 = tproj[:CE]; vidx16 = vidx[:CE]; ekey16 = ekey[:CE]


def med_ms(f, *args, reps=7):
    g = jax.jit(f)
    o = g(*args)
    float(np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0])
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        o = g(*args)
        float(np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[0])
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def stage(name, f, *args):
    ms = med_ms(f, *args)
    print(f"{name:32s} {ms:8.2f} ms (device ~{max(ms - 28, 0):.0f})", flush=True)


stage("lexsort2 49k + take", lambda k, t, v: v[jnp.lexsort((t, k))].sum(),
      key, tproj, vidx)
stage("argsort 49k i32", lambda e: jnp.argsort(e).sum(), ekey)
stage("sort_pair 49k i32", lambda e, v: jax.lax.sort((e, v), num_keys=1)[1].sum(),
      ekey, vidx)
stage("top_k(16k) of 49k", lambda m: jax.lax.top_k(
    -jnp.where(m, jnp.arange(L, dtype=jnp.int32), jnp.int32(L)), CE)[0].sum(), mask)
stage("lexsort2 16k + take", lambda k, t, v: v[jnp.lexsort((t, k))].sum(),
      key16, tproj16, vidx16)
stage("argsort 16k i32", lambda e: jnp.argsort(e).sum(), ekey16)

# prox alternatives at N=8192
pos = jnp.asarray(rng.random((N, 2)) * 200.0, jnp.float32)
valid = jnp.asarray(rng.random(N) < 0.45)


def prox_topk(pos, valid):
    posm = jnp.where(valid[:, None], pos, 1e9)
    d2 = ((posm[:, None, 0] - posm[None, :, 0]) ** 2
          + (posm[:, None, 1] - posm[None, :, 1]) ** 2)
    iidx = jnp.arange(N)
    prox = (d2 <= 0.25) & (d2 > 1e-12) & (iidx[None, :] > iidx[:, None])
    row_j = jnp.where(prox, iidx[None, :], N).astype(jnp.int32)
    negj, _ = jax.lax.top_k(-row_j, 8)
    return (-negj).sum()


def prox_d2only(pos, valid):
    posm = jnp.where(valid[:, None], pos, 1e9)
    d2 = ((posm[:, None, 0] - posm[None, :, 0]) ** 2
          + (posm[:, None, 1] - posm[None, :, 1]) ** 2)
    return (d2 <= 0.25).sum()


def prox_grouped_min(pos, valid):
    # exact top-8 when each 8-col group holds <=1 partner is NOT guaranteed;
    # probe cost only: min over 8 column groups
    posm = jnp.where(valid[:, None], pos, 1e9)
    d2 = ((posm[:, None, 0] - posm[None, :, 0]) ** 2
          + (posm[:, None, 1] - posm[None, :, 1]) ** 2)
    iidx = jnp.arange(N)
    prox = (d2 <= 0.25) & (d2 > 1e-12) & (iidx[None, :] > iidx[:, None])
    row_j = jnp.where(prox, iidx[None, :], N).astype(jnp.int32)
    g = row_j.reshape(N, 8, N // 8)
    return jnp.min(g, axis=2).sum()


stage("prox d2 only 67M", prox_d2only, pos, valid)
stage("prox d2+topk8 67M", prox_topk, pos, valid)
stage("prox d2+grouped-min 67M", prox_grouped_min, pos, valid)
