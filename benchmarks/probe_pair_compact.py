"""Micro-probe: pair compaction for run-level union-find - top_k vs
cumsum+scatter at the bench sizes (ok mask [3M]=196608, P=16384)."""
import os, sys, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np, jax, jax.numpy as jnp
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
from aosx.ops import compact_true, compact_take

L = 196608
P = 16384
R = 16384
rng = np.random.default_rng(0)
ok = jnp.asarray(rng.random(L) < 0.025)          # ~4.9k true, like bench
pa_all = jnp.asarray(rng.integers(0, R, L), jnp.int32)
pb_all = jnp.asarray(rng.integers(0, R, L), jnp.int32)


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
    print(f"{name:32s} {med_ms(f, *args):8.2f} ms", flush=True)


def via_topk(ok, pa_all, pb_all):
    sel, _ = compact_true(ok, P)
    pa = compact_take(pa_all, sel, R)
    pb = compact_take(pb_all, sel, R)
    return pa.sum() + pb.sum()


def via_scatter(ok, pa_all, pb_all):
    rank = jnp.cumsum(ok.astype(jnp.int32)) - 1
    tgt = jnp.where(ok & (rank < P), rank, P)
    pa = jnp.full((P + 1,), R, jnp.int32).at[tgt].set(pa_all, mode="drop")[:P]
    pb = jnp.full((P + 1,), R, jnp.int32).at[tgt].set(pb_all, mode="drop")[:P]
    return pa.sum() + pb.sum()


def via_scatter_2d(ok, pa_all, pb_all):
    rank = jnp.cumsum(ok.astype(jnp.int32)) - 1
    tgt = jnp.where(ok & (rank < P), rank, P)
    both = jnp.stack([pa_all, pb_all], axis=1)
    out = jnp.full((P + 1, 2), R, jnp.int32).at[tgt].set(both, mode="drop")[:P]
    return out.sum()


def floor_fn(ok, pa_all, pb_all):
    return ok.sum() + pa_all.sum() + pb_all.sum()


stage("floor (reductions only)", floor_fn, ok, pa_all, pb_all)
stage("top_k compact (current)", via_topk, ok, pa_all, pb_all)
stage("cumsum+scatter x2", via_scatter, ok, pa_all, pb_all)
stage("cumsum+scatter 2d", via_scatter_2d, ok, pa_all, pb_all)
