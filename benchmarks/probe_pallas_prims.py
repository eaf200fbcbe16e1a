"""Probe primitive costs on the real v5e for round-2 kernel design.

P1: Pallas scalar-loop union-find feasibility — dynamic-index scalar
    read/write into an SMEM scratch inside a sequential fori_loop.
P2: same with a VMEM int32 ref (single-element dynamic indexing).
P3: tpu.dynamic_gather throughput via jnp.take_along_axis(axis=1) in-kernel.
P4: XLA flat-gather baseline at the packed-crossing-filter size (262k).

Every timing runs K reps inside one jit (data-dependent chain) to amortize
the ~28 ms tunnel overhead per call.
"""
import os, time
os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', '/root/repo/.jax_cache')
import numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.0)
jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)


def timeit(f, *args, reps=3):
    out = jax.block_until_ready(f(*args))
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf).ravel()[:1]
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = f(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


# ---------------- P1: scalar loop over SMEM scratch -------------------------
N = 65536
NITER = 65536


def smem_kernel(seed_ref, out_ref, parent):
    # init parent[i] = i sequentially (also times pure scalar-store loop)
    def init(i, c):
        parent[i] = i
        return c
    jax.lax.fori_loop(0, N, init, 0)

    # chase+write loop: random-ish walk with dynamic read + write
    def body(i, c):
        j = (c * 1103515245 + 12345) & (N - 1)
        v = parent[j]
        parent[(j + 1) & (N - 1)] = v
        return v ^ i
    c = jax.lax.fori_loop(0, NITER, body, seed_ref[0])
    out_ref[0] = c


def p1():
    try:
        f = pl.pallas_call(
            smem_kernel,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.SMEM((N,), jnp.int32)],
        )
        g = jax.jit(f)
        ms = timeit(g, jnp.array([3], jnp.int32))
        per = (ms - 28.0) * 1e6 / (N + NITER)
        print(f"P1 smem scalar loop: {ms:.1f} ms total, ~{per:.1f} ns/op "
              f"({(N + NITER)} ops)", flush=True)
    except Exception as e:
        print(f"P1 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


# ---------------- P2: scalar dynamic access to VMEM ref ---------------------
def vmem_kernel(seed_ref, out_ref, tab):
    def init(i, c):
        tab[i // 128, i % 128] = i
        return c
    jax.lax.fori_loop(0, 4096, init, 0)

    def body(i, c):
        j = (c * 1103515245 + 12345) & 4095
        v = tab[j // 128, j % 128]
        return v ^ i
    c = jax.lax.fori_loop(0, 8192, body, seed_ref[0])
    out_ref[0] = c


def p2():
    try:
        f = pl.pallas_call(
            vmem_kernel,
            out_shape=jax.ShapeDtypeStruct((1,), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
            scratch_shapes=[pltpu.VMEM((32, 128), jnp.int32)],
        )
        g = jax.jit(f)
        ms = timeit(g, jnp.array([3], jnp.int32))
        per = (ms - 28.0) * 1e6 / (4096 + 8192)
        print(f"P2 vmem scalar loop: {ms:.1f} ms total, ~{per:.1f} ns/op",
              flush=True)
    except Exception as e:
        print(f"P2 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


# ---------------- P3: take_along_axis axis=1 in-kernel ----------------------
def taa_kernel(x_ref, idx_ref, out_ref):
    def body(r, acc):
        acc = acc + jnp.take_along_axis(x_ref[:], (idx_ref[:] + acc) & 2047,
                                        axis=1)
        return acc
    out_ref[:] = jax.lax.fori_loop(0, 64, body, jnp.zeros_like(x_ref))


def p3():
    try:
        x = jnp.arange(512 * 2048, dtype=jnp.int32).reshape(512, 2048) & 1023
        idx = (x * 7 + 13) & 2047
        f = pl.pallas_call(
            taa_kernel,
            out_shape=jax.ShapeDtypeStruct((512, 2048), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )
        g = jax.jit(f)
        ms = timeit(g, x, idx)
        n = 512 * 2048 * 64
        print(f"P3 take_along_axis(1) kernel: {ms:.1f} ms, "
              f"{(ms - 28.0) * 1e6 / n:.3f} ns/element ({n} gathered)",
              flush=True)
    except Exception as e:
        print(f"P3 FAILED: {type(e).__name__}: {str(e)[:300]}", flush=True)


# ---------------- P3b: XLA take_along_axis (no pallas) ----------------------
def p3b():
    x = jnp.arange(512 * 2048, dtype=jnp.int32).reshape(512, 2048) & 1023
    idx0 = (x * 7 + 13) & 2047

    @jax.jit
    def g(x, idx):
        def body(r, acc):
            acc = acc + jnp.take_along_axis(x, (idx + acc) & 2047, axis=1)
            return acc
        return jax.lax.fori_loop(0, 64, body, jnp.zeros_like(x))
    ms = timeit(g, x, idx0)
    n = 512 * 2048 * 64
    print(f"P3b take_along_axis(1) XLA: {ms:.1f} ms, "
          f"{(ms - 28.0) * 1e6 / n:.3f} ns/element", flush=True)


# ---------------- P4: XLA flat gather baseline -------------------------------
def p4():
    occ = (jnp.arange(2000 * 2048, dtype=jnp.int32) & 7).astype(jnp.uint8)
    idx0 = (jnp.arange(262144, dtype=jnp.int32) * 48271) % (2000 * 2048)

    @jax.jit
    def g(occ, idx):
        def body(r, acc):
            acc = (acc + occ[(idx + acc.astype(jnp.int32)) % (2000 * 2048)]
                   .astype(jnp.int32)).astype(jnp.int32)
            return acc
        return jax.lax.fori_loop(0, 16, body, jnp.zeros_like(idx))
    ms = timeit(g, occ, idx0)
    n = 262144 * 16
    print(f"P4 flat 1D gather XLA 262k x16: {ms:.1f} ms, "
          f"{(ms - 28.0) * 1e6 / n:.3f} ns/element", flush=True)


if __name__ == "__main__":
    import sys
    which = sys.argv[1:] or ["p1", "p2", "p3", "p3b", "p4"]
    for w in which:
        globals()[w]()
