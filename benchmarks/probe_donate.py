"""Does donating the IncrementalState carry make the noop frame sub-ms?

Hypothesis (round 3): the 1.27 ms noop frame (INCREMENTAL.json) is NOT the
level-0 gate's compute (an O(N) equality compare over the 131k-point buffer
is ~microseconds) but HBM copies of the carried world/out planes through
the top-level lax.cond — without input-output aliasing, XLA materializes
fresh output buffers for every carried leaf (~tens of MB at 2000x2048).
jit(donate_argnums=(0,)) lets XLA alias carry input->output; identity
branches then become true no-ops.

Measures the same noop frame as bench_incremental.py three ways:
  plain    — upd(st, pc), st reused (today's bench pattern)
  donated  — upd_d(st, pc) threading st = out.st each call (st is consumed)
Floor-calibrated. Prints one JSON line; writes PROBE_DONATE.json.

Run: timeout 3000 python benchmarks/probe_donate.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp

    from aosx import incremental
    from aosx.config import BENCH_STATICS as S, AosParams, params_as_f32
    from aosx.orchards import OrchardSpec, make_orchard

    spec = OrchardSpec(
        n_rows=20, row_len=180.0, row_spacing=9.0, tree_spacing=1.0,
        trunk_pts=24, noise_pts=512, origin=(8.0, 8.0), jitter=0.15,
        polygon_pad=2.0,
    )
    pc, poly = make_orchard(jax.random.PRNGKey(0), spec, S)
    params = params_as_f32(AosParams())
    excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)

    # host-loop repeat calls of perceive_update hit the jax 0.9.0 C++
    # fast-path const-drop bug (closed-over poly/params/excl are runtime
    # jaxpr consts; on axon it surfaces as INVALID_ARGUMENT on the 2nd+
    # call — CLAUDE.md) — route through serving.host_jit, like the benches
    from aosx import serving

    init = jax.jit(lambda p: incremental.perceive_init(
        p, poly, params, excl, S, ror_method="sorted"))
    upd = serving.host_jit(lambda st, p: incremental.perceive_update(
        st, p, poly, params, excl, S, ror_method="sorted"))
    upd_d = serving.host_jit_donated(
        lambda st, p: incremental.perceive_update(
            st, p, poly, params, excl, S, ror_method="sorted"),
        donate_argnums=(0,))

    t0 = time.time()
    st = init(pc)
    float(np.asarray(st.world.guards))
    print(f"# init ok ({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)

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

    out = {"metric": "noop_frame_donation_ms_2000x2048"}

    # plain (bench_incremental's pattern): st reused every call
    st2, level = upd(st, pc)
    assert int(np.asarray(level)) == 0
    fl = floor_ms()
    ts = []
    for _ in range(9):
        t = time.perf_counter()
        _, level = upd(st, pc)
        np.asarray(level)
        ts.append((time.perf_counter() - t) * 1e3)
    fl2 = floor_ms()
    out["plain_ms"] = round(float(np.median(ts)) - (fl + fl2) / 2, 3)
    print(f"# plain noop: {out['plain_ms']} ms device", file=sys.stderr,
          flush=True)

    # donated: the carry is consumed, thread it (level-0 keeps st bit-equal)
    st_d, level = upd_d(st2, pc)  # warm the donated executable
    assert int(np.asarray(level)) == 0
    fl = floor_ms()
    ts = []
    for _ in range(9):
        t = time.perf_counter()
        st_d, level = upd_d(st_d, pc)
        np.asarray(level)
        ts.append((time.perf_counter() - t) * 1e3)
    fl2 = floor_ms()
    out["donated_ms"] = round(float(np.median(ts)) - (fl + fl2) / 2, 3)
    out["floor_ms"] = round((fl + fl2) / 2, 1)
    # plain_ms / donated_ms are DEVICE estimates: raw median minus the
    # bracketing in-run floor (so they are legitimately below floor_ms —
    # ADVICE r3 flagged the unannotated artifact as inconsistent). The
    # plain-donated delta shares one measurement window, but per the
    # repo's measurement discipline treat |delta| < ~5 ms as suggestive,
    # not proven, on a shared chip.
    out["note"] = ("plain_ms/donated_ms are floor-subtracted device "
                   "estimates (raw median minus the bracketing floor "
                   "medians); floor_ms is the trivial-jit round-trip")
    print(f"# donated noop: {out['donated_ms']} ms device", file=sys.stderr,
          flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "PROBE_DONATE.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()


