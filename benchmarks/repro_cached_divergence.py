"""Episode-level plain-vs-cached differential at the exact bench MC statics.

HISTORY: written while hunting the SUSTAINED_CACHED completion gap
(2026-08-19: cached sustained completed 573/4096 vs 4083/4096 uncached).
This CPU episode-level check stays GREEN — the gap was an axon-TPU
miscompile of the 3-level vmap nest in the lane-batched cache build
(lanes x rows x astar-candidates, lane width >= 16), fixed by lax.map over
rows in plan/plancache.py. The on-chip minimal repro + per-width verdict
lives in benchmarks/probe_vmap_nest_miscompile.py; this script remains the
cheap CPU-side semantic differential for future cached-path regressions.

Run: PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python benchmarks/repro_cached_divergence.py
"""

import dataclasses
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

from aosx import engine
from aosx.config import TEST_STATICS, AosParams, params_as_f32
from aosx.orchards import OrchardSpec, make_orchard
from aosx.plan import plancache

S = dataclasses.replace(TEST_STATICS, jfa_dynamic_shifts=False,
                        exact_fallbacks=False, max_plan=1024)
spec = OrchardSpec(
    n_rows=4, row_len=12.0, row_spacing=3.5, tree_spacing=1.0,
    trunk_pts=16, noise_pts=64, origin=(4.0, 3.0), polygon_pad=1.5,
)
params = params_as_f32(AosParams())
N_STEPS = 1200

keys = jax.random.split(jax.random.PRNGKey(0), 8)
excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)
build = jax.jit(lambda pc, poly: engine.prepare_world(
    pc, poly, params, excl, S, ror_method="sorted"))
run = jax.jit(lambda w, p: engine.episode(w, p, S, N_STEPS))
run_c = jax.jit(lambda w, p: plancache.episode_cached(w, p, S, N_STEPS))

for i in range(4):
    pc, poly = make_orchard(keys[i], spec, S)
    w = build(pc, poly)
    final, m = run(w, params)
    final_c, m_c = run_c(w, params)
    done = bool(np.asarray(final.mission.exploration_completed))
    done_c = bool(np.asarray(final_c.mission.exploration_completed))
    print(f"orchard {i}: plain completed={done}  cached completed={done_c}",
          flush=True)
    if done == done_c:
        # still compare metrics bitwise for silent drift
        bad = [k for k in m
               if not np.array_equal(np.asarray(m[k]), np.asarray(m_c[k]))]
        print(f"  divergent metrics: {bad or 'none'}", flush=True)
        continue
    # find first divergent tick per metric
    for k in sorted(m):
        a, b = np.asarray(m[k]), np.asarray(m_c[k])
        if not np.array_equal(a, b):
            neq = np.nonzero(~np.isclose(a, b, equal_nan=True).reshape(a.shape[0], -1).all(axis=1))[0]
            t0 = int(neq[0]) if len(neq) else -1
            print(f"  metric {k!r} first diverges at t={t0}: "
                  f"plain={a[t0]!r} cached={b[t0]!r}", flush=True)
    # dump state around the first divergence of target_wp
    a, b = np.asarray(m["target_wp"]), np.asarray(m_c["target_wp"])
    neq = np.nonzero(a != b)[0]
    if len(neq):
        t0 = int(neq[0])
        lo, hi = max(0, t0 - 3), min(N_STEPS, t0 + 3)
        for t in range(lo, hi):
            print(f"  t={t} plain(wp={a[t]}, mod={np.asarray(m['mod'])[t]}, "
                  f"xy={np.asarray(m['xy'])[t]}) "
                  f"cached(wp={b[t]}, mod={np.asarray(m_c['mod'])[t]}, "
                  f"xy={np.asarray(m_c['xy'])[t]})", flush=True)
    break
