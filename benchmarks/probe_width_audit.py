"""STANDING vmap-width miscompile audit (VERDICT r4 weak #3 / next #4).

The axon TPU toolchain has twice miscompiled production vmap widths into
silently wrong results (round 3: 3-level nest at width >= 16; round 4: the
2-level uncached A* nest at width 256 — CLAUDE.md audit rule). The round-4
verification was one key deep and straight-row only; this probe is the
standing, multi-key regression to re-run every round and after ANY libtpu /
toolchain change:

    {straight, realism} presets x {cached, uncached} paths
    x widths {128, 256, 1024, 4096 cached | 128, 256 uncached}
    x >= 3 population keys

Protocol per cell (the proven recipe): build ONE world from the key, tile
it into every lane, run the chunked production path at each width. All
lanes carry identical state, so ANY per-lane divergence — or disagreement
with the width-1 run of the same code — is a compile defect, not data. The
uncached path runs the same lowering production uses (parallel.batch.
width_valve force-enables astar_serial_candidates above 128 lanes), so the
audit certifies what users actually execute. Divergence is checked over
EVERY rollout_finish field (completed/steps/travel/final-dist/status/
guards), so infeasible realism keys still audit meaningfully.

Run: timeout 5400 python benchmarks/probe_width_audit.py [quick]
  quick: one key, widths {128, 256}, straight preset only (smoke)
Writes benchmarks/WIDTH_AUDIT.json (single committed artifact).
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUDGET = 1200
CHUNK = 150
KEYS = [3951, 942, 7]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp

    from aosx import engine
    from aosx.config import (
        MC_REALISM_STATICS, MC_STATICS, AosParams, params_as_f32,
    )
    from aosx.orchards import OrchardSpec, make_orchard
    from aosx.parallel.batch import (
        _acc_init, rollout_chunk, rollout_chunk_cached, rollout_finish,
        width_valve,
    )
    from aosx.plan import plancache
    from aosx.serving import host_jit

    quick = "quick" in sys.argv[1:]
    params = params_as_f32(AosParams())
    spec0 = OrchardSpec(
        n_rows=4, row_len=12.0, row_spacing=3.5, tree_spacing=1.0,
        trunk_pts=16, noise_pts=64, origin=(4.0, 3.0), polygon_pad=1.5,
    )
    presets = {
        "straight": (MC_STATICS, spec0),
        "realism": (MC_REALISM_STATICS,
                    dataclasses.replace(spec0, row_curve=0.8, dropout=0.15)),
    }
    if quick:
        presets = {"straight": presets["straight"]}
    keys = KEYS[:1] if quick else KEYS
    widths_for = {
        "cached": [128, 256] if quick else [128, 256, 1024, 4096],
        "uncached": [128, 256],
    }

    def tile(tree, Wd):
        return jax.tree_util.tree_map(
            lambda x: jnp.tile(jnp.asarray(x)[None],
                               (Wd,) + (1,) * jnp.asarray(x).ndim), tree)

    def build(S, spec, kid):
        key = jax.random.split(jax.random.PRNGKey(0), 4096)[kid]
        pc, poly = make_orchard(key, spec, S)
        excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)
        world = jax.jit(lambda pc, poly: engine.prepare_world(
            pc, poly, params, excl, S, ror_method="sorted"))(pc, poly)
        jax.block_until_ready(world)
        return world

    def run_width(S, world, Wd, cached):
        acc = tile(_acc_init(S, BUDGET), Wd)
        if cached:
            cache1 = jax.jit(lambda w: plancache.build_plan_cache(
                w, params, S))(world)
            cache1 = dataclasses.replace(cache1,
                                         plan_yaw=cache1.plan_yaw[:, :0])
            lb = tile(plancache.world_lite(world), Wd)
            cb = tile(cache1, Wd)
            st = tile(plancache.initial_cached_state(world, S), Wd)
            chunk = host_jit(jax.vmap(
                lambda l, c, st, acc, off: rollout_chunk_cached(
                    l, c, st, acc, params, S, CHUNK, off),
                in_axes=(0, 0, 0, 0, None)))
            for c in range(BUDGET // CHUNK):
                st, acc = chunk(lb, cb, st, acc, jnp.int32(c * CHUNK))
        else:
            Sv = width_valve(S, Wd)  # the PRODUCTION lowering at this width
            wb = tile(world, Wd)
            st = jax.vmap(lambda w: engine.initial_state(w, Sv))(wb)
            chunk = host_jit(jax.vmap(
                lambda w, st, acc, off: rollout_chunk(w, st, acc, params,
                                                      Sv, CHUNK, off),
                in_axes=(0, 0, 0, None)))
            for c in range(BUDGET // CHUNK):
                st, acc = chunk(wb, st, acc, jnp.int32(c * CHUNK))
        return jax.tree_util.tree_map(
            np.asarray, host_jit(jax.vmap(
                lambda st, acc: rollout_finish(st, acc, S)))(st, acc))

    art = {"metric": "width_audit", "budget": BUDGET,
           "keys": keys, "cells": [], "broken": 0}
    for pname, (S, spec) in presets.items():
        if jax.default_backend() == "cpu":
            S = dataclasses.replace(S, jfa_dynamic_shifts=True)
        for kid in keys:
            t0 = time.time()
            world = build(S, spec, kid)
            print(f"# [{pname} key {kid}] world built "
                  f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)
            for mode in ("cached", "uncached"):
                ref = run_width(S, world, 1, mode == "cached")
                ref1 = {k: v[0] for k, v in ref.items()}
                for Wd in widths_for[mode]:
                    t0 = time.time()
                    out = run_width(S, world, Wd, mode == "cached")
                    lanes_equal = all(
                        np.array_equal(out[k],
                                       np.repeat(out[k][:1], Wd, axis=0))
                        for k in out)
                    match_single = all(
                        np.array_equal(out[k][0], ref1[k]) for k in out)
                    verdict = ("CLEAN" if lanes_equal and match_single
                               else "BROKEN")
                    cell = {
                        "preset": pname, "key": kid, "mode": mode,
                        "width": Wd, "verdict": verdict,
                        "completed": int(out["completed"].sum()),
                        "lanes_equal": bool(lanes_equal),
                        "match_single": bool(match_single),
                    }
                    art["cells"].append(cell)
                    art["broken"] += verdict == "BROKEN"
                    print(f"# [{pname} key {kid} {mode} w{Wd}] {verdict} "
                          f"completed={cell['completed']}/{Wd} "
                          f"({time.time() - t0:.0f}s)",
                          file=sys.stderr, flush=True)

    art["verdict"] = "CLEAN" if art["broken"] == 0 else "BROKEN"
    art["measured_at"] = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    art["backend"] = jax.default_backend()
    print(json.dumps(art))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "WIDTH_AUDIT.json"), "w") as f:
        json.dump(art, f, indent=1)


if __name__ == "__main__":
    main()
