"""Width-divergence probe for the UNCACHED batched rollout path.

SUSTAINED_256.json (post-fix re-measure, 2026-08-20) shows 19/4096
budget-exhausted at 256 lanes vs 1/4096 at 128 lanes, with CLUSTERED
consecutive ids (3951-3953, 3956) — and the exhausted keys complete
comfortably single-instance on CPU (~870 steps of 1200). That is the
round-3 vmap-width miscompile signature (CLAUDE.md: the axon toolchain
broke a 3-level nest at lane width >= 16 on the cached path; 2-level nests
were verified good at width 128 — nothing ever verified width 256).

Protocol (the round-3 recipe): build ONE world (a key that exhausted at
256 lanes), tile it into every lane, run the chunked uncached engine at
several widths. All lanes carry IDENTICAL state, so any per-lane
divergence — or any width whose lanes disagree with the single-instance
run — is a compile defect, not data. Prints CLEAN/BROKEN per width.

Run: python benchmarks/probe_width_uncached.py [kid] [widths...] [serial] [cached]
  serial: set Statics.astar_serial_candidates (the miscompile valve)
  cached: check the PLAN-CACHED step path instead (step_cached tiled to
          each width - the production MC path; verifies the audit rule at
          4096 lanes explicitly rather than inferring it from completion-
          gated artifacts)
Writes benchmarks/WIDTH_UNCACHED[_SERIAL|_CACHED].json.
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


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp

    from aosx import engine
    from aosx.config import MC_STATICS, AosParams, params_as_f32
    from aosx.orchards import OrchardSpec, make_orchard
    from aosx.parallel.batch import (
        _acc_init, rollout_chunk, rollout_chunk_cached, rollout_finish,
    )
    from aosx.plan import plancache
    from aosx.serving import host_jit

    serial = "serial" in sys.argv[1:]
    cached = "cached" in sys.argv[1:]
    argv = [a for a in sys.argv[1:] if a not in ("serial", "cached")]
    kid = int(argv[0]) if len(argv) > 0 else 3951
    widths = [int(a) for a in argv[1:]] or [8, 64, 128, 256]
    S = MC_STATICS
    if serial:  # the miscompile valve (config.astar_serial_candidates)
        S = dataclasses.replace(S, astar_serial_candidates=True)
    if jax.default_backend() == "cpu":
        S = dataclasses.replace(S, jfa_dynamic_shifts=True)
    spec = OrchardSpec(
        n_rows=4, row_len=12.0, row_spacing=3.5, tree_spacing=1.0,
        trunk_pts=16, noise_pts=64, origin=(4.0, 3.0), polygon_pad=1.5,
    )
    params = params_as_f32(AosParams())
    key = jax.random.split(jax.random.PRNGKey(0), 4096)[kid]

    t0 = time.time()
    pc, poly = make_orchard(key, spec, S)
    excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)
    world = jax.jit(lambda pc, poly: engine.prepare_world(
        pc, poly, params, excl, S, ror_method="sorted"))(pc, poly)
    jax.block_until_ready(world)
    if cached:
        cache1 = jax.jit(lambda w: plancache.build_plan_cache(
            w, params, S))(world)
        import dataclasses as _dc2
        cache1 = _dc2.replace(cache1, plan_yaw=cache1.plan_yaw[:, :0])
        lite1 = plancache.world_lite(world)
        st1 = plancache.initial_cached_state(world, S)
        jax.block_until_ready(cache1)
    print(f"# world built ({time.time() - t0:.0f}s)", file=sys.stderr,
          flush=True)

    def tile(tree, Wd):
        return jax.tree_util.tree_map(
            lambda x: jnp.tile(jnp.asarray(x)[None],
                               (Wd,) + (1,) * jnp.asarray(x).ndim), tree)

    # single-instance ground truth (same chunked code at width 1)
    def run_width(Wd):
        acc = tile(_acc_init(S, BUDGET), Wd)
        if cached:
            lb, cb, st = tile(lite1, Wd), tile(cache1, Wd), tile(st1, Wd)
            chunk = host_jit(jax.vmap(
                lambda l, c, st, acc, off: rollout_chunk_cached(
                    l, c, st, acc, params, S, CHUNK, off),
                in_axes=(0, 0, 0, 0, None)))
            for c in range(BUDGET // CHUNK):
                st, acc = chunk(lb, cb, st, acc, jnp.int32(c * CHUNK))
        else:
            wb = tile(world, Wd)
            st = jax.vmap(lambda w: engine.initial_state(w, S))(wb)
            chunk = host_jit(jax.vmap(
                lambda w, st, acc, off: rollout_chunk(w, st, acc, params, S,
                                                      CHUNK, off),
                in_axes=(0, 0, 0, None)))
            for c in range(BUDGET // CHUNK):
                st, acc = chunk(wb, st, acc, jnp.int32(c * CHUNK))
        out = jax.tree_util.tree_map(
            np.asarray, host_jit(jax.vmap(
                lambda st, acc: rollout_finish(st, acc, S)))(st, acc))
        return out

    t0 = time.time()
    ref = run_width(1)
    ref1 = {k: v[0] for k, v in ref.items()}
    print(f"# width 1: completed={bool(ref1['completed'])} "
          f"steps={int(ref1['steps_to_complete'])} "
          f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)

    results = {"metric": ("cached_width_divergence" if cached
                          else "uncached_width_divergence"), "key": kid,
               "astar_serial_candidates": serial,
               "single": {"completed": bool(ref1["completed"]),
                          "steps": int(ref1["steps_to_complete"])},
               "widths": {}}
    for Wd in widths:
        t0 = time.time()
        out = run_width(Wd)
        comp = out["completed"].astype(bool)
        steps = out["steps_to_complete"]
        lanes_equal = all(
            np.array_equal(out[k], np.repeat(out[k][:1], Wd, axis=0))
            for k in out)
        match_single = bool(comp.all() == ref1["completed"]) and \
            np.array_equal(np.unique(steps), [ref1["steps_to_complete"]])
        broken_lanes = [int(i) for i in np.nonzero(
            (comp != bool(ref1["completed"]))
            | (steps != int(ref1["steps_to_complete"])))[0][:32]]
        verdict = "CLEAN" if (lanes_equal and match_single) else "BROKEN"
        print(f"# width {Wd}: {verdict} completed={int(comp.sum())}/{Wd} "
              f"lanes_equal={lanes_equal} broken_lanes={broken_lanes} "
              f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)
        results["widths"][str(Wd)] = {
            "verdict": verdict, "completed": int(comp.sum()),
            "lanes_equal": bool(lanes_equal),
            "broken_lanes": broken_lanes,
        }

    print(json.dumps(results))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "WIDTH_CACHED.json" if cached else
                           ("WIDTH_UNCACHED_SERIAL.json" if serial
                            else "WIDTH_UNCACHED.json")), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
