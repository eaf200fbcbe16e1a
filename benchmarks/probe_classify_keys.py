"""Classify ALL Monte-Carlo keys of a sustained-artifact population by the
static feasibility predicate (plancache.tour_feasibility) — build-only, no
episodes, vmapped on-device, so the full 4096-key population takes minutes.

Answers two VERDICT r3 questions directly:
  - straight: is the 1 residual budget-exhausted lane of SUSTAINED.json an
    infeasible world (classified), or a planner trap (residual)?
  - realism: the full-population split capacity / infeasible / feasible
    behind SUSTAINED_REALISM.json's completion rate.

Run: python benchmarks/probe_classify_keys.py [straight|realism] [n] [width]
Writes benchmarks/CLASSIFY_<mode>.json.
"""

import collections
import dataclasses
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

    from aosx import engine, guards
    from aosx.config import (
        MC_REALISM_STATICS, MC_STATICS, AosParams, params_as_f32,
    )
    from aosx.orchards import OrchardSpec, make_orchard
    from aosx.plan import plancache

    mode = sys.argv[1] if len(sys.argv) > 1 else "straight"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    width = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    on_cpu = jax.default_backend() == "cpu"
    S = MC_REALISM_STATICS if mode == "realism" else MC_STATICS
    if on_cpu:
        S = dataclasses.replace(S, jfa_dynamic_shifts=True)
    spec = OrchardSpec(
        n_rows=4, row_len=12.0, row_spacing=3.5, tree_spacing=1.0,
        trunk_pts=16, noise_pts=64, origin=(4.0, 3.0), polygon_pad=1.5,
    )
    if mode == "realism":
        spec = dataclasses.replace(spec, row_curve=0.8, dropout=0.15)
    params = params_as_f32(AosParams())
    keys = jax.random.split(jax.random.PRNGKey(0), max(n, 4096))

    def diag_one(k):
        pc, poly = make_orchard(k, spec, S)
        excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)
        world = engine.prepare_world(pc, poly, params, excl, S,
                                     ror_method="sorted")
        cache = plancache.build_plan_cache(world, params, S)
        feas = plancache.tour_feasibility(cache, world.waypoints, params, S)
        return dict(guards=world.guards, wp=world.waypoints.count,
                    feasible=feas["feasible"], row0_ok=feas["row0_ok"],
                    first_bad_leg=feas["first_bad_leg"],
                    bad_legs=feas["bad_legs"],
                    returnable=feas["returnable"])

    dj = jax.jit(jax.vmap(diag_one))
    t0 = time.time()
    recs = []
    for i in range(0, n, width):
        r = jax.tree_util.tree_map(np.asarray, dj(keys[i:i + width]))
        recs.append(r)
        el = time.time() - t0
        print(f"# {i + width}/{n} classified ({el:.0f}s)",
              file=sys.stderr, flush=True)
    A = {k: np.concatenate([r[k] for r in recs])[:n] for k in recs[0]}

    flagged = A["guards"] != 0
    infeas = (~flagged) & ~A["feasible"]
    flag_counts = collections.Counter()
    for g in A["guards"][flagged]:
        for nm in guards.describe(int(g)):
            flag_counts[nm] += 1
    out = {
        "metric": f"mc_key_classification_{mode}",
        "spec": {"row_curve": spec.row_curve, "dropout": spec.dropout},
        "n": n,
        "capacity_flagged": int(flagged.sum()),
        "guard_flag_counts": dict(flag_counts),
        "infeasible": int(infeas.sum()),
        "feasible": int((~flagged & A["feasible"]).sum()),
        "infeasible_ids": [int(i) for i in np.nonzero(infeas)[0][:128]],
        "flagged_ids": [int(i) for i in np.nonzero(flagged)[0][:128]],
        "first_bad_leg_hist": {
            str(k): int(v) for k, v in sorted(collections.Counter(
                int(x) for x in A["first_bad_leg"][infeas]).items())},
        "not_returnable": int((~flagged & A["feasible"]
                               & ~A["returnable"]).sum()),
        "elapsed_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           f"CLASSIFY_{mode}.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
