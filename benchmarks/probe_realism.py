"""Why do curved-rows/dropout worlds flag guards and exhaust budgets?

SUSTAINED_REALISM.json (row_curve=0.8, dropout=0.15, 4096 rollouts): 690
guard-flagged lanes and 2187 budget-exhausted vs 0/13 on straight rows.
This probe builds a sample of the SAME worlds (same PRNGKey(0) split) on
CPU, names which guard bits fire, and runs a full fixed-budget episode on
a few keys to separate:
  (a) world-build capacity overflows (caps sized for straight rows), from
  (b) planner traps (mission never completes on a navigable world).

Run: PYTHONPATH= JAX_PLATFORMS=cpu python benchmarks/probe_realism.py [n]
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

    if jax.default_backend() != "cpu":
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    import jax.numpy as jnp

    from aosx import guards
    from aosx.config import TEST_STATICS, AosParams, params_as_f32
    from aosx.orchards import OrchardSpec
    from aosx.parallel.batch import rollout_one

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    S = dataclasses.replace(TEST_STATICS, jfa_dynamic_shifts=False,
                            exact_fallbacks=False, max_plan=1024)
    spec = OrchardSpec(
        n_rows=4, row_len=12.0, row_spacing=3.5, tree_spacing=1.0,
        trunk_pts=16, noise_pts=64, origin=(4.0, 3.0), polygon_pad=1.5,
        row_curve=0.8, dropout=0.15,
    )
    params = params_as_f32(AosParams())
    keys = jax.random.split(jax.random.PRNGKey(0), 4096)

    ro = jax.jit(lambda k: rollout_one(k, spec, params, S, 1200,
                                       ror_method="sorted"))
    flag_counts = collections.Counter()
    rows = []
    t0 = time.time()
    for i in range(n):
        r = jax.tree_util.tree_map(np.asarray, ro(keys[i]))
        g = int(r["guards"])
        names = guards.describe(g) if g else []
        for nm in names:
            flag_counts[nm] += 1
        rows.append({
            "key": i,
            "completed": bool(r["completed"]),
            "steps": int(r["steps_to_complete"]),
            "travel": round(float(r["travel_distance"]), 1),
            "guards": names,
        })
        print(f"# key {i}: completed={rows[-1]['completed']} "
              f"steps={rows[-1]['steps']} guards={names}",
              file=sys.stderr, flush=True)
    out = {
        "metric": "realism_world_diagnosis",
        "n": n,
        "completed": sum(r["completed"] for r in rows),
        "flag_counts": dict(flag_counts),
        "exhausted_keys": [r["key"] for r in rows if not r["completed"]],
        "flagged_keys": [r["key"] for r in rows if r["guards"]],
        "elapsed_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
