"""Which guard bits do realism worlds (curved rows + dropout) trip at WORLD
BUILD time? Cheaper sibling of probe_realism.py: builds N worlds (no
episodes) and tallies guard bits, so cap-sizing decisions don't need 1200
ticks per key.

Run: PYTHONPATH= JAX_PLATFORMS=cpu python benchmarks/probe_realism_flags.py [n]
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

    from aosx import engine, guards
    from aosx.config import TEST_STATICS, AosParams, params_as_f32
    from aosx.orchards import OrchardSpec, make_orchard

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    S = dataclasses.replace(TEST_STATICS, jfa_dynamic_shifts=False,
                            exact_fallbacks=False, max_plan=1024)
    spec = OrchardSpec(
        n_rows=4, row_len=12.0, row_spacing=3.5, tree_spacing=1.0,
        trunk_pts=16, noise_pts=64, origin=(4.0, 3.0), polygon_pad=1.5,
        row_curve=0.8, dropout=0.15,
    )
    params = params_as_f32(AosParams())
    keys = jax.random.split(jax.random.PRNGKey(0), 4096)
    excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)

    def build(k):
        pc, poly = make_orchard(k, spec, S)
        w = engine.prepare_world(pc, poly, params, excl, S, ror_method="sorted")
        return dict(guards=w.guards, wp_count=w.waypoints.count,
                    num_nodes=w.graph.num_nodes, num_edges=w.graph.num_edges)

    bj = jax.jit(build)
    flag_counts = collections.Counter()
    flagged = []
    t0 = time.time()
    for i in range(n):
        r = jax.tree_util.tree_map(np.asarray, bj(keys[i]))
        g = int(r["guards"])
        for nm in guards.describe(g):
            flag_counts[nm] += 1
        if g:
            flagged.append(i)
        print(f"# key {i}: guards={guards.describe(g)} wp={int(r['wp_count'])} "
              f"nodes={int(r['num_nodes'])} edges={int(r['num_edges'])}",
              file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": "realism_world_build_guard_flags",
        "n": n,
        "flag_counts": dict(flag_counts),
        "flagged_keys": flagged,
        "elapsed_s": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
