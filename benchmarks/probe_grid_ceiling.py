"""Measure the single-chip grid ceiling (VERDICT r3 #7): the largest
(H, W) occupancy grid the FULL pipeline (prepare_world + one engine step)
runs at on one v5e, with wall time per size. This turns A7's "CCL/graph
sharding out of scope for one-chip-sized maps" rationale from an assertion
into a measured fact: if the ceiling comfortably covers >200 m maps
(SURVEY §5), the scoping holds.

Strategy: try growing grids (0.05 m res, so 4000 cells = 200 m) with an
orchard scaled to fill them; stop at the first failure (RESOURCE_EXHAUSTED
or compile/dispatch error) and record the last success. Caps scale with the
orchard so guard bits stay honest.

Run: timeout 3600 python benchmarks/probe_grid_ceiling.py
Writes benchmarks/GRID_CEILING.json.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (grid_h, grid_w, n_rows, row_len): 0.05 m/cell -> meters = cells/20
SIZES = [
    (2000, 2048, 10, 90.0),     # 100x102 m (sanity; ~bench scale at 0.05)
    (4000, 4096, 20, 190.0),    # 200x205 m — the SURVEY >200 m threshold
    (6000, 6144, 30, 290.0),    # 300x307 m
    (8000, 8192, 40, 390.0),    # 400x410 m
]


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp

    from aosx import engine, guards
    from aosx.config import Statics, AosParams, params_as_f32
    from aosx.orchards import OrchardSpec, make_orchard
    from aosx.plan.mission import trim_distance_plane

    params = params_as_f32(AosParams())
    results = []
    for (H, W, n_rows, row_len) in SIZES:
        # round 5 (VERDICT r4 missing #1): the cap scaling this probe used
        # to apply by hand is now the library derivation Statics.for_grid —
        # the probe measures what a user gets out of the box. for_grid also
        # sizes the cluster band and the CSR A* caps (the round-4 dense
        # [N, N] costmat capped nodes at 16384 = 1 GB; CSR is O(N * D)).
        # jfa_pass_pallas=True is safe: gvd/voronoi.py auto-valves the
        # Pallas tier at >= 4000 grid rows (the remote compile crash).
        S = Statics.for_grid(H, W, resolution=0.05)
        spec = OrchardSpec(
            n_rows=n_rows, row_len=row_len, row_spacing=9.0,
            tree_spacing=1.0, trunk_pts=12, noise_pts=512,
            origin=(8.0, 8.0), jitter=0.15, polygon_pad=2.0,
        )
        rec = {"grid": [H, W], "meters": [round(H * 0.05), round(W * 0.05)],
               "rows": n_rows}
        t0 = time.time()
        for attempt in range(2):  # one retry: the tunnel compiler has
            #                       transient HTTP-500 windows (CLAUDE.md)
            try:
                key = jax.random.PRNGKey(0)
                pc, poly = make_orchard(key, spec, S)
                excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)

                @jax.jit
                def full(pc, poly, params, excl):
                    world = engine.prepare_world(pc, poly, params, excl, S,
                                                 ror_method="sorted")
                    st0 = engine.initial_state(world, S)
                    st1, m = engine.step(st0, world, params, S)
                    return (m["plan_len"].astype(jnp.float32) + m["mod"],
                            world.guards, world.graph.num_nodes)

                out = full(pc, poly, params, excl)
                float(out[0])  # sync
                rec["compile_plus_first_call_s"] = round(time.time() - t0, 1)
                ts = []
                for _ in range(3):
                    t1 = time.perf_counter()
                    out = full(pc, poly, params, excl)
                    float(out[0])
                    ts.append((time.perf_counter() - t1) * 1e3)
                rec["step_ms"] = round(float(np.median(ts)), 1)
                rec["guards"] = guards.describe(int(out[1]))
                rec["nodes"] = int(out[2])
                rec["ok"] = True
                print(f"# {H}x{W}: OK step={rec['step_ms']} ms "
                      f"nodes={rec['nodes']} guards={rec['guards']}",
                      file=sys.stderr, flush=True)
                break
            except Exception as e:  # noqa: BLE001 — the failure IS the datum
                rec["ok"] = False
                rec["error"] = f"{type(e).__name__}: {str(e)[:400]}"
                print(f"# {H}x{W}: FAILED (attempt {attempt + 1}) "
                      f"{rec['error']}", file=sys.stderr, flush=True)
                time.sleep(60)
        results.append(rec)
        if not rec["ok"]:
            break

    ceiling = None
    for r in results:
        if r.get("ok"):
            ceiling = r
    out = {
        "metric": "single_chip_grid_ceiling",
        "resolution_m": 0.05,
        "sizes": results,
        "ceiling_grid": ceiling["grid"] if ceiling else None,
        "ceiling_meters": ceiling["meters"] if ceiling else None,
        "note": "largest (H, W) where prepare_world + one engine step runs "
                "on one v5e; A7's sharding-scope rationale rests on this "
                "covering the SURVEY >200 m threshold",
    }
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "GRID_CEILING.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
