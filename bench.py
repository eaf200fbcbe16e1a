"""North-star benchmark (BASELINE.md): full perceive -> GVD -> plan ->
control step latency on a 200 x 200 m grid at 0.1 m resolution (2000 x 2000
cells), HBM-resident, on one TPU chip.

Staged jits (perceive / graph / plan+control) so each program compiles
quickly and the per-stage split is visible on stderr; the reported metric is
the summed step.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = (1 ms north-star target) / measured, so >= 1.0 beats the
target; the reference publishes no numbers (BASELINE.md) and its GVD graph
is rate-capped at 10 Hz (100 ms).
"""

import json
import sys
import time

import numpy as np


def _median_ms(thunk, reps=5):
    import jax

    jax.block_until_ready(thunk())  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(thunk())
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    import os
    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")
    import jax

    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from aosx import engine
    from aosx.config import BENCH_STATICS as S, AosParams, params_as_f32
    from aosx.gvd import build_gvd_graph
    from aosx.orchards import OrchardSpec, make_orchard
    from aosx.perceive import perceive
    from aosx.plan.astar import cost_matrix
    from aosx.plan.mission import build_waypoints

    spec = OrchardSpec(
        n_rows=20,
        row_len=180.0,
        row_spacing=9.0,
        tree_spacing=1.0,
        trunk_pts=24,
        noise_pts=512,
        origin=(8.0, 8.0),
        jitter=0.15,
        polygon_pad=2.0,
    )
    key = jax.random.PRNGKey(0)
    pc, poly = make_orchard(key, spec, S)
    params = params_as_f32(AosParams())
    excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)

    t_start = time.time()

    @jax.jit
    def stage_perceive(pc, poly, params, excl):
        return perceive(pc, poly, params, excl, S, ror_method="mxu")

    out = jax.block_until_ready(stage_perceive(pc, poly, params, excl))
    print(f"# perceive compiled ({time.time() - t_start:.0f}s); "
          f"seeds={int(np.asarray(out.seeds.valid).sum())} "
          f"rows={int(np.asarray(out.rows.valid).sum())}", file=sys.stderr)

    @jax.jit
    def stage_graph(out, params):
        g = build_gvd_graph(out.seeds, out.rows_sorted, out.skeleton, params, S)
        cm = cost_matrix(g, S)
        wp = build_waypoints(g, params, S)
        return g, cm, wp

    g, cm, wp = jax.block_until_ready(stage_graph(out, params))
    print(f"# graph compiled ({time.time() - t_start:.0f}s); "
          f"nodes={int(g.num_nodes)} edges={int(g.num_edges)} "
          f"waypoints={int(wp.count)}", file=sys.stderr)

    @jax.jit
    def stage_plan(out, g, cm, wp, params):
        world = engine.World(
            skeleton=out.skeleton, occupancy=out.occupancy, graph=g,
            costmat=cm, waypoints=wp,
        )
        st0 = engine.initial_state(world, S)
        st1, metrics = engine.step(st0, world, params, S)
        return metrics["mod"], metrics["plan_len"]

    jax.block_until_ready(stage_plan(out, g, cm, wp, params))
    print(f"# plan compiled ({time.time() - t_start:.0f}s)", file=sys.stderr)

    t_perceive = _median_ms(lambda: stage_perceive(pc, poly, params, excl))
    t_graph = _median_ms(lambda: stage_graph(out, params))
    t_plan = _median_ms(lambda: stage_plan(out, g, cm, wp, params))
    value = t_perceive + t_graph + t_plan
    print(
        f"# stages ms: perceive={t_perceive:.2f} graph={t_graph:.2f} "
        f"plan+control={t_plan:.2f}",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "perceive_gvd_plan_control_step_ms_2000x2000",
                "value": round(value, 3),
                "unit": "ms",
                "vs_baseline": round(1.0 / value, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
