"""North-star benchmark (BASELINE.md): full perceive -> GVD -> plan ->
control step latency on a 200 x 200 m grid at 0.1 m resolution (2000 x 2000
cells), HBM-resident, on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = (1 ms north-star target) / measured, so >= 1.0 beats the
target; the reference publishes no numbers (BASELINE.md) and its GVD graph
is rate-capped at 10 Hz (100 ms).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from aosx import engine
    from aosx.config import BENCH_STATICS as S, AosParams, params_as_f32
    from aosx.orchards import OrchardSpec, make_orchard

    # a full-size orchard: 20 rows x 180 m inside the 200x200 m area
    spec = OrchardSpec(
        n_rows=20,
        row_len=180.0,
        row_spacing=9.0,
        tree_spacing=1.5,
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

    @jax.jit
    def full_step(pc, poly, params, excl):
        world = engine.prepare_world(pc, poly, params, excl, S, ror_method="mxu")
        st0 = engine.initial_state(world, S)
        st1, metrics = engine.step(st0, world, params, S)
        return world.graph.num_nodes, world.waypoints.count, metrics["mod"]

    # warmup / compile
    out = jax.block_until_ready(full_step(pc, poly, params, excl))
    print(f"# compiled; nodes={int(out[0])} waypoints={int(out[1])}", file=sys.stderr)

    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(full_step(pc, poly, params, excl))
        times.append((time.perf_counter() - t0) * 1e3)
    value = float(np.median(times))
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
