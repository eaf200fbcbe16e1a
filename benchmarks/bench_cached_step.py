"""Steady-state closed-loop tick latency on the north-star world
(BENCH_STATICS, 2000x2048 @ 0.1 m): plan/plancache.step_cached per-tick
device cost, amortized inside one device call.

The reference replans on EVERY position message (currentPosCallback,
aos_path_gen_node.cpp:195-278), so its closed-loop tick cost includes a
full A* + linearization. On a static world the plan cache is bit-identical
to that per-tick replanning (tests/test_plancache.py), so the production
per-tick cost is step_cached: mission FSM + cache row select + control mode
+ kinematics — no grid, no graph, no A*, no lockstep while_loops. This is
the honest "<1 ms" claim shape: the full perceive->GVD->plan work happens
once per MAP CHANGE (bench.py / incremental levels), not per control tick.

Measures, in one process:
  1. per-tick device cost: one jit scanning K ticks, timed over the scan
     minus the calibrated tunnel floor, divided by K;
  2. plan-cache build cost (once per world change): build_plan_cache +
     world_lite as one jit;
  3. the trivial-jit tunnel floor for calibration (CLAUDE.md protocol).

Writes benchmarks/CACHED_STEP.json.
"""

import json
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import time

import numpy as np


def _median_ms(fn, reps=5):
    fn()  # compile + warm
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(ts))


def main():
    import jax

    smoke = "--cpu-smoke" in _sys.argv  # validate the script without a chip
    if smoke:
        _sys.argv.remove("--cpu-smoke")
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp

    from aosx import engine
    from aosx.config import BENCH_STATICS, TEST_STATICS, AosParams, params_as_f32
    from aosx.orchards import OrchardSpec, make_orchard
    from aosx.plan import plancache

    S = TEST_STATICS if smoke else BENCH_STATICS
    K = int(_sys.argv[1]) if len(_sys.argv) > 1 else 1000

    spec = OrchardSpec(
        n_rows=4, row_len=12.0, row_spacing=3.5, tree_spacing=1.0,
        trunk_pts=16, noise_pts=64, origin=(4.0, 3.0), polygon_pad=1.5,
    ) if smoke else OrchardSpec(
        n_rows=20, row_len=180.0, row_spacing=9.0, tree_spacing=1.0,
        trunk_pts=24, noise_pts=512, origin=(8.0, 8.0), jitter=0.15,
        polygon_pad=2.0,
    )
    pc, poly = make_orchard(jax.random.PRNGKey(0), spec, S)
    params = params_as_f32(AosParams())
    excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)

    # tunnel floor calibration (CLAUDE.md round-2 measurement lessons)
    @jax.jit
    def trivial(x):
        return jnp.sum(x * 2)

    xsmall = jnp.ones((8, 128), jnp.float32)
    floor_ms = _median_ms(lambda: float(np.asarray(trivial(xsmall))))
    print(f"# tunnel floor: {floor_ms:.1f} ms", file=_sys.stderr, flush=True)

    t0 = time.time()
    world = jax.jit(
        lambda pc, poly, pr, ex: engine.prepare_world(
            pc, poly, pr, ex, S, ror_method="sorted")
    )(pc, poly, params, excl)
    jax.block_until_ready(world)
    print(f"# world built ({time.time() - t0:.0f}s)", file=_sys.stderr,
          flush=True)

    @jax.jit
    def build(world):
        cache = plancache.build_plan_cache(world, params, S)
        return cache, plancache.world_lite(world)

    cache, lite = build(world)
    build_ms = _median_ms(
        lambda: float(np.asarray(build(world)[0].plan_count[0]))
    )
    print(f"# cache build: {build_ms:.1f} ms reported "
          f"({build_ms - floor_ms:.1f} device)", file=_sys.stderr, flush=True)

    st0 = plancache.initial_cached_state(world, S)

    @jax.jit
    def ticks(st, lite, cache):
        def body(st, _):
            st, m = plancache.step_cached(st, lite, cache, params, S)
            return st, None

        st, _ = jax.lax.scan(body, st, None, length=K)
        return st.robot.xy + jnp.float32(st.t)

    scan_ms = _median_ms(lambda: float(np.asarray(ticks(st0, lite, cache))[0]))
    per_tick_us = (scan_ms - floor_ms) / K * 1e3
    print(f"# {K}-tick scan: {scan_ms:.1f} ms reported -> "
          f"{per_tick_us:.1f} us/tick device", file=_sys.stderr, flush=True)

    result = {
        "metric": ("cached_closed_loop_tick_us_cpu_smoke" if smoke
                   else "cached_closed_loop_tick_us_2000x2000"),
        "per_tick_device_us": round(per_tick_us, 2),
        "scan_len": K,
        "scan_reported_ms": round(scan_ms, 2),
        "tunnel_floor_ms": round(floor_ms, 2),
        "cache_build_reported_ms": round(build_ms, 2),
        "cache_build_device_ms": round(build_ms - floor_ms, 2),
        "note": "bit-identical to replanning every tick on a static world "
                "(tests/test_plancache.py); a map change pays the "
                "incremental-update levels (INCREMENTAL.json) + this build",
    }
    print(json.dumps(result))
    out = "CACHED_STEP_SMOKE.json" if smoke else "CACHED_STEP.json"
    with open(_os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                            out), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
