"""BASELINE config 5: batched Monte-Carlo rollout throughput.

Measures vmapped full rollouts (orchard generation -> perceive -> GVD ->
closed-loop episode) per chip on the real TPU, and reports the projected
v5e-8 number (rollouts are embarrassingly parallel across chips - the
shard_map path is validated for equality in tests/test_parallel.py).

Run: python benchmarks/bench_rollouts.py [batch] [steps]
"""

import json
import sys as _sys
import os as _os
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import os
import sys
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp

    from aosx.config import DRYRUN_STATICS as S, AosParams, params_as_f32
    from aosx.orchards import OrchardSpec
    from aosx.parallel.batch import batched_rollouts

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 400

    spec = OrchardSpec(
        n_rows=2, row_len=4.0, row_spacing=2.0, tree_spacing=1.0,
        trunk_pts=10, noise_pts=16, origin=(2.0, 2.0), polygon_pad=1.0,
    )
    params = params_as_f32(AosParams())
    keys = jax.random.split(jax.random.PRNGKey(0), batch)

    @jax.jit
    def run(keys):
        out = batched_rollouts(keys, spec, params, S, steps, ror_method="sorted")
        return out, jnp.sum(out["travel_distance"])

    t0 = time.time()
    out, pv = run(keys)
    float(pv)
    compile_s = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out, pv = run(keys)
        float(pv)
        times.append(time.perf_counter() - t0)
    sec = float(np.median(times))
    done = int(np.asarray(out["completed"]).sum())
    rps = batch / sec
    print(
        json.dumps(
            {
                "metric": "mc_rollouts_per_sec_per_chip",
                "batch": batch,
                "steps_per_rollout": steps,
                "completed": done,
                "seconds_per_batch": round(sec, 3),
                "rollouts_per_sec_per_chip": round(rps, 2),
                "projected_v5e8_rollouts_per_sec": round(8 * rps, 2),
                "compile_s": round(compile_s, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
