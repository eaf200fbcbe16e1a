"""Who are the 13 budget-exhausted rollouts, and are they slow or STUCK?

Every sustained artifact (128/256/512/1024 lanes, cached and uncached)
records exactly 4083/4096 completed with 13 budget-exhausted — the same
per-key deterministic set (keys are split(PRNGKey(0), 4096)). This probe
(1) reruns the cached sustained config and prints the exhausted key
indices + their summaries, then (2) reruns JUST those keys with a 4x step
budget (no refill, plain vmap) to classify them:
  - complete at 4x -> honestly slow missions (long tours on big worlds)
  - still incomplete -> the planner is stuck (bug or unreachable waypoint:
    investigate on CPU with a rendered episode)

Writes benchmarks/EXHAUSTED.json. Run: timeout 3600 python benchmarks/probe_exhausted.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    import jax.numpy as jnp

    t = time.time()
    assert float(np.asarray(jnp.ones((8, 128)) * 2).sum()) == 2048.0
    print(f"# chip alive ({(time.time() - t) * 1e3:.0f} ms)", file=sys.stderr,
          flush=True)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import dataclasses

    from aosx.config import TEST_STATICS, AosParams, params_as_f32
    from aosx.orchards import OrchardSpec
    from aosx.parallel.batch import sustained_rollouts

    # EXACTLY bench_sustained.py's MC config
    S = dataclasses.replace(TEST_STATICS, jfa_dynamic_shifts=False,
                            exact_fallbacks=False, max_plan=1024)
    spec = OrchardSpec(
        n_rows=4, row_len=12.0, row_spacing=3.5, tree_spacing=1.0,
        trunk_pts=16, noise_pts=64, origin=(4.0, 3.0), polygon_pad=1.5,
    )
    params = params_as_f32(AosParams())
    total, budget = 4096, 1200

    res, _ = sustained_rollouts(
        total, 1024, spec, params, S, budget, chunk_steps=150, refill=128,
        ror_method="sorted", cached=True)
    bad = np.nonzero(~res["completed"])[0]
    print(f"# exhausted ids: {bad.tolist()}", file=sys.stderr, flush=True)
    summ1 = {
        k: np.asarray(v)[bad].tolist()
        for k, v in res.items() if k != "completed"
    }

    # rerun only those keys at 4x budget. NOT one plain-vmap device call:
    # 13 lanes x 4800 steps runs minutes on-device and the axon tunnel
    # kills calls > ~60 s (CLAUDE.md) — the first version of this probe
    # hung exactly there. The chunked sustained harness keeps every call
    # at chunk_steps ticks; with total == batch == len(bad) no refill
    # machinery engages and each record equals the fixed-budget
    # rollout_one result (pinned in test_parallel.py).
    keys = jax.random.split(jax.random.PRNGKey(0), total)[bad]
    res4, _ = sustained_rollouts(
        len(bad), len(bad), spec, params, S, 4 * budget, chunk_steps=150,
        refill=1, ror_method="sorted", cached=True, keys=keys)
    out4 = {k: np.asarray(v) for k, v in res4.items()}
    result = {
        "metric": "budget_exhausted_diagnosis",
        "budget": budget,
        "exhausted_ids": bad.tolist(),
        "at_budget": summ1,
        "at_4x_budget": {k: np.asarray(v).tolist() for k, v in out4.items()},
        "completed_at_4x": int(out4["completed"].sum()),
        "n_exhausted": int(bad.size),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "EXHAUSTED.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in
                      ("metric", "n_exhausted", "completed_at_4x")}))


if __name__ == "__main__":
    main()
