"""Classify the residual (feasible-but-budget-exhausted) lanes of a
sustained artifact: re-run exactly those keys at 4x budget. Completing =
SLOW (honest budget exhaustion); not completing = a PLANNER TRAP (VERDICT
r3 #1c — diagnose like the yaw deadlock). Appends the verdicts to the
artifact and writes RESIDUAL_<artifact>.

Run: python benchmarks/probe_residual.py SUSTAINED_REALISM.json [realism]
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CHUNK = 300


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp

    from aosx.config import (
        MC_REALISM_STATICS, MC_STATICS, AosParams, params_as_f32,
    )
    from aosx.orchards import OrchardSpec
    from aosx.parallel.batch import (
        rollout_begin_cached, rollout_chunk_cached, rollout_finish,
    )

    bdir = os.path.dirname(os.path.abspath(__file__))
    art_name = sys.argv[1] if len(sys.argv) > 1 else "SUSTAINED_REALISM.json"
    realism = (len(sys.argv) > 2 and sys.argv[2] == "realism") or \
        "REALISM" in art_name
    with open(os.path.join(bdir, art_name)) as f:
        art = json.load(f)
    ids = art.get("residual_ids", [])
    budget = 4 * art["steps_budget"]
    if not ids:
        print(json.dumps({"metric": "residual_diagnosis",
                          "artifact": art_name, "residual_ids": [],
                          "note": "no residual lanes - nothing to classify"}))
        return

    S = MC_REALISM_STATICS if realism else MC_STATICS
    if jax.default_backend() == "cpu":
        S = dataclasses.replace(S, jfa_dynamic_shifts=True)
    spec = OrchardSpec(
        n_rows=4, row_len=12.0, row_spacing=3.5, tree_spacing=1.0,
        trunk_pts=16, noise_pts=64, origin=(4.0, 3.0), polygon_pad=1.5,
    )
    if realism:
        spec = dataclasses.replace(spec, row_curve=0.8, dropout=0.15)
    params = params_as_f32(AosParams())
    keys = jax.random.split(jax.random.PRNGKey(0), 4096)

    V = 8
    padded = list(ids)
    while len(padded) % V:
        padded.append(padded[-1])

    # host_jit, NOT plain jax.jit: these are host-loop callables, and the
    # 2nd+ dispatch of a const-carrying executable on axon dies with a bare
    # "INVALID_ARGUMENT: TPU backend error" (serving.host_jit docstring;
    # exactly how this probe's first on-chip run failed, 2026-08-20)
    from aosx.serving import host_jit

    begin = host_jit(jax.vmap(
        lambda k: rollout_begin_cached(k, spec, params, S, budget,
                                       ror_method="sorted")))
    chunk = host_jit(jax.vmap(
        lambda l, c, st, acc, off: rollout_chunk_cached(
            l, c, st, acc, params, S, CHUNK, off),
        in_axes=(0, 0, 0, 0, None)))

    t0 = time.time()
    verdicts = []
    for i in range(0, len(padded), V):
        kb = keys[np.asarray(padded[i:i + V])]
        lite, cache, st, acc = begin(kb)
        xy_prev = None
        for c in range(budget // CHUNK):
            st, acc = chunk(lite, cache, st, acc, jnp.int32(c * CHUNK))
        comp = np.asarray(st.mission.exploration_completed)
        tw = np.asarray(st.mission.target_wp)
        wait = np.asarray(st.mission.waiting_for_docking)
        xy = np.asarray(st.robot.xy)
        for j in range(V):
            if i + j >= len(ids):
                break
            verdicts.append(dict(
                key=int(padded[i + j]),
                completed_at_4x=bool(comp[j]),
                target_wp=int(tw[j]), waiting=bool(wait[j]),
                xy=[round(float(x), 2) for x in xy[j]],
            ))
        print(f"# {min(i + V, len(ids))}/{len(ids)} residual lanes re-run "
              f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)

    slow = sum(v["completed_at_4x"] for v in verdicts)
    traps = [v for v in verdicts if not v["completed_at_4x"]]
    out = {
        "metric": "residual_diagnosis",
        "artifact": art_name,
        "budget_4x": budget,
        "residual_total": len(ids),
        "slow_completed_at_4x": slow,
        "traps": traps,
        "elapsed_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out))
    with open(os.path.join(bdir, f"RESIDUAL_{art_name}"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
