"""Classify realism-world (curved rows + dropout) Monte-Carlo outcomes
(VERDICT r3 next-round #1): every non-completing lane must be one of

  capacity   — world-build guard bits fired (caps sized for straight rows);
  infeasible — plancache.tour_feasibility says the mission stalls under the
               reference's own advance semantics (a tour leg has no plan, or
               its plan never enters the docking ring);
  slow       — feasible and completes at a larger step budget;
  trap       — feasible, does NOT complete even at 4x budget: a planner bug.

Phase A builds N worlds (vmapped groups) at the MC realism config and
classifies statically. Phase B validates the predicate empirically: a sample
of infeasible worlds must NOT complete in budget, and every feasible
non-completer is re-run at 4x budget to separate slow from trap. Writes
benchmarks/REALISM_DIAG.json.

Run: PYTHONPATH= JAX_PLATFORMS=cpu python benchmarks/probe_realism_diag.py [n]
(CPU: the classification is key-exact and backend-independent — the same
PRNG keys drive the TPU sustained artifacts.)
"""

import collections
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V = 8               # vmap width per device call
BUDGET = 1200       # the sustained artifacts' steps_budget
CHUNK = 300


def main():
    import jax

    if jax.default_backend() != "cpu":
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    import jax.numpy as jnp

    from aosx import engine, guards
    from aosx.config import MC_REALISM_STATICS, AosParams, params_as_f32
    from aosx.orchards import OrchardSpec
    from aosx.parallel.batch import (
        rollout_begin_cached, rollout_chunk_cached, rollout_finish,
    )
    from aosx.plan import plancache

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    n = (n // V) * V
    # the MC realism preset (bench_sustained.py realism mode), with the
    # CPU-friendly JFA lowering (identical results, CLAUDE.md)
    S = dataclasses.replace(MC_REALISM_STATICS, jfa_dynamic_shifts=True)
    spec = OrchardSpec(
        n_rows=4, row_len=12.0, row_spacing=3.5, tree_spacing=1.0,
        trunk_pts=16, noise_pts=64, origin=(4.0, 3.0), polygon_pad=1.5,
        row_curve=0.8, dropout=0.15,
    )
    params = params_as_f32(AosParams())
    keys = jax.random.split(jax.random.PRNGKey(0), 4096)

    # ---------------- phase A: build + static classification ----------------
    def diag_one(k):
        from aosx.orchards import make_orchard

        pc, poly = make_orchard(k, spec, S)
        excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)
        world = engine.prepare_world(pc, poly, params, excl, S,
                                     ror_method="sorted")
        cache = plancache.build_plan_cache(world, params, S)
        feas = plancache.tour_feasibility(cache, world.waypoints, params, S)
        return dict(
            guards=world.guards, wp=world.waypoints.count,
            nodes=world.graph.num_nodes, edges=world.graph.num_edges,
            **feas,
        )

    dj = jax.jit(jax.vmap(diag_one))
    t0 = time.time()
    recs = []
    for i in range(0, n, V):
        r = jax.tree_util.tree_map(np.asarray, dj(keys[i:i + V]))
        recs.append(r)
        if i % 64 == 0:
            print(f"# phase A {i + V}/{n} ({time.time() - t0:.0f}s)",
                  file=sys.stderr, flush=True)
    A = {k: np.concatenate([r[k] for r in recs]) for k in recs[0]}
    flagged = A["guards"] != 0
    infeas = (~flagged) & (A["feasible"] == 0)
    feas = (~flagged) & (A["feasible"] == 1)
    flag_counts = collections.Counter()
    for g in A["guards"][flagged]:
        for nm in guards.describe(int(g)):
            flag_counts[nm] += 1
    bad_leg_hist = collections.Counter(
        int(x) for x in A["first_bad_leg"][infeas])
    print(f"# phase A done: {flagged.sum()} flagged, {infeas.sum()} "
          f"infeasible, {feas.sum()} feasible of {n} "
          f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)

    # ---------------- phase B: empirical validation --------------------------
    # host_jit: host-loop callables (serving.host_jit docstring — the
    # jax 0.9.0 repeat-dispatch const bug hits plain jax.jit here)
    from aosx.serving import host_jit

    begin = host_jit(jax.vmap(
        lambda k: rollout_begin_cached(k, spec, params, S, BUDGET,
                                       ror_method="sorted")))
    chunk = host_jit(jax.vmap(
        lambda l, c, st, acc, off: rollout_chunk_cached(
            l, c, st, acc, params, S, CHUNK, off),
        in_axes=(0, 0, 0, 0, None)))
    finish = host_jit(jax.vmap(lambda st, acc: rollout_finish(st, acc, S)))

    def episodes(idx, budget):
        """Run full cached episodes for key indices idx; returns (summary
        dict, final mission fields), truncated to len(idx) — the trailing
        pad lanes (last id repeated to a multiple of V) are dropped."""
        m = len(idx)
        idx = list(idx)
        while len(idx) % V:
            idx.append(idx[-1])
        outs, fins = [], []
        for i in range(0, len(idx), V):
            kb = keys[np.asarray(idx[i:i + V])]
            lite, cache, st, acc = begin(kb)
            for c in range(budget // CHUNK):
                st, acc = chunk(lite, cache, st, acc, jnp.int32(c * CHUNK))
            outs.append(jax.tree_util.tree_map(np.asarray, finish(st, acc)))
            fins.append(dict(
                target_wp=np.asarray(st.mission.target_wp),
                waiting=np.asarray(st.mission.waiting_for_docking),
                xy=np.asarray(st.robot.xy),
                adopted=np.asarray(st.adopted),
            ))
        out = {k: np.concatenate([o[k] for o in outs])[:m] for k in outs[0]}
        fin = {k: np.concatenate([f[k] for f in fins])[:m] for k in fins[0]}
        return out, fin

    # (1) infeasible sample must not complete
    inf_ids = [int(i) for i in np.nonzero(infeas)[0][:16]]
    inf_completed = 0
    if inf_ids:
        out, fin = episodes(inf_ids, BUDGET)
        inf_completed = int(out["completed"].sum())
        print(f"# infeasible sample: {inf_completed}/{len(inf_ids)} "
              f"completed (expect 0)", file=sys.stderr, flush=True)

    # (2) feasible worlds: run in budget; non-completers re-run at 4x
    feas_ids = [int(i) for i in np.nonzero(feas)[0][:64]]
    feas_completed = slow = 0
    traps = []
    if feas_ids:
        out, fin = episodes(feas_ids, BUDGET)
        done = out["completed"].astype(bool)
        feas_completed = int(done.sum())
        nc = [fid for j, fid in enumerate(feas_ids) if not done[j]]
        print(f"# feasible sample: {feas_completed}/{len(feas_ids)} completed "
              f"in {BUDGET}; re-running {len(nc)} at 4x",
              file=sys.stderr, flush=True)
        if nc:
            out4, fin4 = episodes(nc, 4 * BUDGET)
            for j, fid in enumerate(nc):
                if out4["completed"][j]:
                    slow += 1
                else:
                    traps.append(dict(
                        key=int(fid),
                        target_wp=int(fin4["target_wp"][j]),
                        waiting=bool(fin4["waiting"][j]),
                        xy=[round(float(x), 2) for x in fin4["xy"][j]],
                        steps=4 * BUDGET,
                    ))

    result = {
        "metric": "realism_world_diagnosis",
        "spec": {"row_curve": spec.row_curve, "dropout": spec.dropout,
                 "n_rows": spec.n_rows, "row_len": spec.row_len},
        "n": n,
        "build": {
            "capacity_flagged": int(flagged.sum()),
            "guard_flag_counts": dict(flag_counts),
            "infeasible": int(infeas.sum()),
            "feasible": int(feas.sum()),
            "first_bad_leg_hist": {str(k): v for k, v in
                                   sorted(bad_leg_hist.items())},
        },
        "episode_check": {
            "budget": BUDGET,
            "infeasible_sampled": len(set(inf_ids)),
            "infeasible_completed": inf_completed,
            "feasible_sampled": len(set(feas_ids)),
            "feasible_completed_in_budget": feas_completed,
            "slow_completed_at_4x": slow,
            "traps": traps,
        },
        "elapsed_s": round(time.time() - t0, 1),
    }
    print(json.dumps(result))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "REALISM_DIAG.json"), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
