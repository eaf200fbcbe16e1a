"""BASELINE config 5, SUSTAINED: >= 4096 total Monte-Carlo rollouts through
a fixed lane batch with host-side lane refill at chunk boundaries
(parallel/batch.sustained_rollouts; VERDICT r2 #2).

The one-shot batched bench (bench_rollouts.py) decays with batch size
(6.97 -> 5.74 -> 4.91 rollouts/s/chip at 128/256/512) because early-finished
and never-finishing lanes still burn full step budgets in the lockstep
vmapped while_loops. Refill converts dead lanes into throughput and gives
100% completion accounting: every started rollout is recorded exactly once
(completed or budget-exhausted).

Run: python benchmarks/bench_sustained.py [total] [batch] [steps] [chunk] [refill] [outfile] [cached] [realism]
  cached: 'cached' -> plan-cached steady state (plan/plancache.py)
  realism: 'realism' -> curved rows (0.8 m bow) + 15% tree dropout
           (aosx/orchards.py knobs; tests/test_orchards.py) — harder worlds,
           honest completion accounting shows the planner's robustness
Writes the JSON line to stdout AND benchmarks/SUSTAINED.json.
"""

import json
import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import time

import numpy as np


def main():
    import jax

    # fail-fast chip liveness: the axon backend can hang for hours on ANY
    # eager op (CLAUDE.md). The fetch below either prints quickly or hangs
    # BEFORE any bench logic, so a silent stall = dead chip, not a bug here.
    import jax.numpy as _jnp
    _t = time.time()
    assert float(np.asarray(_jnp.ones((8, 128)) * 2).sum()) == 2048.0
    print(f"# chip alive ({(time.time() - _t) * 1e3:.0f} ms round-trip)",
          file=_sys.stderr, flush=True)

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import dataclasses

    from aosx.config import (
        MC_REALISM_STATICS, MC_STATICS, AosParams, params_as_f32,
    )
    from aosx.orchards import OrchardSpec
    from aosx.parallel.batch import sustained_rollouts

    spec = OrchardSpec(
        n_rows=4, row_len=12.0, row_spacing=3.5, tree_spacing=1.0,
        trunk_pts=16, noise_pts=64, origin=(4.0, 3.0), polygon_pad=1.5,
    )
    total = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 1200
    chunk = int(sys.argv[4]) if len(sys.argv) > 4 else 150
    refill = int(sys.argv[5]) if len(sys.argv) > 5 else 64
    outfile = sys.argv[6] if len(sys.argv) > 6 else "SUSTAINED.json"
    cached = len(sys.argv) > 7 and sys.argv[7] == "cached"
    realism = len(sys.argv) > 8 and sys.argv[8] == "realism"
    # realism worlds use the measured-cap preset (config.py docstring)
    S = MC_REALISM_STATICS if realism else MC_STATICS
    if realism:
        spec = dataclasses.replace(spec, row_curve=0.8, dropout=0.15)
    # uncached batches > 128 lanes: sustained_rollouts itself force-enables
    # astar_serial_candidates (the width-256 miscompile valve)
    params = params_as_f32(AosParams())

    last = [0.0]

    def progress(n, tot, t):
        if t - last[0] > 20 or n == tot:
            last[0] = t
            print(f"# {n}/{tot} rollouts recorded, {t:.0f}s, "
                  f"{n / max(t, 1e-9):.2f}/s", file=sys.stderr, flush=True)

    t0 = time.time()
    res, stats = sustained_rollouts(
        total, batch, spec, params, S, steps,
        chunk_steps=chunk, refill=refill, ror_method="sorted",
        cached=cached, on_progress=progress,
    )
    wall = time.time() - t0
    done = int(res["completed"].sum())
    flagged = int((res["guards"] != 0).sum())
    rps = stats["rollouts_per_sec"]
    # classification (VERDICT r3 #1): every non-completed lane is either
    # capacity-invalidated (guard bits; fast-mode invalidation), infeasible
    # (plancache.tour_feasibility — stalls under reference semantics), or a
    # residual exhaustion (slow or a planner trap — should be ~0)
    comp = res["completed"].astype(bool)
    gflag = res["guards"] != 0
    feas = res.get("feasible")
    classified = feas is not None and (feas >= 0).all()
    if classified:
        infeasible = (~comp) & (~gflag) & (feas == 0)
        residual = (~comp) & (~gflag) & (feas == 1)
        # soundness check: a completed lane the predicate called infeasible
        # would mean tour_feasibility is wrong - surface it loudly
        violations = int((comp & (feas == 0)).sum())
    else:
        infeasible = np.zeros_like(comp)
        residual = (~comp) & (~gflag)
        violations = 0
    residual_ids = np.nonzero(residual)[0][:256]
    result = {
        "metric": "mc_sustained_rollouts_per_sec_per_chip",
        "plan_cached": cached,
        "realism": ({"row_curve": spec.row_curve, "dropout": spec.dropout}
                    if realism else None),
        "grid": [S.grid_h, S.grid_w],
        "total_rollouts": total,
        "lanes": batch,
        "steps_budget": steps,
        "chunk_steps": chunk,
        "refill": refill,
        "completed": done,
        "budget_exhausted": total - done,
        "guard_flagged_lanes": flagged,
        "feasibility_classified": bool(classified),
        # scope of the label (tour_feasibility docstring, VERDICT r4 weak
        # #4): 'infeasible' is absolute (no plan point enters the docking
        # ring), 'feasible' is relative to a controller that converges on
        # plan points — the repo's stand-in follower. A sloppier external
        # controller should re-classify with tour_feasibility(dock_margin>0)
        "feasibility_contract": "plan-point-converging follower; "
                                "dock_margin=0",
        "capacity_invalidated": int(((~comp) & gflag).sum()),
        "infeasible_worlds": int(infeasible.sum()),
        "budget_exhausted_residual": int(residual.sum()),
        "residual_ids": [int(i) for i in residual_ids],
        "feasibility_predicate_violations": violations,
        "elapsed_s": round(stats["elapsed_s"], 1),
        "wall_incl_compile_s": round(wall, 1),
        "chunk_calls": stats["chunk_calls"],
        "begin_calls": stats["begin_calls"],
        "rollouts_per_sec_per_chip": round(rps, 2),
        "projected_v5e8_rollouts_per_sec": round(8 * rps, 2),
    }
    print(json.dumps(result))
    with open(_os.path.join(_os.path.dirname(_os.path.abspath(__file__)),
                            outfile), "w") as f:
        json.dump(result, f, indent=1)


if __name__ == "__main__":
    main()
