"""Replay ONE of the 13 deterministic budget-exhausted MC rollouts on CPU
and localize WHERE the robot freezes.

EXHAUSTED.json (real v5e, queue 12): the 13 lanes move ZERO distance
between step 1200 and 4800 (travel bit-identical at 1x and 4x budget),
final mod=0 (follow), ~11.7 m from origin — a control/mission deadlock,
not slowness. This probe re-runs an exhausted key with full per-tick
metrics, finds the freeze step, prints the mission state around it, and
renders the episode figure for eyeballing.

Run: PYTHONPATH= JAX_PLATFORMS=cpu python benchmarks/probe_stuck.py [keyid]
"""

import dataclasses
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    if jax.default_backend() != "cpu":
        jax.config.update("jax_default_device", jax.devices("cpu")[0])
    import jax.numpy as jnp

    from aosx import engine
    from aosx.config import TEST_STATICS, AosParams, params_as_f32
    from aosx.orchards import OrchardSpec, make_orchard

    kid = int(sys.argv[1]) if len(sys.argv) > 1 else 1407
    S = dataclasses.replace(TEST_STATICS, jfa_dynamic_shifts=False,
                            exact_fallbacks=False, max_plan=1024)
    spec = OrchardSpec(
        n_rows=4, row_len=12.0, row_spacing=3.5, tree_spacing=1.0,
        trunk_pts=16, noise_pts=64, origin=(4.0, 3.0), polygon_pad=1.5,
    )
    params = params_as_f32(AosParams())
    key = jax.random.split(jax.random.PRNGKey(0), 4096)[kid]

    pc, poly = make_orchard(key, spec, S)
    excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)
    world = engine.prepare_world(pc, poly, params, excl, S,
                                 ror_method="sorted")
    final, metrics = jax.jit(
        lambda w: engine.episode(w, params, S, 1200))(world)
    m = {k: np.asarray(v) for k, v in metrics.items()}

    xy = m["xy"]
    moved = np.linalg.norm(np.diff(xy, axis=0), axis=1)
    # last step with any motion
    nz = np.nonzero(moved > 1e-6)[0]
    freeze = int(nz[-1]) + 1 if nz.size else 0
    print(f"# key {kid}: freeze at step {freeze}/1200, "
          f"xy={xy[freeze].tolist()}")
    for t in [max(0, freeze - 3), freeze - 1, freeze, freeze + 1,
              min(1199, freeze + 100), 1199]:
        print(f"  t={t}: xy={np.round(xy[t], 3).tolist()} mod={m['mod'][t]} "
              f"status={m['status'][t]} target_wp={m['target_wp'][t]} "
              f"waiting={m['waiting'][t]} plan_len={m['plan_len'][t]} "
              f"completed={m['completed'][t]}")
    wp_count = int(np.asarray(final.wp.count))
    wps = np.asarray(final.wp.xy)[:wp_count]
    print(f"# waypoints ({wp_count}): {np.round(wps, 2).tolist()}")
    tgt = int(m["target_wp"][-1])
    print(f"# final target_wp={tgt} -> "
          f"{np.round(wps[tgt], 2).tolist() if tgt < wp_count else 'OOB'}")
    gl = np.asarray(final.control.goal_xy)
    print(f"# final control goal_xy={np.round(gl, 3).tolist()} "
          f"plan count={int(np.asarray(final.plan.count))}")

    out = os.path.join("/tmp", f"stuck_{kid}")
    os.makedirs(out, exist_ok=True)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        from aosx.io.render import render_world

        _, ax = plt.subplots(figsize=(14, 6))
        render_world(world, state=final, metrics=m, ax=ax)
        ax.plot(xy[:, 0], xy[:, 1], "m-", lw=0.8)
        ax.plot(*xy[freeze], "r*", ms=14)
        ax.plot(wps[:, 0], wps[:, 1], "y.-", ms=8, lw=0.5)
        if tgt < wp_count:
            ax.plot(*wps[tgt], "c^", ms=12)
        plt.savefig(os.path.join(out, "episode.png"), dpi=110,
                    bbox_inches="tight")
        print(f"# figure: {out}/episode.png")
    except Exception as e:  # render signature drift — diagnosis still valid
        print(f"# render skipped: {e}")
    json.dump({"key": kid, "freeze_step": freeze,
               "xy": xy[freeze].tolist(),
               "target_wp": tgt, "wp_count": wp_count},
              open(os.path.join(out, "stuck.json"), "w"))


if __name__ == "__main__":
    main()
