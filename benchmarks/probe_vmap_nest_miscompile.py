"""Minimal repro of the axon-TPU 3-level-vmap miscompile (2026-08-19).

jax.vmap(build_plan_cache) — a lanes x rows(25) x astar-candidates(5)
batching nest — returns success=False / plan_count=0 for SPECIFIC cache rows
at lane width >= 16 on the axon v5e toolchain, while widths 4 and 8 are
bit-identical to single-instance builds. The failure is deterministic and
reproduces with the SAME world tiled into every lane (i.e. it is a
compile-level defect, not data corruption): world 0 of the bench key set
loses rows [7, 8, 9, 21, 22] (mid-tour targets 6-8 and both origin-return
configs). It silently stalled 86% of plan-cached sustained MC rollouts
(SUSTAINED_CACHED.json @ 2026-08-19 11:54: 573/4096 completed).

The production fix (plan/plancache.py::build_plan_cache) scans rows with
lax.map so primitives only ever see the 2-level lanes x candidates batch —
the shape the plain per-tick path runs at width 128 with full parity. THIS
PROBE KEEPS THE OLD NEST on purpose: run it after a libtpu update; if it
prints CLEAN at every width, the workaround can be retired.

Run (real TPU): python benchmarks/probe_vmap_nest_miscompile.py
Expected on the 2026-08 toolchain: widths 4/8 CLEAN, widths 16/32 BROKEN.
"""

import dataclasses
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp

    t = time.time()
    assert float(np.asarray(jnp.ones((8, 128)) * 2).sum()) == 2048.0
    print(f"# chip alive ({time.time() - t:.0f}s)", file=_sys.stderr, flush=True)

    from aosx import engine
    from aosx.config import TEST_STATICS, AosParams, params_as_f32
    from aosx.orchards import OrchardSpec, make_orchard
    from aosx.plan import plancache
    from aosx.plan.linearize import linearize
    from aosx.plan.mission import plan_current_path

    S = dataclasses.replace(TEST_STATICS, jfa_dynamic_shifts=False,
                            exact_fallbacks=False, max_plan=1024)
    spec = OrchardSpec(
        n_rows=4, row_len=12.0, row_spacing=3.5, tree_spacing=1.0,
        trunk_pts=16, noise_pts=64, origin=(4.0, 3.0), polygon_pad=1.5,
    )
    params = params_as_f32(AosParams())
    key = jax.random.split(jax.random.PRNGKey(0), 4096)[0]
    excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)
    pc, poly = make_orchard(key, spec, S)
    world = jax.jit(lambda pc, poly: engine.prepare_world(
        pc, poly, params, excl, S, ror_method="sorted"))(pc, poly)

    # the ORIGINAL vmap-over-rows build (the nest under test), inlined here
    # so the production fix in build_plan_cache doesn't mask the probe
    def build_vmap_rows(world):
        from aosx.plan.mission import _append_origin
        from aosx.types import MissionState, Path, Waypoints

        W = S.max_waypoints
        R = plancache.num_rows(S)
        wp0 = world.waypoints
        wp2 = _append_origin(wp0, params)
        c2 = wp2.count
        rows = jnp.arange(R, dtype=jnp.int32)
        target = rows - 1
        prev = rows - 2
        target = target.at[0].set(-1).at[W + 1].set(c2 - 1).at[W + 2].set(c2 - 1)
        target = target.at[W + 3].set(-1).at[W + 4].set(-1)
        prev = prev.at[0].set(-1).at[W + 1].set(c2 - 2).at[W + 2].set(c2 - 1)
        prev = prev.at[W + 3].set(-1).at[W + 4].set(-1)
        init_reached = rows != 0
        use_wp2 = (rows == W + 1) | (rows == W + 2)
        f = jnp.bool_(False)
        missions = MissionState(
            target_wp=target, prev_wp=prev, initial_reached=init_reached,
            exploration_completed=jnp.broadcast_to(f, (R,)),
            waiting_for_docking=jnp.broadcast_to(f, (R,)),
            status=jnp.zeros((R,), jnp.int32), origin_appended=use_wp2,
        )
        wps = Waypoints(
            xy=jnp.where(use_wp2[:, None, None], wp2.xy[None], wp0.xy[None]),
            node_idx=jnp.where(use_wp2[:, None], wp2.node_idx[None],
                               wp0.node_idx[None]),
            count=jnp.where(use_wp2, wp2.count, wp0.count),
        )

        def one(m, wp):
            raw, success = plan_current_path(
                m, wp, world.graph, world.costmat, world.skeleton, params, S,
                trim_plane=world.trim_skel)
            plan = linearize(raw, params, S)
            return plan.count, success

        return jax.vmap(one)(missions, wps)

    cnt1, suc1 = jax.jit(build_vmap_rows)(world)
    cnt1, suc1 = np.asarray(cnt1), np.asarray(suc1)
    print(f"single-instance: rows succeeding = "
          f"{np.nonzero(suc1)[0].tolist()}", flush=True)

    vb = jax.jit(jax.vmap(build_vmap_rows))
    broken = False
    for width in (4, 8, 16, 32):
        tiled = jax.tree_util.tree_map(
            lambda a: jnp.broadcast_to(a[None], (width,) + a.shape), world)
        cnt, suc = vb(tiled)
        cnt, suc = np.asarray(cnt), np.asarray(suc)
        bad = [(i, np.nonzero((suc[i] != suc1) | (cnt[i] != cnt1))[0].tolist())
               for i in range(width)
               if not (np.array_equal(suc[i], suc1) and np.array_equal(cnt[i], cnt1))]
        print(f"width {width:2d}: {'CLEAN' if not bad else f'BROKEN {bad[:3]}'}",
              flush=True)
        broken |= bool(bad)
    print("verdict:", "MISCOMPILE PRESENT — keep the lax.map workaround"
          if broken else "clean — workaround retirable", flush=True)


if __name__ == "__main__":
    main()
