"""Localize the width-256 uncached miscompile (probe_width_uncached.py:
lanes 205+ of a 256-wide tiled-identical batch diverge; 8/64/128 clean).

Strategy: run the tiled 256-wide episode chunk by chunk, comparing lane 0
vs a known-broken lane after every chunk; at the first divergent chunk,
re-run that chunk tick-by-tick (chunk=1) from the last-good state to find
the exact tick and WHICH metric field diverges first:
  plan_len/status  -> planning (A* k-candidate nest / assembly / trim)
  mod              -> control tick
  xy/yaw only      -> follower kinematics
Writes benchmarks/WIDTH_BISECT.json.

Run: python benchmarks/probe_width_bisect.py [kid] [width] [bad_lane]
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BUDGET = 1200
CHUNK = 150


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp

    from aosx import engine
    from aosx.config import MC_STATICS, AosParams, params_as_f32
    from aosx.orchards import OrchardSpec, make_orchard
    from aosx.serving import host_jit

    kid = int(sys.argv[1]) if len(sys.argv) > 1 else 3951
    Wd = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    bad = int(sys.argv[3]) if len(sys.argv) > 3 else 205
    S = MC_STATICS
    if jax.default_backend() == "cpu":
        S = dataclasses.replace(S, jfa_dynamic_shifts=True)
    spec = OrchardSpec(
        n_rows=4, row_len=12.0, row_spacing=3.5, tree_spacing=1.0,
        trunk_pts=16, noise_pts=64, origin=(4.0, 3.0), polygon_pad=1.5,
    )
    params = params_as_f32(AosParams())
    key = jax.random.split(jax.random.PRNGKey(0), 4096)[kid]

    pc, poly = make_orchard(key, spec, S)
    excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)
    world = jax.jit(lambda pc, poly: engine.prepare_world(
        pc, poly, params, excl, S, ror_method="sorted"))(pc, poly)
    jax.block_until_ready(world)
    wb = jax.tree_util.tree_map(
        lambda x: jnp.tile(jnp.asarray(x)[None],
                           (Wd,) + (1,) * jnp.asarray(x).ndim), world)
    st = jax.vmap(lambda w: engine.initial_state(w, S))(wb)

    def chunk_fn(n):
        def body(w, st):
            def tick(st, _):
                st, m = engine.step(st, w, params, S)
                return st, None
            st, _ = jax.lax.scan(tick, st, None, length=n)
            return st
        return host_jit(jax.vmap(body))

    def lanes_diff(st):
        """First differing state leaf between lane 0 and the bad lane."""
        diffs = []
        for name, leaf in [
            ("xy", st.robot.xy), ("yaw", st.robot.yaw),
            ("follow_i", st.robot.follow_i),
            ("target_wp", st.mission.target_wp),
            ("waiting", st.mission.waiting_for_docking),
            ("status", st.mission.status),
            ("mode", st.control.mode),
            ("goal_xy", st.control.goal_xy),
            ("plan_count", st.plan.count),
            ("plan_xy", st.plan.xy),
            ("raw_count", st.raw_path.count),
            ("raw_xy", st.raw_path.xy),
            ("last_mod", st.last_mod),
        ]:
            a = np.asarray(leaf)
            if not np.array_equal(a[0], a[bad], equal_nan=True):
                diffs.append(name)
        return diffs

    big = chunk_fn(CHUNK)
    one = chunk_fn(1)

    t0 = time.time()
    div_chunk = None
    for c in range(BUDGET // CHUNK):
        st2 = big(wb, st)
        diffs = lanes_diff(st2)
        print(f"# chunk {c} (ticks {(c + 1) * CHUNK}): "
              f"{'DIVERGED ' + ','.join(diffs) if diffs else 'equal'} "
              f"({time.time() - t0:.0f}s)", file=sys.stderr, flush=True)
        if diffs:
            div_chunk = c
            break
        st = st2
    out = {"metric": "width_bisect", "key": kid, "width": Wd,
           "bad_lane": bad, "diverged_chunk": div_chunk}
    if div_chunk is not None:
        # tick-by-tick from the last-good state
        first_tick = None
        first_fields = None
        for t in range(CHUNK):
            st = one(wb, st)
            diffs = lanes_diff(st)
            if diffs:
                first_tick = div_chunk * CHUNK + t
                first_fields = diffs
                print(f"# FIRST divergent tick {first_tick}: fields {diffs}",
                      file=sys.stderr, flush=True)
                # show the differing values for the first few fields
                detail = {}
                for name in diffs[:4]:
                    leaf = {
                        "xy": st.robot.xy, "yaw": st.robot.yaw,
                        "follow_i": st.robot.follow_i,
                        "target_wp": st.mission.target_wp,
                        "waiting": st.mission.waiting_for_docking,
                        "status": st.mission.status,
                        "mode": st.control.mode,
                        "goal_xy": st.control.goal_xy,
                        "plan_count": st.plan.count,
                        "plan_xy": st.plan.xy,
                        "raw_count": st.raw_path.count,
                        "raw_xy": st.raw_path.xy,
                        "last_mod": st.last_mod,
                    }[name]
                    a = np.asarray(leaf)
                    if a[0].size <= 4:
                        detail[name] = {"lane0": a[0].tolist(),
                                        "bad": a[bad].tolist()}
                    else:
                        f0 = a[0].ravel()
                        fb = a[bad].ravel()
                        w = np.nonzero(f0 != fb)[0][:5]
                        detail[name] = {
                            "first_diff_idx": [int(i) for i in w],
                            "lane0_vals": [float(f0[i]) for i in w],
                            "bad_vals": [float(fb[i]) for i in w],
                        }
                out["detail"] = detail
                break
        out["first_divergent_tick"] = first_tick
        out["first_divergent_fields"] = first_fields
    print(json.dumps(out))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "WIDTH_BISECT.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
