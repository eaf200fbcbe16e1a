"""Per-tick ControlState trace for a stuck rollout (key 1407 by default):
dumps mode / is_path_received / yaw vs goal_yaw around the freeze step to
pin WHICH term of the stop2 condition (control.py:59) never goes true.

Run: PYTHONPATH= JAX_PLATFORMS=cpu python benchmarks/probe_ctrl_trace.py [keyid] [t0] [t1]
"""

import dataclasses
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
    from aosx.geom import normalized_angle
    from aosx.orchards import OrchardSpec, make_orchard

    kid = int(sys.argv[1]) if len(sys.argv) > 1 else 1407
    t0 = int(sys.argv[2]) if len(sys.argv) > 2 else 140
    t1 = int(sys.argv[3]) if len(sys.argv) > 3 else 180
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
    world = engine.prepare_world(pc, poly, params, excl, S, ror_method="sorted")

    step_j = jax.jit(lambda st: engine.step(st, world, params, S))
    st = engine.initial_state(world, S)
    print(f"# params: semi_dist={float(params.sm_semi_dist)} "
          f"semi_yaw={float(params.sm_semi_yaw)} "
          f"approach={float(params.sm_approach_dist)} "
          f"precise_dist={float(params.sm_precise_dist)} "
          f"precise_yaw={float(params.sm_precise_yaw)} "
          f"skip={int(params.sm_skipping_hz)}")
    for t in range(t1 + 1):
        st, m = step_j(st)
        if t0 <= t <= t1:
            c = st.control
            yd = float(np.abs(np.asarray(normalized_angle(
                c.goal_yaw - st.robot.yaw))))
            print(f"t={t} mod={int(m['mod'])} mode={int(np.asarray(c.mode))} "
                  f"pr={bool(np.asarray(c.is_path_received))} "
                  f"ginit={bool(np.asarray(c.goal_initialized))} "
                  f"yaw={float(np.asarray(st.robot.yaw)):.3f} "
                  f"gyaw={float(np.asarray(c.goal_yaw)):.3f} ydiff={yd:.3f} "
                  f"dist={float(np.linalg.norm(np.asarray(c.goal_xy) - np.asarray(st.robot.xy))):.4f} "
                  f"wait={bool(np.asarray(st.mission.waiting_for_docking))} "
                  f"tw={int(np.asarray(st.mission.target_wp))}")


if __name__ == "__main__":
    main()
