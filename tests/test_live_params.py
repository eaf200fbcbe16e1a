"""Live parameter push (the RViz panel's parameter-client equivalent,
aos_panel_plugin_params.cpp:59-125): every AosParams field is a traced
scalar, so pushing new values re-runs the SAME compiled program - no
recompile, changed behavior. This is the TPU-native replacement for ROS2's
runtime `ros2 param set`."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from aosx import engine
from aosx.config import DRYRUN_STATICS as S, AosParams, params_as_f32
from aosx.orchards import OrchardSpec, make_orchard


def test_live_param_push_no_recompile():
    spec = OrchardSpec(n_rows=2, row_len=4.0, row_spacing=2.0, tree_spacing=1.0,
                       trunk_pts=10, noise_pts=16, origin=(2.0, 2.0), polygon_pad=1.0)
    pc, poly = make_orchard(jax.random.PRNGKey(0), spec, S)
    excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)
    p1 = params_as_f32(AosParams())
    world = jax.jit(
        lambda pc, poly, pr, ex: engine.prepare_world(pc, poly, pr, ex, S,
                                                      ror_method="exact")
    )(pc, poly, p1, excl)
    st0 = engine.initial_state(world, S)

    step_fn = jax.jit(lambda st, w, p: engine.step(st, w, p, S))
    _, m1 = step_fn(st0, world, p1)
    assert int(m1["target_wp"]) == -1  # robot at origin, initial WP not reached

    # live push: huge arrival radius -> the initial waypoint is "reached"
    # immediately and the tour starts at target 0
    p2 = params_as_f32(dataclasses.replace(AosParams(), initial_arrive_dist=100.0))
    _, m2 = step_fn(st0, world, p2)
    assert int(m2["target_wp"]) == 0

    # same compiled executable served both calls
    assert step_fn._cache_size() == 1
