"""Dynamic-map replay (BASELINE config 4): a growing SLAM map re-triggers
perceive -> graph -> waypoint rebuild per frame; the mission target is
restored by position across rebuilds and the episode still completes."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aosx.config import TEST_STATICS as S, AosParams, params_as_f32
from aosx import engine
from aosx.orchards import OrchardSpec, make_orchard_np
from aosx.types import PointCloud, Polygon


@pytest.mark.slow
def test_replay_growing_map():
    spec = OrchardSpec(n_rows=3, row_len=12.0, origin=(6.0, 4.0))
    xyz, poly = make_orchard_np(spec, seed=5)
    rng = np.random.default_rng(0)
    order = rng.permutation(len(xyz))
    xyz = xyz[order]

    # growing map: 60% -> 85% -> 100% of the points
    F = 3
    fracs = [0.6, 0.85, 1.0]
    bufs = np.zeros((F, S.max_points, 3), np.float32)
    valids = np.zeros((F, S.max_points), bool)
    for f, frac in enumerate(fracs):
        n = int(len(xyz) * frac)
        bufs[f, :n] = xyz[:n]
        valids[f, :n] = True
    frames = PointCloud(xyz=jnp.asarray(bufs), valid=jnp.asarray(valids))
    poly_j = Polygon.from_array(poly.astype(np.float32), S)
    params = params_as_f32(AosParams())
    excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)

    run = jax.jit(
        lambda fr, po, pr, ex: engine.replay_episode(
            fr, po, pr, ex, S, steps_per_frame=1100, ror_method="exact"
        )
    )
    final, metrics = run(frames, poly_j, params, excl)

    target = np.asarray(metrics["target_wp"]).reshape(-1)
    status = np.asarray(metrics["status"]).reshape(-1)
    # mission progressed across frames and never reset backwards
    t_seen = target[target >= 0]
    assert len(t_seen) > 0
    assert (np.diff(t_seen) >= 0).all(), "target index regressed across rebuilds"
    # by the end of the replay the exploration completed and returned home
    assert bool(np.asarray(final.mission.exploration_completed))
    assert status[-1] == 3, status[-200:]
