"""Closed-loop exploration episode (SURVEY.md section 4 test #3): a scripted
robot driven by the jitted engine must reproduce the reference's mission
semantics - straight line to (8,0) first, boustrophedon waypoint order
(even cluster BR->BL, odd TL->TR), docking waits, origin return, and the
terminal "Exploration Complete" status."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aosx.config import TEST_STATICS as S, AosParams, params_as_f32
from aosx import engine
from aosx.orchards import OrchardSpec, make_orchard
from aosx.types import STATUS_STRINGS


@pytest.fixture(scope="module")
def world():
    # orchard near the origin so the (8,0) initial waypoint and origin return
    # are reachable; polygon margin keeps (0,0) outside the polygon
    spec = OrchardSpec(n_rows=3, row_len=12.0, origin=(6.0, 4.0), noise_pts=64)
    key = jax.random.PRNGKey(0)
    pc, poly = make_orchard(key, spec, S)
    params = params_as_f32(AosParams())
    excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)
    w = jax.jit(
        lambda pc, poly, pr, ex: engine.prepare_world(pc, poly, pr, ex, S, ror_method="exact")
    )(pc, poly, params, excl)
    return w, params


def test_world_has_tour(world):
    w, params = world
    n = int(w.waypoints.count)
    assert n >= 4, f"expected a waypoint tour, got {n}"
    assert int(w.graph.num_nodes) > 10
    assert int(w.graph.num_edges) > 10


def test_episode_completes(world):
    w, params = world
    n_steps = 3000
    run = jax.jit(lambda w, p: engine.episode(w, p, S, n_steps))
    final, metrics = run(w, params)

    status = np.asarray(metrics["status"])
    target = np.asarray(metrics["target_wp"])
    mods = np.asarray(metrics["mod"])
    xy = np.asarray(metrics["xy"])

    # initial waypoint reached: robot passes near (8, 0)
    d_init = np.linalg.norm(xy - np.array([8.0, 0.0]), axis=1)
    assert d_init.min() <= 1.0

    # target waypoint indices increase monotonically (boustrophedon progress)
    t_seen = target[target >= 0]
    deltas = np.diff(t_seen)
    assert (deltas >= 0).all()
    n_wp = int(np.asarray(w.waypoints.count))
    assert t_seen.max() >= n_wp, "never reached the appended origin waypoint"

    # docking waits happened (mode 3 observed at waypoints)
    assert (mods == 3).any()

    # exploration completed and robot returned to the origin
    assert bool(np.asarray(final.mission.exploration_completed))
    assert STATUS_STRINGS[int(status[-1])] == "Exploration Complete"
    assert np.linalg.norm(np.asarray(final.robot.xy)) <= 1.0


def test_waypoints_visited_in_order(world):
    """While waypoint i is the active target, the robot reaches its docking
    radius; arrival steps are strictly increasing (boustrophedon order)."""
    w, params = world
    n_steps = 3000
    run = jax.jit(lambda w, p: engine.episode(w, p, S, n_steps))
    final, metrics = run(w, params)
    xy = np.asarray(metrics["xy"])
    target = np.asarray(metrics["target_wp"])
    wp_xy = np.asarray(final.wp.xy)
    n_wp = int(final.wp.count)
    arrive = []
    for i in range(n_wp):
        active = target == i
        d = np.linalg.norm(xy - wp_xy[i], axis=1)
        hits = np.nonzero(active & (d <= 0.75))[0]
        assert len(hits) > 0, f"waypoint {i} never reached while targeted"
        arrive.append(int(hits[0]))
    assert arrive == sorted(arrive), arrive
