"""Parameter-sweep Monte-Carlo evaluation (aosx/parallel/sweep.py): the
swept sustained harness must run every (configuration, seed) rollout with
that rollout's OWN params row — pinned against rollout_one at the same key
and configuration — in both the plain and plan-cached lanes. The reference
evaluates one YAML configuration per field trial
(aos_panel_plugin_params.cpp:59-125); the sweep is the batched equivalent."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aosx.config import DRYRUN_STATICS as S, AosParams, params_as_f32
from aosx.orchards import OrchardSpec
from aosx.parallel.batch import rollout_one
from aosx.parallel.sweep import (
    grid_params, stack_params, summarize_sweep, sweep_rollouts,
)

SPEC = OrchardSpec(
    n_rows=2, row_len=4.0, row_spacing=2.0, tree_spacing=1.0,
    trunk_pts=10, noise_pts=16, origin=(2.0, 2.0), polygon_pad=1.0,
)
BUDGET = 60
K = 2  # seeds per configuration


def _bits(a):
    a = np.asarray(a)
    return a.view(np.uint32) if a.dtype == np.float32 else a


def test_grid_params_order_and_values():
    stacked, configs = grid_params(
        heuristic_weight=[3.0, 1.0], docking_radius=[0.7, 0.25])
    # sorted axis names: docking_radius outer, heuristic_weight inner
    assert configs == [
        {"docking_radius": 0.7, "heuristic_weight": 3.0},
        {"docking_radius": 0.7, "heuristic_weight": 1.0},
        {"docking_radius": 0.25, "heuristic_weight": 3.0},
        {"docking_radius": 0.25, "heuristic_weight": 1.0},
    ]
    assert np.allclose(np.asarray(stacked.docking_radius),
                       [0.7, 0.7, 0.25, 0.25])
    assert np.allclose(np.asarray(stacked.heuristic_weight),
                       [3.0, 1.0, 3.0, 1.0])
    # untouched fields broadcast from the base
    base = params_as_f32(AosParams())
    assert np.allclose(np.asarray(stacked.path_step),
                       np.full(4, float(base.path_step)))
    with pytest.raises(ValueError):
        grid_params(not_a_field=[1.0])
    with pytest.raises(ValueError):
        grid_params()


@pytest.fixture(scope="module")
def sweep_inputs():
    stacked, configs = grid_params(heuristic_weight=[3.0, 1.0])
    return stacked, configs


@pytest.fixture(scope="module")
def plain_sweep(sweep_inputs):
    stacked, configs = sweep_inputs
    # classify=True: the cached-vs-plain comparison includes the feasible
    # field, which only the cached path computes by default
    res, stats = sweep_rollouts(
        stacked, configs, K, SPEC, S, BUDGET,
        batch=4, chunk_steps=20, refill=2, seed=5, ror_method="exact",
        classify=True)
    return res, stats


def test_sweep_matches_per_config_rollout_one(sweep_inputs, plain_sweep):
    """Rollout id c*K + k must equal rollout_one(key_k, params_c): per-lane
    params actually route (a bug that ran every lane with row 0 would fail
    the heuristic_weight=1.0 rows wherever the A* tie-break differs), and
    the refill scheduler's records stay schedule-independent."""
    stacked, configs = sweep_inputs
    res, stats = plain_sweep
    P = len(configs)
    assert all(v.shape[0] == P * K for v in res.values())

    keys = jax.random.split(jax.random.PRNGKey(5), K)
    one = jax.jit(lambda k, p: rollout_one(
        k, SPEC, p, S, BUDGET, ror_method="exact"))
    for c in range(P):
        p_c = jax.tree_util.tree_map(lambda x: x[c], stacked)
        for k in range(K):
            ref = jax.tree_util.tree_map(np.asarray, one(keys[k], p_c))
            i = c * K + k
            for name in ("completed", "steps_to_complete", "final_status",
                         "waypoints", "guards"):
                assert int(res[name][i]) == int(ref[name]), (c, k, name)
            for name in ("travel_distance", "final_dist_to_origin"):
                assert abs(float(res[name][i]) - float(ref[name])) < 1e-3, (
                    c, k, name)


def test_sweep_cached_matches_plain(sweep_inputs, plain_sweep):
    """The plan-cached swept lanes (rollout_begin_cached/chunk_cached with
    per-lane params) produce the same records as the plain swept lanes."""
    stacked, configs = sweep_inputs
    ref, _ = plain_sweep
    got, _ = sweep_rollouts(
        stacked, configs, K, SPEC, S, BUDGET,
        batch=4, chunk_steps=20, refill=2, seed=5, ror_method="exact",
        cached=True)
    assert set(ref) == set(got)
    for name in ref:
        assert np.array_equal(_bits(ref[name]), _bits(got[name])), name


def test_summarize_sweep_aggregates():
    P, K_ = 2, 3
    res = dict(
        completed=np.array([1, 1, 0, 0, 0, 0], bool),
        travel_distance=np.float32([10.0, 14.0, 99.0, 1.0, 2.0, 3.0]),
        steps_to_complete=np.int32([40, 60, 999, 999, 999, 999]),
        final_status=np.int32([0, 0, 1, 1, 0, 1]),
        guards=np.int32([0, 0, 4, 0, 0, 0]),
    )
    table, agg = summarize_sweep(res, P, K_)
    assert table["completed"].shape == (P, K_)
    assert np.allclose(agg["completion_rate"], [2 / 3, 0.0])
    assert np.isclose(agg["travel_mean"][0], 12.0)
    assert np.isclose(agg["travel_std"][0], 2.0)
    assert np.isnan(agg["travel_mean"][1])  # nothing completed
    assert np.isclose(agg["steps_mean"][0], 50.0)
    assert agg["failed"].tolist() == [1, 2]
    assert agg["guard_flagged"].tolist() == [1, 0]


def test_compare_configs_paired():
    """compare_configs: paired differences over both-completed seeds only,
    bootstrap CI brackets a constant shift exactly, discordant completion
    counts, and the degenerate no-pairs case returns NaNs."""
    from aosx.parallel.sweep import compare_configs

    K_ = 8
    rng = np.random.default_rng(3)
    base = rng.uniform(50.0, 150.0, size=K_)   # large per-orchard variance
    comp = np.ones((2, K_), bool)
    comp[0, 5] = False                          # only j completed seed 5
    comp[1, 6] = comp[1, 7] = False             # only i completed 6, 7
    table = dict(
        completed=comp,
        travel_distance=np.stack([base + 1.5, base]),   # constant paired shift
        steps_to_complete=np.stack([base * 2, base * 2]).astype(np.int32),
    )
    out = compare_configs(table, 0, 1)
    td = out["travel_distance"]
    assert td["n_pairs"] == 5
    assert np.isclose(td["mean_diff"], 1.5)
    # constant shift: every bootstrap resample has mean exactly 1.5
    assert np.isclose(td["ci_lo"], 1.5) and np.isclose(td["ci_hi"], 1.5)
    st = out["steps_to_complete"]
    assert np.isclose(st["mean_diff"], 0.0)
    assert st["ci_lo"] <= 0.0 <= st["ci_hi"]
    c = out["completion"]
    assert (c["only_i"], c["only_j"], c["n_seeds"]) == (2, 1, K_)
    assert np.isclose(c["rate_i"], 7 / 8) and np.isclose(c["rate_j"], 6 / 8)

    # unpaired comparison would NOT resolve the 1.5 m shift at this K and
    # variance — the pairing is what makes the sweep statistically usable
    sd_unpaired = np.std(base)
    assert sd_unpaired / np.sqrt(K_) > 1.5

    table["completed"] = np.zeros((2, K_), bool)
    out0 = compare_configs(table, 0, 1)
    assert out0["travel_distance"]["n_pairs"] == 0
    assert np.isnan(out0["travel_distance"]["mean_diff"])


def test_sweep_composes_with_shard_map():
    """C17 x sweep: per-lane AosParams rows shard across the mesh 'data'
    axis exactly like the lane state — a parameter sweep runs distributed
    over the v5e-8 mesh with each device evaluating its slice of the
    (configuration, seed) grid, equal to the single-device vmap bitwise."""
    from jax.sharding import Mesh, PartitionSpec as P

    from aosx.parallel.batch import (
        rollout_begin, rollout_chunk, rollout_finish,
    )

    cpus = jax.devices("cpu")
    n_dev = min(len(cpus), 4)
    if n_dev < 2:
        pytest.skip("needs multiple devices")
    mesh = Mesh(np.array(cpus[:n_dev]), ("data",))
    # n_dev lanes: configuration-major rows over a 2-config sweep
    stacked, _ = grid_params(heuristic_weight=[3.0, 1.0])
    rows = jax.tree_util.tree_map(
        lambda x: jnp.repeat(x, n_dev // 2, axis=0), stacked)
    keys = jax.random.split(jax.random.PRNGKey(11), n_dev // 2)
    keys = keys[jnp.tile(jnp.arange(n_dev // 2), 2)]
    n_steps, chunk = 40, 20

    def lane(k, p):
        world, st, acc = rollout_begin(k, SPEC, p, S, n_steps,
                                       ror_method="exact")
        for c in range(n_steps // chunk):
            st, acc = rollout_chunk(world, st, acc, p, S, chunk,
                                    jnp.int32(chunk * c))
        return rollout_finish(st, acc, S)

    with jax.default_device(cpus[0]):
        ref = jax.jit(jax.vmap(lane))(keys, rows)
        got = jax.jit(jax.shard_map(
            jax.vmap(lane), mesh=mesh, in_specs=P("data"),
            out_specs=P("data"), check_vma=False,
        ))(keys, rows)
    for name in ref:
        assert np.array_equal(np.asarray(ref[name]),
                              np.asarray(got[name])), name


def test_stack_params_roundtrip():
    a = params_as_f32(AosParams())
    b = params_as_f32(dataclasses.replace(AosParams(), docking_radius=0.3))
    stacked = stack_params([a, b])
    row1 = jax.tree_util.tree_map(lambda x: x[1], stacked)
    for f in AosParams.__dataclass_fields__:
        assert np.asarray(getattr(row1, f)) == np.asarray(getattr(b, f)), f
