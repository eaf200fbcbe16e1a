"""Batch-axis correctness (SURVEY.md section 4 test #4): a vmapped batch of
one orchard equals the unbatched pipeline exactly, and the shard_map variant
equals the vmap variant."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aosx.config import DRYRUN_STATICS as S, AosParams, params_as_f32
from aosx.orchards import OrchardSpec
from aosx.parallel.batch import batched_rollouts, rollout_one, sharded_rollouts

SPEC = OrchardSpec(
    n_rows=2, row_len=4.0, row_spacing=2.0, tree_spacing=1.0,
    trunk_pts=10, noise_pts=16, origin=(2.0, 2.0), polygon_pad=1.0,
)
N_STEPS = 5


@pytest.fixture(scope="module")
def params():
    return params_as_f32(AosParams())


def test_vmap_consistency(params):
    key = jax.random.PRNGKey(42)
    single = jax.jit(
        lambda k: rollout_one(k, SPEC, params, S, N_STEPS, ror_method="exact")
    )(key)
    batch = jax.jit(
        lambda k: batched_rollouts(k, SPEC, params, S, N_STEPS, ror_method="exact")
    )(key[None])
    for name in single:
        a = np.asarray(single[name])
        b = np.asarray(batch[name])[0]
        assert np.array_equal(a, b), (name, a, b)


def test_shard_map_matches_vmap(params):
    from jax.sharding import Mesh

    cpus = jax.devices("cpu")
    n_dev = min(len(cpus), 8)
    if n_dev < 2:
        pytest.skip("needs multiple devices")
    mesh = Mesh(np.array(cpus[:n_dev]), ("data",))
    keys = jax.random.split(jax.random.PRNGKey(7), n_dev)
    with jax.default_device(cpus[0]):
        ref = jax.jit(
            lambda k: batched_rollouts(k, SPEC, params, S, N_STEPS, ror_method="exact")
        )(keys)
        out, done = sharded_rollouts(
            keys, SPEC, params, S, N_STEPS, mesh, ror_method="exact"
        )
    for name in ref:
        a = np.asarray(ref[name])
        b = np.asarray(out[name])
        assert np.array_equal(a, b), name
    assert int(done) == int(np.asarray(ref["completed"]).astype(np.int32).sum())


def test_spatial_sharded_inflation():
    """Row-sharded inflation with ppermute halo exchange == single-device."""
    from jax.sharding import Mesh
    from aosx.parallel.spatial import inflate_sharded
    from aosx.perceive.raster import inflate
    from aosx.types import GridWorld

    cpus = jax.devices("cpu")
    if len(cpus) < 4:
        pytest.skip("needs >= 4 devices")
    mesh = Mesh(np.array(cpus[:4]), ("space",))
    rng = np.random.default_rng(11)
    occ = (rng.random((S.grid_h, S.grid_w)) < 0.01).astype(np.uint8)
    grid = GridWorld(
        occ=jnp.asarray(occ),
        origin_x=jnp.float32(0), origin_y=jnp.float32(0),
        h_cells=jnp.int32(S.grid_h - 7), w_cells=jnp.int32(S.grid_w - 13),
    )
    with jax.default_device(cpus[0]):
        ref = jax.jit(lambda g: inflate(g, S))(grid)
        got = jax.jit(lambda g: inflate_sharded(g, S, mesh))(grid)
    assert np.array_equal(np.asarray(ref.occ), np.asarray(got.occ))


def test_spatial_sharded_skeletonize():
    """Row-sharded morph open + Zhang-Suen (1-row halo exchange per stencil,
    psum'd fixpoint flag) == single-device skeletonize, bit-exact, including
    a live region smaller than the padded grid."""
    from jax.sharding import Mesh
    from aosx.parallel.spatial import skeletonize_sharded
    from aosx.perceive.skeleton import skeletonize
    from aosx.types import GridWorld

    cpus = jax.devices("cpu")
    if len(cpus) < 4:
        pytest.skip("needs >= 4 devices")
    mesh = Mesh(np.array(cpus[:4]), ("space",))
    rng = np.random.default_rng(13)
    # blobby occupancy so thinning actually iterates
    occ = (rng.random((S.grid_h, S.grid_w)) < 0.18).astype(np.uint8)
    grid = GridWorld(
        occ=jnp.asarray(occ),
        origin_x=jnp.float32(0), origin_y=jnp.float32(0),
        h_cells=jnp.int32(S.grid_h - 5), w_cells=jnp.int32(S.grid_w - 9),
    )
    with jax.default_device(cpus[0]):
        ref = jax.jit(lambda g: skeletonize(g, S))(grid)
        got = jax.jit(lambda g: skeletonize_sharded(g, S, mesh))(grid)
    assert np.array_equal(np.asarray(ref.occ), np.asarray(got.occ))


def test_chunked_rollout_matches_monolithic():
    """begin + k chunks + finish == rollout_one (exact integer fields; travel
    within float-reassociation tolerance)."""
    from aosx.parallel.batch import (
        rollout_begin, rollout_chunk, rollout_finish, rollout_one,
    )
    from aosx.config import DRYRUN_STATICS as DS

    spec = SPEC
    params = params_as_f32(AosParams())
    key = jax.random.PRNGKey(3)
    n_steps = 60

    ref = jax.jit(
        lambda k: rollout_one(k, spec, params, DS, n_steps, ror_method="exact")
    )(key)

    world, st, acc = jax.jit(
        lambda k: rollout_begin(k, spec, params, DS, n_steps, ror_method="exact")
    )(key)
    chunk = jax.jit(
        lambda w, st, acc, off: rollout_chunk(w, st, acc, params, DS, 20, off)
    )
    for c in range(3):
        st, acc = chunk(world, st, acc, jnp.int32(20 * c))
    got = rollout_finish(st, acc, DS)

    for k2 in ("completed", "steps_to_complete", "final_status", "waypoints"):
        assert int(np.asarray(got[k2])) == int(np.asarray(ref[k2])), k2
    for k2 in ("travel_distance", "final_dist_to_origin"):
        assert abs(float(got[k2]) - float(ref[k2])) < 1e-3, k2


def test_vmap_consistency_fast_only_mode(params):
    """The MC fast-only configuration (exact_fallbacks=False) must also be
    vmap-consistent: batch-of-1 == unbatched, exactly."""
    import dataclasses

    S2 = dataclasses.replace(S, exact_fallbacks=False)
    key = jax.random.PRNGKey(17)
    single = jax.jit(
        lambda k: rollout_one(k, SPEC, params, S2, N_STEPS, ror_method="exact")
    )(key)
    batch = jax.jit(
        lambda k: batched_rollouts(k, SPEC, params, S2, N_STEPS, ror_method="exact")
    )(key[None])
    for name in single:
        a = np.asarray(single[name])
        b = np.asarray(batch[name])[0]
        assert np.array_equal(a, b), (name, a, b)


def test_dryrun_hermetic_vs_poisoned_plugin(tmp_path):
    """VERDICT r2 #1: the multi-chip gate must be physically unable to fail
    on TPU-plugin state. Simulate a present-and-broken plugin: a poisoned
    sitecustomize.py on the parent's PYTHONPATH (stamps a marker at every
    interpreter start, like the real axon site hook) plus JAX_PLATFORMS=axon
    (which, with no axon backend registered, makes ANY jax device query
    raise). dryrun_multichip must still pass, and the marker must show the
    sanitized inner subprocess never imported the poison."""
    import os
    import subprocess
    import sys

    poison = tmp_path / "poison_site"
    poison.mkdir()
    marker = tmp_path / "marker.txt"
    (poison / "sitecustomize.py").write_text(
        "with open(%r, 'a') as f:\n    f.write('imported\\n')\n" % str(marker)
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["PYTHONPATH"] = f"{poison}:{repo}"
    env["JAX_PLATFORMS"] = "axon"
    env.pop("XLA_FLAGS", None)
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(2)"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-2000:])
    assert "dryrun_multichip ok: 2 devices" in proc.stdout
    assert "dryrun spatial sharding ok" in proc.stdout
    # poison ran in the parent (1 line) but NOT in the sanitized inner proc
    assert marker.read_text() == "imported\n"


def test_flagged_lane_cannot_report_success(params):
    """VERDICT r2 #5: in fast-only mode (exact_fallbacks=False) a
    guard-flagged lane must be hard-invalidated by the engine itself -
    completed=False, final_status=Failed - no matter what the mission FSM
    says. Exact mode keeps guards informational."""
    import dataclasses

    from aosx.parallel.batch import _invalidate_flagged

    poisoned = dict(
        completed=jnp.bool_(True),          # mission claims success...
        steps_to_complete=jnp.int32(42),
        final_status=jnp.int32(3),          # ...and "Exploration Complete"
        travel_distance=jnp.float32(12.5),
        final_dist_to_origin=jnp.float32(0.01),
        waypoints=jnp.int32(7),
        guards=jnp.int32(2),                # but a stage overflowed
    )
    S_fast = dataclasses.replace(S, exact_fallbacks=False)
    out = _invalidate_flagged(dict(poisoned), S_fast)
    assert not bool(out["completed"])
    assert int(out["final_status"]) == 1        # Failed
    assert int(out["steps_to_complete"]) == 42  # diagnostics preserved
    # exact mode: fallbacks corrected the result; flag is informational
    out_exact = _invalidate_flagged(dict(poisoned), S)
    assert bool(out_exact["completed"])
    assert int(out_exact["final_status"]) == 3
    # clean lane unaffected in either mode
    clean = dict(poisoned, guards=jnp.int32(0))
    out_clean = _invalidate_flagged(dict(clean), S_fast)
    assert bool(out_clean["completed"])
    assert int(out_clean["final_status"]) == 3


def test_flagged_lane_end_to_end(params):
    """A genuinely tripped guard (skeleton buffer overflow via a tiny
    max_skel_cells cap) must surface in the rollout summary's guards field
    and, in fast-only mode, force the lane to not-completed/Failed."""
    import dataclasses

    from aosx.guards import GUARD_SKEL_OVERFLOW

    S_tiny = dataclasses.replace(S, exact_fallbacks=False, max_skel_cells=8)
    key = jax.random.PRNGKey(0)
    out = jax.jit(
        lambda k: rollout_one(k, SPEC, params, S_tiny, N_STEPS,
                              ror_method="exact")
    )(key)
    assert int(out["guards"]) & GUARD_SKEL_OVERFLOW
    assert not bool(out["completed"])
    assert int(out["final_status"]) == 1


def test_sustained_rollouts_accounting_and_parity(params):
    """VERDICT r2 #2: sustained rollouts with lane refill. Every started
    rollout is recorded exactly once (100% completion accounting), and each
    record equals the fixed-budget rollout_one result for the same key:
    budget-exhausted lanes ran exactly the budget, completed lanes are
    frozen (mode 3 at the origin) for their post-completion ticks."""
    from aosx.parallel.batch import sustained_rollouts

    total, batch, budget = 8, 4, 60
    res, stats = sustained_rollouts(
        total, batch, SPEC, params, S, budget,
        chunk_steps=20, refill=2, seed=5, ror_method="exact",
    )
    assert all(v.shape[0] == total for v in res.values())
    assert stats["begin_calls"] >= total // 2  # refill actually happened

    keys = jax.random.split(jax.random.PRNGKey(5), total)
    one = jax.jit(
        lambda k: rollout_one(k, SPEC, params, S, budget, ror_method="exact")
    )
    for i in range(total):
        ref = jax.tree_util.tree_map(np.asarray, one(keys[i]))
        for k in ("completed", "steps_to_complete", "final_status",
                  "waypoints", "guards"):
            assert int(res[k][i]) == int(ref[k]), (i, k, res[k][i], ref[k])
        for k in ("travel_distance", "final_dist_to_origin"):
            assert abs(float(res[k][i]) - float(ref[k])) < 1e-3, (i, k)


def test_spatial_sharded_jump_flood():
    """Row-sharded 1+JFA (whole-shard ppermute row shifts, shared
    jacobi_fold) == single-device jump_flood, bit-exact, on random seeds
    over a live region smaller than the padded grid. Pass offsets reach
    128 rows > the 48-row shard height, so the multi-shard (q > 0) moves
    are exercised."""
    from jax.sharding import Mesh
    from aosx.gvd.voronoi import jump_flood
    from aosx.parallel.spatial import jump_flood_sharded
    from aosx.types import GridWorld, SeedSet

    cpus = jax.devices("cpu")
    if len(cpus) < 4:
        pytest.skip("needs >= 4 devices")
    mesh = Mesh(np.array(cpus[:4]), ("space",))
    rng = np.random.default_rng(17)
    occ = (rng.random((S.grid_h, S.grid_w)) < 0.05).astype(np.uint8)
    grid = GridWorld(
        occ=jnp.asarray(occ),
        origin_x=jnp.float32(-1.5), origin_y=jnp.float32(0.5),
        h_cells=jnp.int32(S.grid_h - 11), w_cells=jnp.int32(S.grid_w - 3),
    )
    ns = 64
    xy = np.stack([
        -1.5 + rng.random(ns) * S.grid_w * S.resolution,
        0.5 + rng.random(ns) * S.grid_h * S.resolution,
    ], axis=1).astype(np.float32)
    # a duplicated cell exercises the min-seed-idx tie break
    xy[1] = xy[0]
    seeds = SeedSet(
        xy=jnp.asarray(xy),
        valid=jnp.asarray(rng.random(ns) < 0.9),
        kind=jnp.zeros((ns,), jnp.int8),
    )
    with jax.default_device(cpus[0]):
        ref = jax.jit(lambda g, se: jump_flood(g, se, S))(grid, seeds)
        got = jax.jit(
            lambda g, se: jump_flood_sharded(g, se, S, mesh))(grid, seeds)
    assert np.array_equal(np.asarray(ref), np.asarray(got))


def test_prepare_world_sharded_stencils(params):
    """VERDICT r2 #7: the spatial axis composed into the pipeline - the full
    prepare_world with row-sharded inflation + skeletonization must be
    bit-identical to the single-device world (graph/costmat/waypoints and
    all), not just the standalone stencils."""
    from jax.sharding import Mesh
    from aosx import engine
    from aosx.orchards import make_orchard

    cpus = jax.devices("cpu")
    if len(cpus) < 4:
        pytest.skip("needs >= 4 devices")
    mesh = Mesh(np.array(cpus[:4]), ("space",))
    key = jax.random.PRNGKey(2)
    pc, poly = make_orchard(key, SPEC, S)
    excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)
    with jax.default_device(cpus[0]):
        w_ref = jax.jit(
            lambda pc, poly, pr, ex: engine.prepare_world(
                pc, poly, pr, ex, S, ror_method="exact")
        )(pc, poly, params, excl)
        w_sh = jax.jit(
            lambda pc, poly, pr, ex: engine.prepare_world(
                pc, poly, pr, ex, S, ror_method="exact", stencil_mesh=mesh)
        )(pc, poly, params, excl)
    for lr, ls in zip(jax.tree_util.tree_leaves(w_ref),
                      jax.tree_util.tree_leaves(w_sh)):
        assert np.array_equal(np.asarray(lr), np.asarray(ls))


def test_incremental_sharded_stencils(params):
    """The round-3 serving path on the spatial axis: perceive_init +
    perceive_update with row-sharded stencils (+ sharded JFA inside the
    graph build) must be bit-identical to the single-device incremental
    path at every reuse level, with the SAME levels taken (the equality
    gates compare identical planes)."""
    from jax.sharding import Mesh
    from helpers import frames_growing, pc_frame
    from aosx import incremental
    from aosx.types import Polygon

    cpus = jax.devices("cpu")
    if len(cpus) < 4:
        pytest.skip("needs >= 4 devices")
    mesh = Mesh(np.array(cpus[:4]), ("space",))
    bufs, valids, poly = frames_growing([0.55, 1.0], S, seed=7, spec=SPEC)
    poly_j = Polygon.from_array(poly.astype(np.float32), S)
    excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)

    with jax.default_device(cpus[0]):
        # host_jit, not jax.jit: repeat host-loop dispatch of const-carrying
        # executables is broken in jax 0.9.0 (serving.host_jit docstring)
        from aosx.serving import host_jit

        init_r = host_jit(lambda pc: incremental.perceive_init(
            pc, poly_j, params, excl, S))
        upd_r = host_jit(lambda st, pc: incremental.perceive_update(
            st, pc, poly_j, params, excl, S))
        init_s = host_jit(lambda pc: incremental.perceive_init(
            pc, poly_j, params, excl, S, stencil_mesh=mesh))
        upd_s = host_jit(lambda st, pc: incremental.perceive_update(
            st, pc, poly_j, params, excl, S, stencil_mesh=mesh))

        st_r = init_r(pc_frame(bufs, valids, 0))
        st_s = init_s(pc_frame(bufs, valids, 0))
        for f in range(2):
            st_r, lv_r = upd_r(st_r, pc_frame(bufs, valids, f))
            st_s, lv_s = upd_s(st_s, pc_frame(bufs, valids, f))
            assert int(lv_r) == int(lv_s), f
            for lr, ls in zip(jax.tree_util.tree_leaves(st_r),
                              jax.tree_util.tree_leaves(st_s)):
                lr, ls = np.asarray(lr), np.asarray(ls)
                eq_nan = np.issubdtype(lr.dtype, np.floating)
                assert np.array_equal(lr, ls, equal_nan=eq_nan)
        # the growth must exercise a downstream recompute under the mesh
        assert int(lv_s) >= incremental.LEVEL_REUSE_DOWNSTREAM


def test_shard_map_cached_rollouts(params):
    """C17 x plan cache: the plan-cached chunked rollout (begin_cached +
    chunk_cached + finish) shard_maps across the mesh 'data' axis and equals
    the single-device vmapped result exactly — the cached MC path composes
    with the distribution substrate, not just with vmap."""
    from jax.sharding import Mesh, PartitionSpec as P

    from aosx.parallel.batch import (
        rollout_begin_cached, rollout_chunk_cached, rollout_finish,
    )

    cpus = jax.devices("cpu")
    n_dev = min(len(cpus), 8)
    if n_dev < 2:
        pytest.skip("needs multiple devices")
    mesh = Mesh(np.array(cpus[:n_dev]), ("data",))
    keys = jax.random.split(jax.random.PRNGKey(11), n_dev)
    n_steps, chunk = 40, 20

    def lane(k):
        lite, cache, st, acc = rollout_begin_cached(
            k, SPEC, params, S, n_steps, ror_method="exact")
        for c in range(n_steps // chunk):
            st, acc = rollout_chunk_cached(
                lite, cache, st, acc, params, S, chunk, jnp.int32(chunk * c))
        return rollout_finish(st, acc, S)

    with jax.default_device(cpus[0]):
        ref = jax.jit(jax.vmap(lane))(keys)
        got = jax.jit(jax.shard_map(
            jax.vmap(lane), mesh=mesh, in_specs=P("data"),
            out_specs=P("data"), check_vma=False,
        ))(keys)
    for name in ref:
        assert np.array_equal(np.asarray(ref[name]),
                              np.asarray(got[name])), name
