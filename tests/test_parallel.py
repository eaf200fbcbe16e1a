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
    got = rollout_finish(st, acc)

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
