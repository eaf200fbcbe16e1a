"""Incremental map update (aosx.incremental): bit-parity against the
from-scratch pass at every update level, gate selection, and contract
violation fallbacks. The reference recomputes everything per map callback
(aos_gvd_node.cpp:152-177); the incremental path must be indistinguishable
from doing the same."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from helpers import frames_growing, pc_frame

from aosx import engine, incremental
from aosx.config import TEST_STATICS as S, AosParams, params_as_f32
from aosx.orchards import OrchardSpec
from aosx.types import PointCloud, Polygon


def _frames(fracs, seed=5, spec=None):
    return frames_growing(fracs, S, seed=seed, spec=spec)


def _assert_world_equal(wa, wb):
    la = jax.tree_util.tree_leaves(wa)
    lb = jax.tree_util.tree_leaves(wb)
    assert len(la) == len(lb)
    for a, b in zip(la, lb):
        a, b = np.asarray(a), np.asarray(b)
        assert a.shape == b.shape and a.dtype == b.dtype
        if np.issubdtype(a.dtype, np.floating):
            assert np.array_equal(a, b, equal_nan=True), "float leaf mismatch"
        else:
            assert np.array_equal(a, b), "leaf mismatch"


@pytest.fixture(scope="module")
def setup():
    bufs, valids, poly = _frames([0.55, 0.8, 1.0])
    poly_j = Polygon.from_array(poly.astype(np.float32), S)
    params = params_as_f32(AosParams())
    excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)
    return bufs, valids, poly_j, params, excl


_pc = pc_frame


def test_incremental_parity_growing_map(setup):
    """Each updated state is bit-identical to a from-scratch pass on the
    same frame, across growing-map frames that change the skeleton."""
    bufs, valids, poly_j, params, excl = setup

    init = jax.jit(
        lambda pc: incremental.perceive_init(pc, poly_j, params, excl, S),
    )
    upd = jax.jit(
        lambda st, pc: incremental.perceive_update(st, pc, poly_j, params, excl, S),
    )
    scratch = jax.jit(
        lambda pc: engine.prepare_world_full(pc, poly_j, params, excl, S,
                                             ror_method="exact")[:2],
    )

    st = init(_pc(bufs, valids, 0))
    levels = []
    for f in range(3):
        st, level = upd(st, _pc(bufs, valids, f))
        levels.append(int(level))
        world_ref, out_ref = scratch(_pc(bufs, valids, f))
        _assert_world_equal(st.world, world_ref)
        _assert_world_equal(st.out, out_ref)
        # carried preprocess intermediates match a fresh pass (valid lanes)
        from aosx.perceive.points import preprocess_full
        _, keep_ref, cnt_ref, valid_ref, _, _ = jax.jit(
            lambda pc: preprocess_full(pc, poly_j, params, excl, S)
        )(_pc(bufs, valids, f))
        assert np.array_equal(np.asarray(st.keep), np.asarray(keep_ref))
        v = np.asarray(valid_ref)
        assert np.array_equal(np.asarray(st.cnt)[v], np.asarray(cnt_ref)[v])

    # frame 0 re-fed is a no-op delta -> full reuse; later frames add rows
    assert levels[0] == incremental.LEVEL_REUSE_WORLD
    assert all(
        l in (incremental.LEVEL_DOWNSTREAM, incremental.LEVEL_REUSE_DOWNSTREAM,
              incremental.LEVEL_REUSE_WORLD)
        for l in levels[1:]
    )
    # a 45% -> 100% growth must change the skeleton at least once
    assert incremental.LEVEL_DOWNSTREAM in levels[1:]


def test_incremental_densify_reuses_world(setup):
    """Adding points that land in already-occupied cells leaves the
    inflated plane unchanged -> level 0 full reuse, still bit-exact."""
    bufs, valids, poly_j, params, excl = setup
    st = jax.jit(
        lambda pc: incremental.perceive_init(pc, poly_j, params, excl, S),
    )(_pc(bufs, valids, 2))

    # densify: copy a block of existing valid points (exact duplicates ->
    # same cells, ROR counts grow) into free slots
    n_valid = int(valids[2].sum())
    extra = min(200, S.max_points - n_valid)
    bufs2 = bufs[2].copy()
    valids2 = valids[2].copy()
    bufs2[n_valid:n_valid + extra] = bufs[2][:extra]
    valids2[n_valid:n_valid + extra] = True
    pc2 = PointCloud(xyz=jnp.asarray(bufs2), valid=jnp.asarray(valids2))

    st2, level = jax.jit(
        lambda st, pc: incremental.perceive_update(st, pc, poly_j, params, excl, S),
    )(st, pc2)
    assert int(level) == incremental.LEVEL_REUSE_WORLD
    world_ref, out_ref = jax.jit(
        lambda pc: engine.prepare_world_full(pc, poly_j, params, excl, S,
                                             ror_method="exact")[:2],
    )(pc2)
    _assert_world_equal(st2.world, world_ref)
    _assert_world_equal(st2.out, out_ref)


def test_incremental_contract_violations_fall_back(setup):
    """Removed or moved points (SLAM loop closure) and delta overflow are
    detected in-jit and take the exact from-scratch fallback."""
    bufs, valids, poly_j, params, excl = setup
    init = jax.jit(
        lambda pc: incremental.perceive_init(pc, poly_j, params, excl, S),
    )
    upd = jax.jit(
        lambda st, pc: incremental.perceive_update(st, pc, poly_j, params, excl, S),
    )
    st = init(_pc(bufs, valids, 1))

    # (a) removal: drop one valid point
    valids_rm = valids[1].copy()
    first = int(np.flatnonzero(valids_rm)[0])
    valids_rm[first] = False
    st_rm, level = upd(st, PointCloud(xyz=jnp.asarray(bufs[1]),
                                      valid=jnp.asarray(valids_rm)))
    assert int(level) == incremental.LEVEL_FULL
    world_ref, _ = jax.jit(
        lambda pc: engine.prepare_world_full(pc, poly_j, params, excl, S,
                                             ror_method="exact")[:2],
    )(PointCloud(xyz=jnp.asarray(bufs[1]), valid=jnp.asarray(valids_rm)))
    _assert_world_equal(st_rm.world, world_ref)

    # (b) moved: perturb one valid point's coordinates
    bufs_mv = bufs[1].copy()
    bufs_mv[first, 0] += 0.25
    _, level = upd(st, PointCloud(xyz=jnp.asarray(bufs_mv),
                                  valid=jnp.asarray(valids[1])))
    assert int(level) == incremental.LEVEL_FULL

    # (c) delta overflow: more than max_delta_points new points
    assert S.max_points - valids[1].sum() > S.max_delta_points, \
        "test needs headroom"
    bufs_of = bufs[1].copy()
    valids_of = valids[1].copy()
    n_valid = int(valids[1].sum())
    extra = S.max_delta_points + 1
    bufs_of[n_valid:n_valid + extra] = bufs[1][0] + np.linspace(
        0, 0.5, extra, dtype=np.float32)[:, None] * np.float32([0.0, 1.0, 0.0])
    valids_of[n_valid:n_valid + extra] = True
    _, level = upd(st, PointCloud(xyz=jnp.asarray(bufs_of),
                                  valid=jnp.asarray(valids_of)))
    assert int(level) == incremental.LEVEL_FULL


def test_incremental_config_change_forces_full(setup):
    """A changed exclusion disc / params leaf with an EMPTY point delta must
    take the from-scratch branch, not return the stale world as a reuse
    level (the downstream world is a function of poly/params/exclusions;
    module-docstring contract). The review scenario: an operator adds an
    exclusion zone mid-survey, the next SLAM frame has no new points."""
    import dataclasses

    bufs, valids, poly_j, params, excl = setup
    init = jax.jit(
        lambda pc: incremental.perceive_init(pc, poly_j, params, excl, S),
    )
    upd = jax.jit(
        lambda st, pc, p, e: incremental.perceive_update(
            st, pc, poly_j, p, e, S),
    )
    scratch = jax.jit(
        lambda pc, p, e: engine.prepare_world_full(
            pc, poly_j, p, e, S, ror_method="exact")[0],
    )
    pc = _pc(bufs, valids, 1)
    st = init(pc)

    # sanity: unchanged config + unchanged cloud stays full reuse
    _, level = upd(st, pc, params, excl)
    assert int(level) == incremental.LEVEL_REUSE_WORLD

    # (a) an exclusion disc appears over real points, same buffer shape
    first = int(np.flatnonzero(valids[1])[0])
    excl_new = np.zeros(excl.shape, np.float32)
    excl_new[0] = [bufs[1][first, 0], bufs[1][first, 1], 1.0]
    excl_new = jnp.asarray(excl_new)
    st_e, level = upd(st, pc, params, excl_new)
    assert int(level) == incremental.LEVEL_FULL
    _assert_world_equal(st_e.world, scratch(pc, params, excl_new))
    # the new state carries the new config: repeating it is full reuse again
    _, level = upd(st_e, pc, params, excl_new)
    assert int(level) == incremental.LEVEL_REUSE_WORLD

    # (b) a changed AosParams leaf (graph-stage knob) also invalidates
    params_new = params_as_f32(dataclasses.replace(
        AosParams(), proximity_edge_dist=0.25))
    st_p, level = upd(st, pc, params_new, excl)
    assert int(level) == incremental.LEVEL_FULL
    _assert_world_equal(st_p.world, scratch(pc, params_new, excl))


def test_incremental_level1_reuses_downstream(setup):
    """LEVEL_REUSE_DOWNSTREAM: the inflated plane changes but the skeleton
    is identical -> graph/costmat/waypoints reused, occupancy refreshed.
    The frame is found by searching candidate added points (deterministic:
    fixed grid of offsets around the map's occupied region) for one whose
    inflation bump survives into the plane but is erased by morph open /
    thinning; the incremental result must still be bit-identical."""
    bufs, valids, poly_j, params, excl = setup
    import jax.numpy as jnp

    from aosx.perceive.raster import generate_grid, inflate
    from aosx.perceive.skeleton import skeletonize
    from aosx.perceive.points import preprocess_full

    pc0 = _pc(bufs, valids, 2)
    st = jax.jit(
        lambda pc: incremental.perceive_init(pc, poly_j, params, excl, S),
    )(pc0)

    @jax.jit
    def probe_frame(pc):
        xy, keep, _, _, bounds, _ = preprocess_full(pc, poly_j, params, excl, S)
        grid = generate_grid(xy, keep, bounds, S)
        infl = inflate(grid, S)
        skel = skeletonize(infl, S)
        return (jnp.any(infl.occ != st.inflated.occ),
                jnp.all(skel.occ == st.out.skeleton.occ))

    # candidates: offsets around existing valid points; need 3+ duplicates
    # per spot so the new points pass ROR against each other + the base map
    n_valid = int(valids[2].sum())
    base_pts = bufs[2][:n_valid]
    found = None
    for src_i in range(0, min(n_valid, 400), 7):
        for off in ((0.25, 0.0), (0.0, 0.25), (-0.25, 0.0), (0.0, -0.25)):
            cand = base_pts[src_i] + np.float32([off[0], off[1], 0.0])
            bufs2 = bufs[2].copy()
            valids2 = valids[2].copy()
            bufs2[n_valid:n_valid + 3] = cand  # 3 coincident points
            valids2[n_valid:n_valid + 3] = True
            pc2 = PointCloud(xyz=jnp.asarray(bufs2), valid=jnp.asarray(valids2))
            infl_changed, skel_same = probe_frame(pc2)
            if bool(infl_changed) and bool(skel_same):
                found = pc2
                break
        if found is not None:
            break
    if found is None:
        pytest.skip("no level-1 frame found in the candidate set")

    st2, level = jax.jit(
        lambda st, pc: incremental.perceive_update(st, pc, poly_j, params, excl, S),
    )(st, found)
    assert int(level) == incremental.LEVEL_REUSE_DOWNSTREAM
    world_ref, out_ref = jax.jit(
        lambda pc: engine.prepare_world_full(pc, poly_j, params, excl, S,
                                             ror_method="exact")[:2],
    )(found)
    _assert_world_equal(st2.world, world_ref)
    _assert_world_equal(st2.out, out_ref)


@pytest.mark.slow
def test_replay_incremental_matches_full_replay(setup):
    """replay_episode_incremental reproduces engine.replay_episode's
    closed-loop behavior exactly on a growing map (same worlds at every
    frame -> same metrics), and completes the mission."""
    bufs, valids, poly_j, params, excl = setup
    frames = PointCloud(xyz=jnp.asarray(bufs), valid=jnp.asarray(valids))

    run_inc = jax.jit(
        lambda fr: incremental.replay_episode_incremental(
            fr, poly_j, params, excl, S, steps_per_frame=1100,
            ror_method="exact"),
    )
    final_i, metrics_i = run_inc(frames)
    run_full = jax.jit(
        lambda fr: engine.replay_episode(
            fr, poly_j, params, excl, S, steps_per_frame=1100,
            ror_method="exact"),
    )
    final_f, metrics_f = run_full(frames)

    lv = metrics_i.pop("inc_level")
    for k in metrics_f:
        assert np.array_equal(
            np.asarray(metrics_i[k]), np.asarray(metrics_f[k])), k
    _assert_world_equal(final_i, final_f)
    assert bool(np.asarray(final_i.mission.exploration_completed))
    # at least one frame actually reused work
    assert int(np.asarray(lv)[0]) == incremental.LEVEL_REUSE_WORLD


def test_replay_incremental_cached_matches_incremental(setup):
    """The full production serving loop — incremental world gates + plan
    cache + carry row across rebuilds — reproduces
    replay_episode_incremental bit-exactly on a growing map whose graph
    changes mid-mission, and completes the mission. The first tick after a
    rebuild reads the carry row (the control tick precedes the replan in
    step_cached), so keep-last-path across rebuilds is exercised, not just
    covered."""
    bufs, valids, poly_j, params, excl = setup
    frames = PointCloud(xyz=jnp.asarray(bufs), valid=jnp.asarray(valids))

    final_i, metrics_i = jax.jit(
        lambda fr: incremental.replay_episode_incremental(
            fr, poly_j, params, excl, S, steps_per_frame=1100,
            ror_method="exact"),
    )(frames)
    final_c, metrics_c = jax.jit(
        lambda fr: incremental.replay_episode_incremental_cached(
            fr, poly_j, params, excl, S, steps_per_frame=1100,
            ror_method="exact"),
    )(frames)

    lv_i = np.asarray(metrics_i.pop("inc_level"))
    lv_c = np.asarray(metrics_c.pop("inc_level"))
    assert np.array_equal(lv_i, lv_c)
    assert set(metrics_i) == set(metrics_c)
    for k in metrics_i:
        assert np.array_equal(
            np.asarray(metrics_i[k]), np.asarray(metrics_c[k])), k
    for fld in ("robot", "mission", "control", "wp", "last_mod", "t"):
        _assert_world_equal(getattr(final_i, fld), getattr(final_c, fld))
    assert bool(np.asarray(final_c.mission.exploration_completed))
    # the sequence must actually exercise a cache rebuild mid-mission
    assert (lv_c >= incremental.LEVEL_DOWNSTREAM).any()


def test_serve_frames_split_matches_single_scan(setup):
    """incremental.serve_frames invoked in two chunks (a survey served
    across a checkpoint boundary, or the steady-state bench's standalone
    loop, benchmarks/bench_steady.py) is bit-identical to one scan over all
    frames: ALL serving state must live in ServeState, none in closure."""
    from aosx import serving

    bufs, valids, poly_j, params, excl = setup
    frames = PointCloud(xyz=jnp.asarray(bufs), valid=jnp.asarray(valids))
    tm = jax.tree_util.tree_map

    sv0 = jax.jit(
        lambda pc: serving.serve_init(pc, poly_j, params, excl, S,
                                      ror_method="exact"),
    )(tm(lambda x: x[0], frames))

    def run(sv, fr):
        return incremental.serve_frames(sv, fr, poly_j, params, excl, S,
                                        steps_per_frame=300,
                                        ror_method="exact")

    sv_all, m_all = jax.jit(run)(sv0, frames)
    sv_a, m_a = jax.jit(run)(sv0, tm(lambda x: x[:2], frames))
    sv_b, m_b = jax.jit(run)(sv_a, tm(lambda x: x[2:], frames))

    _assert_world_equal(sv_all.st, sv_b.st)
    _assert_world_equal(sv_all.cache, sv_b.cache)
    _assert_world_equal(sv_all.lite, sv_b.lite)
    assert set(m_all) == set(m_a) == set(m_b)
    for k in m_all:
        joined = np.concatenate([np.asarray(m_a[k]), np.asarray(m_b[k])])
        assert np.array_equal(np.asarray(m_all[k]), joined), k


def test_incremental_fuzz_parity():
    """Randomized differential fuzz: random orchard shapes, random growing
    frame schedules, and an injected contract violation — every update must
    be bit-identical to the from-scratch pass on the same frame regardless
    of which reuse level the gates pick. Shapes are constant across
    scenarios so the three jits compile once."""
    _FUZZ_PARAMS = params_as_f32(AosParams())
    _FUZZ_EXCL = jnp.zeros((S.max_exclusions, 3), jnp.float32)
    init = jax.jit(
        lambda pc, poly: incremental.perceive_init(
            pc, poly, _FUZZ_PARAMS, _FUZZ_EXCL, S),
    )
    upd = jax.jit(
        lambda st, pc, poly: incremental.perceive_update(
            st, pc, poly, _FUZZ_PARAMS, _FUZZ_EXCL, S),
    )
    scratch = jax.jit(
        lambda pc, poly: engine.prepare_world_full(
            pc, poly, _FUZZ_PARAMS, _FUZZ_EXCL, S, ror_method="exact")[:2],
    )

    rng = np.random.default_rng(2026)
    for case in range(3):
        spec = OrchardSpec(
            n_rows=int(rng.integers(2, 5)),
            row_len=float(rng.uniform(8.0, 14.0)),
            row_spacing=float(rng.uniform(3.5, 5.0)),
            origin=(float(rng.uniform(4.0, 7.0)), float(rng.uniform(3.0, 5.0))),
            noise_pts=int(rng.integers(16, 64)),
        )
        fracs = np.sort(rng.uniform(0.4, 0.95, size=2)).tolist() + [1.0]
        bufs, valids, poly = _frames(fracs, seed=int(rng.integers(0, 1 << 16)),
                                     spec=spec)
        poly_j = Polygon.from_array(poly.astype(np.float32), S)

        st = init(_pc(bufs, valids, 0), poly_j)
        seen = []
        for f in range(3):
            st, level = upd(st, _pc(bufs, valids, f), poly_j)
            seen.append(int(level))
            world_ref, out_ref = scratch(_pc(bufs, valids, f), poly_j)
            _assert_world_equal(st.world, world_ref)
            _assert_world_equal(st.out, out_ref)

        # injected violation: move one valid point (loop closure) -> the
        # exact fallback must fire and still match from-scratch
        bufs_mv = bufs[2].copy()
        first = int(np.flatnonzero(valids[2])[0])
        bufs_mv[first, 1] += float(rng.uniform(0.2, 0.6))
        pc_mv = PointCloud(xyz=jnp.asarray(bufs_mv), valid=jnp.asarray(valids[2]))
        st, level = upd(st, pc_mv, poly_j)
        assert int(level) == incremental.LEVEL_FULL, (case, seen)
        world_ref, out_ref = scratch(pc_mv, poly_j)
        _assert_world_equal(st.world, world_ref)
        _assert_world_equal(st.out, out_ref)

        # re-feed of the same frame: empty delta -> full reuse, still equal
        st, level = upd(st, pc_mv, poly_j)
        assert int(level) == incremental.LEVEL_REUSE_WORLD, (case, seen)
        _assert_world_equal(st.world, world_ref)


def test_level2_recompute_reseeds_guards(setup):
    """A level-2 downstream recompute must not inherit the previous
    skeleton's cluster/graph guard bits: out.guards is rebuilt from the
    PREPROCESS-era bits (IncrementalState.pre_guards) plus this frame's
    cluster guards, exactly like a from-scratch pass. A stale bit would
    otherwise accumulate forever (and hard-invalidate lanes in fast-only
    MC mode)."""
    import dataclasses

    from aosx.guards import GUARD_CLUSTER_LEN

    bufs, valids, poly_j, params, excl = setup
    upd = jax.jit(
        lambda st, pc: incremental.perceive_update(st, pc, poly_j, params,
                                                   excl, S),
    )
    scratch = jax.jit(
        lambda pc: engine.prepare_world_full(pc, poly_j, params, excl, S,
                                             ror_method="exact")[:2],
    )
    st = jax.jit(
        lambda pc: incremental.perceive_init(pc, poly_j, params, excl, S),
    )(_pc(bufs, valids, 0))
    # simulate a previous frame whose cluster stage tripped a guard
    st = dataclasses.replace(
        st,
        out=dataclasses.replace(st.out, guards=st.out.guards
                                | GUARD_CLUSTER_LEN),
        world=dataclasses.replace(st.world, guards=st.world.guards
                                  | GUARD_CLUSTER_LEN),
    )

    hit_level2 = False
    for f in (1, 2):
        st, level = upd(st, _pc(bufs, valids, f))
        if int(level) == incremental.LEVEL_DOWNSTREAM:
            hit_level2 = True
            world_ref, out_ref = scratch(_pc(bufs, valids, f))
            assert int(np.asarray(st.out.guards)) == \
                int(np.asarray(out_ref.guards))
            assert int(np.asarray(st.world.guards)) == \
                int(np.asarray(world_ref.guards))
            break
    assert hit_level2, "fixture no longer produces a level-2 frame"
