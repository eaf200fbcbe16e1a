"""Guard triggers for the documented bounded approximations (PARITY.md §3):
each cap must be DETECTED (guard bit set) and, where a fallback exists, the
decisions must match the exact path (VERDICT r1 #7)."""

import numpy as np
import jax
import jax.numpy as jnp

from aosx.config import DRYRUN_STATICS as S, AosParams, params_as_f32
from aosx.guards import (
    GUARD_CROSS_DENSE,
    GUARD_EDGE_COARSE,
    GUARD_PROX_PPN,
)
from aosx.gvd.graph import _edge_crossing_dense, edge_crossing_packed
from aosx.types import GridWorld


def _grid(seed=5, density=0.02):
    rng = np.random.default_rng(seed)
    occ = (rng.random((S.grid_h, S.grid_w)) < density).astype(np.uint8)
    return GridWorld(
        occ=jnp.asarray(occ),
        origin_x=jnp.float32(0.0), origin_y=jnp.float32(0.0),
        h_cells=jnp.int32(S.grid_h), w_cells=jnp.int32(S.grid_w),
    )


def _entries(n=1024, seed=2):
    rng = np.random.default_rng(seed)
    a = rng.uniform(0, [S.grid_w * S.resolution, S.grid_h * S.resolution],
                    (n, 2)).astype(np.float32)
    # keep lengths under (nmax-1)*res/2 so no entry is nmax-capped
    b = a + rng.uniform(-1.0, 1.0, (n, 2)).astype(np.float32)
    valid = rng.random(n) < 0.9
    return jnp.asarray(a), jnp.asarray(b), jnp.asarray(valid)


def test_crossing_packed_matches_dense_and_flags_overflow():
    """Tiny cap -> packed layout overflows -> dense fallback taken, flagged,
    and decisions still exact."""
    grid = _grid(density=0.003)
    a, b, valid = _entries()
    nmax = jnp.full((a.shape[0],), 64, jnp.int32)

    run = jax.jit(lambda cap: edge_crossing_packed(grid, a, b, nmax, valid, S,
                                                   cap=cap), static_argnums=0)
    # the coarse buffer rounds up to rows of 4096 slots; ~920 valid entries
    # at ~9 coarse slots each (~8k) overflow cap=64's single row for sure
    crossing_small, guards_small = run(64)
    # big enough for ~8k coarse slots + sparse windows -> fast path
    crossing_big, guards_big = run(256 * S.max_edges)

    res = float(S.resolution)
    step = res * 0.5
    length = jnp.sqrt(jnp.sum((b - a) ** 2, axis=1))
    num = jnp.minimum((length / step).astype(jnp.int32) + 1, nmax - 1)
    dense = _edge_crossing_dense(grid, a, b, valid, num, S, 256)
    dense = np.asarray(dense & valid & (length >= 1e-6))

    assert int(guards_small) & GUARD_CROSS_DENSE
    assert not (int(guards_big) & GUARD_CROSS_DENSE)
    assert (np.asarray(crossing_small) == dense).all()
    assert (np.asarray(crossing_big) == dense).all()


def test_crossing_coarse_sampling_flagged():
    """An edge whose fine sampling is capped by nmax (spacing coarser than
    res/2, deviating from the reference) must set GUARD_EDGE_COARSE."""
    grid = _grid(density=0.0)
    a = jnp.asarray([[1.0, 1.0]], jnp.float32)
    b = jnp.asarray([[9.0, 9.0]], jnp.float32)     # ~11 m; num_raw >> 16
    nmax = jnp.asarray([16], jnp.int32)
    valid = jnp.asarray([True])
    _, guards = jax.jit(
        lambda: edge_crossing_packed(grid, a, b, nmax, valid, S,
                                     cap=32 * S.max_edges)
    )()
    assert int(guards) & GUARD_EDGE_COARSE


def test_prox_partner_cap_flagged():
    """More than PPN=8 nodes within the proximity distance of one node must
    set GUARD_PROX_PPN (partners silently capped; ADVICE r1)."""
    from aosx.gvd.graph import build_edges
    from aosx.types import SeedSet

    N = S.max_nodes
    params = params_as_f32(AosParams())
    # 12 nodes in a 0.2 m blob: every node has 11 partners within 0.5 m
    pos = np.ones((N, 2), np.float32) * 50.0
    pos[:12] = 5.0 + np.random.default_rng(0).uniform(0, 0.2, (12, 2))
    node_valid = np.zeros((N,), bool)
    node_valid[:12] = True
    owners = np.full((N, 4), -1, np.int32)
    grid = _grid(density=0.0)
    seeds = SeedSet(
        xy=jnp.zeros((S.max_seeds, 2), jnp.float32),
        valid=jnp.zeros((S.max_seeds,), bool),
        kind=jnp.zeros((S.max_seeds,), jnp.int32),
    )
    *_, guards = jax.jit(
        lambda p, v: build_edges(p, jnp.asarray(owners), v, grid, seeds,
                                 params, S)
    )(jnp.asarray(pos), jnp.asarray(node_valid))
    assert int(guards) & GUARD_PROX_PPN


def test_fast_only_mode_matches_exact_when_no_overflow():
    """exact_fallbacks=False (the batched MC mode: a vmapped lax.cond runs
    BOTH branches, so fallbacks are skipped) must be bit-identical to the
    exact mode whenever no static buffer overflows - and report clean
    guards."""
    import dataclasses

    from aosx.gvd import build_gvd_graph
    from aosx.orchards import OrchardSpec, make_orchard
    from aosx.perceive import perceive

    spec = OrchardSpec(
        n_rows=2, row_len=4.0, row_spacing=2.0, tree_spacing=1.0,
        trunk_pts=10, noise_pts=16, origin=(2.0, 2.0), polygon_pad=1.0,
    )
    pc, poly = make_orchard(jax.random.PRNGKey(4), spec, S)
    params = params_as_f32(AosParams())
    excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)

    outs = []
    for stat in (S, dataclasses.replace(S, exact_fallbacks=False)):
        out = jax.jit(
            lambda pc, poly: perceive(pc, poly, params, excl, stat,
                                      ror_method="exact")
        )(pc, poly)
        g = jax.jit(
            lambda se, rs, sk: build_gvd_graph(se, rs, sk, params, stat)
        )(out.seeds, out.rows_sorted, out.skeleton)
        outs.append((out, g))
    (o1, g1), (o2, g2) = outs
    assert int(g1.guards) == 0 and int(g2.guards) == 0
    assert np.array_equal(np.asarray(o1.skeleton.occ), np.asarray(o2.skeleton.occ))
    assert int(g1.num_nodes) == int(g2.num_nodes)
    assert int(g1.num_edges) == int(g2.num_edges)
    assert np.array_equal(np.asarray(g1.edges), np.asarray(g2.edges))
    assert np.array_equal(np.asarray(g1.nodes), np.asarray(g2.nodes))


def test_fast_only_mode_flags_overflow():
    """When the run-level union-find buffers overflow in fast-only mode, the
    CCL fallback guard must still be raised (results are flagged, not
    silently trusted)."""
    import dataclasses

    from aosx.perceive.rows import cluster_grid
    from aosx.types import Polygon

    S2 = dataclasses.replace(S, exact_fallbacks=False)
    rng = np.random.default_rng(3)
    occ = (rng.random((S.grid_h, S.grid_w)) < 0.30).astype(np.uint8)
    grid = GridWorld(
        occ=jnp.asarray(occ),
        origin_x=jnp.float32(0.0), origin_y=jnp.float32(0.0),
        h_cells=jnp.int32(S.grid_h), w_cells=jnp.int32(S.grid_w),
    )
    poly = Polygon(pts=jnp.zeros((S.max_poly, 2), jnp.float32),
                   count=jnp.int32(0))
    params = params_as_f32(AosParams())
    res = jax.jit(lambda g: cluster_grid(g, poly, params, S2))(grid)
    from aosx.guards import GUARD_CCL_CELL_FALLBACK
    assert int(res["guards"]) & GUARD_CCL_CELL_FALLBACK


def test_ridge_compact_overflow_guard_and_fallback():
    """Ridge candidate compaction (build_edges RK = 3N cap): when every
    vertex carries 4 distinct owners (6N live entries > 3N), exact mode must
    take the full-list fallback (no candidates lost) and fast-only mode must
    trip GUARD_RIDGE_COMPACT."""
    import dataclasses

    from aosx.guards import GUARD_RIDGE_COMPACT
    from aosx.gvd.graph import build_edges
    from aosx.types import SeedSet

    N = S.max_nodes
    rng = np.random.default_rng(11)
    pos = rng.uniform(0.5, 8.0, (N, 2)).astype(np.float32)
    # 4 distinct owners per vertex -> all 6 pairs live on every vertex
    owners = np.stack(
        [rng.permutation(S.max_seeds)[:4] for _ in range(N)]
    ).astype(np.int32)
    node_valid = np.ones(N, bool)
    sxy = rng.uniform(0.0, 9.0, (S.max_seeds, 2)).astype(np.float32)
    seeds = SeedSet(xy=jnp.asarray(sxy),
                    valid=jnp.ones(S.max_seeds, bool),
                    kind=jnp.zeros(S.max_seeds, jnp.int8))
    grid = GridWorld(occ=jnp.zeros((S.grid_h, S.grid_w), jnp.uint8),
                     origin_x=jnp.float32(0), origin_y=jnp.float32(0),
                     h_cells=jnp.int32(S.grid_h), w_cells=jnp.int32(S.grid_w))
    params = params_as_f32(AosParams())

    args = (jnp.asarray(pos), jnp.asarray(owners), jnp.asarray(node_valid))
    exact = jax.jit(lambda p, o, v: build_edges(p, o, v, grid, seeds,
                                                params, S))(*args)
    S_fast = dataclasses.replace(S, exact_fallbacks=False)
    fast = jax.jit(lambda p, o, v: build_edges(p, o, v, grid, seeds,
                                               params, S_fast))(*args)
    assert int(exact[5]) & GUARD_RIDGE_COMPACT   # informational in exact mode
    assert int(fast[5]) & GUARD_RIDGE_COMPACT
    # the fallback saw all 6N candidates; the fast path dropped half
    assert int(exact[4]) >= int(fast[4])


def test_cluster_cap_overflow_guard():
    """More skeleton components than max_clusters must set
    GUARD_CLUSTER_CAP: components beyond the cap are dropped from the tour
    (whole tree rows would vanish silently on dropout-fragmented giant
    maps otherwise — round-5 review finding)."""
    from aosx.guards import GUARD_CLUSTER_CAP
    from aosx.perceive.rows import cluster_grid
    from aosx.types import Polygon

    params = params_as_f32(AosParams())
    poly = Polygon(pts=jnp.zeros((S.max_poly, 2), jnp.float32),
                   count=jnp.int32(0))
    run = jax.jit(lambda g: cluster_grid(g, poly, params, S))

    def grid_with(n):
        occ = np.zeros((S.grid_h, S.grid_w), np.uint8)
        occ[8 + 8 * np.arange(n), 8] = 1   # isolated 1-cell components
        return GridWorld(
            occ=jnp.asarray(occ),
            origin_x=jnp.float32(0.0), origin_y=jnp.float32(0.0),
            h_cells=jnp.int32(S.grid_h), w_cells=jnp.int32(S.grid_w),
        )

    ok = run(grid_with(S.max_clusters))        # exactly K components: clean
    over = run(grid_with(S.max_clusters + 4))  # K+4: flagged
    assert not (int(ok["guards"]) & GUARD_CLUSTER_CAP)
    assert int(over["guards"]) & GUARD_CLUSTER_CAP


def test_plan_cap_guard():
    """A published /plan that FILLS max_plan must be flagged GUARD_PLAN_CAP:
    linearize caps its output at the buffer with no in-function signal, and
    a truncated plan ends before the docking ring and stalls the mission
    with no other flag. Clean-run control: the same episode under the
    full-size buffer stays unflagged."""
    import dataclasses

    from aosx import engine
    from aosx.guards import GUARD_PLAN_CAP
    from aosx.orchards import OrchardSpec, make_orchard

    spec = OrchardSpec(n_rows=2, row_len=4.0, row_spacing=2.0,
                       tree_spacing=1.0, trunk_pts=10, noise_pts=16,
                       origin=(2.0, 2.0), polygon_pad=1.0)
    pc, poly = make_orchard(jax.random.PRNGKey(0), spec, S)
    excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)
    # huge arrival radius -> the tour starts immediately and a plan is
    # published within the first few ticks
    p = params_as_f32(
        dataclasses.replace(AosParams(), initial_arrive_dist=100.0))

    out = {}
    for Q in (S.max_plan, 8):
        S2 = dataclasses.replace(S, max_plan=Q)
        world = jax.jit(
            lambda pc, poly, pr, ex: engine.prepare_world(
                pc, poly, pr, ex, S2, ror_method="exact")
        )(pc, poly, p, excl)
        st = engine.initial_state(world, S2)
        step = jax.jit(lambda st, w, pr: engine.step(st, w, pr, S2))
        m = None
        for _ in range(3):
            st, m = step(st, world, p)
        out[Q] = m
    assert int(out[S.max_plan]["plan_len"]) < S.max_plan
    assert not (int(out[S.max_plan]["guards"]) & GUARD_PLAN_CAP)
    assert int(out[8]["plan_len"]) == 8
    assert int(out[8]["guards"]) & GUARD_PLAN_CAP
