"""Grid-space Voronoi field via jump flooding (C7).

The reference computes float-precision Voronoi facets with cv::Subdiv2D
(voronoi_diagram.cpp:16-147) and then immediately discretizes the result by
snapping to deduped boundary points and dropping everything outside the grid
(aos_gvd_node.cpp:420-483). The TPU-native equivalent skips the float facets
entirely: a jump-flood nearest-seed ownership field over the live grid, from
which Voronoi vertices (>= 3 distinct owners around a cell corner), border
vertices (owner changes along the live border), and ridge connectivity are
extracted. This reproduces the reference's NODE/EDGE SEMANTICS (boundary
points + connectivity); coordinates are accurate to the grid resolution.
Parity with the Subdiv2D construction is validated at the decision level
(SURVEY.md hard part #2), not float-exactly.

JFA here is the "1+JFA" variant (extra step-1 pass first) with JACOBI passes
(all 8 directional candidates read from the pass-start planes; ties broken
by lower seed index); owner POSITIONS are carried as separate planes so each
pass is pure shifted elementwise math - no gathers in the hot loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Statics
from ..types import GridWorld, SeedSet
from ..perceive.raster import live_mask, shift2d


def _passes(s: Statics):
    n = max(s.grid_h, s.grid_w)
    steps = [1]
    k = 1
    while k < n:
        k *= 2
    k //= 2
    while k >= 1:
        steps.append(k)
        k //= 2
    return steps


INF = jnp.float32(3.4e38)


def _jfa_init(grid: GridWorld, seeds: SeedSet, s: Statics):
    """Seed scatter -> (owner [H,W] i32 with S = no-owner, ox, oy planes).

    Position planes: every non-seed cell has owner == S here, so instead of
    the dense table gather seeds_x[owner] (2 x 4M elements ~= 54 ms on the
    v5e - XLA:TPU gathers are ~10 ns/element) gather the winning owner PER
    SEED (S elements) and scatter into the planes. Seeds sharing a cell all
    write the same winner's coordinates, so the duplicate scatter is
    deterministic; the result is bit-identical to the dense gather."""
    h, w = grid.occ.shape
    res = jnp.float32(s.resolution)
    S = seeds.xy.shape[0]

    # init: scatter seeds into their containing cells (min seed idx on ties)
    sx = jnp.clip(
        jnp.floor((seeds.xy[:, 0] - grid.origin_x) / res).astype(jnp.int32),
        0, grid.w_cells - 1)
    sy = jnp.clip(
        jnp.floor((seeds.xy[:, 1] - grid.origin_y) / res).astype(jnp.int32),
        0, grid.h_cells - 1)
    sidx = jnp.where(seeds.valid, jnp.arange(S, dtype=jnp.int32), S)
    owner = jnp.full((h, w), S, jnp.int32).at[sy, sx].min(sidx, mode="drop")

    seeds_x = jnp.concatenate([seeds.xy[:, 0], jnp.array([1e9], jnp.float32)])
    seeds_y = jnp.concatenate([seeds.xy[:, 1], jnp.array([1e9], jnp.float32)])
    win = owner[sy, sx]                       # [S] owner at each seed's cell
    ox = jnp.full((h, w), 1e9, jnp.float32).at[sy, sx].set(seeds_x[win], mode="drop")
    oy = jnp.full((h, w), 1e9, jnp.float32).at[sy, sx].set(seeds_y[win], mode="drop")
    return owner, ox, oy


def jacobi_fold(o0, x0, y0, neighbors, S: int, cellx, celly):
    """One Jacobi JFA update: fold the 8 pass-start neighbor triples
    (owner, x, y) into the state with a lexicographic (d2, owner) min.
    Order-independent (ties break on the smaller owner index); shared
    VERBATIM by every lowering - static unroll, dynamic fori+roll, and the
    row-sharded shard_map path (parallel/spatial.jump_flood_sharded) - so
    their owner fields are bit-identical. Neighbor x/y values at cells
    whose owner == S never propagate (their distance is forced to INF and
    the owner tie-break can't pick them), so shift fill values for the
    position planes are arbitrary."""

    def dist2(px, py):
        return (px - cellx) ** 2 + (py - celly) ** 2

    d0 = jnp.where(o0 < S, dist2(x0, y0), INF)
    o, x, y, d2 = o0, x0, y0, d0
    for no, nx, ny in neighbors:
        nd = jnp.where(no < S, dist2(nx, ny), INF)
        better = (nd < d2) | ((nd == d2) & (no < o))
        o = jnp.where(better, no, o)
        x = jnp.where(better, nx, x)
        y = jnp.where(better, ny, y)
        d2 = jnp.where(better, nd, d2)
    return o, x, y


def jump_flood(grid: GridWorld, seeds: SeedSet, s: Statics):
    """Nearest-seed ownership over the live region.

    Returns (owner [H,W] i32, seed index or -1 outside live/no seeds).
    Distances measured from cell corners (world = origin + cell * res), the
    same convention as the reference's worldToGrid.
    """
    h, w = grid.occ.shape
    res = jnp.float32(s.resolution)
    S = seeds.xy.shape[0]

    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    cellx = grid.origin_x + ix.astype(jnp.float32) * res
    celly = grid.origin_y + iy.astype(jnp.float32) * res

    owner, ox, oy = _jfa_init(grid, seeds, s)

    # Every lowering implements the same JACOBI pass: all 8 directional
    # candidates are read from the PASS-START planes and folded with a
    # lexicographic (d2, owner) min - order-independent, the textbook JFA
    # update. (An earlier version chained direction updates within a pass,
    # Gauss-Seidel style; that converges to the same Voronoi field but has
    # influence radius 8*step per pass, which makes banded Pallas kernels
    # impossible. Jacobi keeps the halo = step and lets all three lowerings
    # - static unroll, dynamic fori+roll, Pallas banded - be bit-identical;
    # validated on the v5e.)

    def jacobi_pass(o0, x0, y0, shifter):
        neighbors = [
            shifter(o0, x0, y0, dys, dxs)
            for dys in (-1, 0, 1)
            for dxs in (-1, 0, 1)
            if not (dys == 0 and dxs == 0)
        ]
        return jacobi_fold(o0, x0, y0, neighbors, S, cellx, celly)

    def shift_fill_s(a, dy: int, dx: int):
        out = a
        if dy > 0:
            out = jnp.pad(out, ((dy, 0), (0, 0)), constant_values=S)[:h, :]
        elif dy < 0:
            out = jnp.pad(out, ((0, -dy), (0, 0)), constant_values=S)[-h:, :]
        if dx > 0:
            out = jnp.pad(out, ((0, 0), (dx, 0)), constant_values=S)[:, :w]
        elif dx < 0:
            out = jnp.pad(out, ((0, 0), (0, -dx)), constant_values=S)[:, -w:]
        return out

    passes = _passes(s)
    state = (owner, ox, oy)
    # In-library valve for the Pallas tier (VERDICT r4 missing #3): the
    # remote Mosaic compile helper CRASHES (HTTP 500) compiling the banded
    # kernel at >= 4000 grid rows (first GRID_CEILING run, real v5e,
    # 2026-08-20 — see CLAUDE.md round-4 notes). Degrade to the bit-identical
    # XLA lowering instead of letting a user's jfa_pass_pallas=True on a
    # giant grid crash the compile; same auto-valve pattern as
    # parallel/batch.py's astar_serial_candidates.
    use_pallas = s.jfa_pass_pallas and h < 4000
    if not s.jfa_dynamic_shifts:
        if use_pallas:
            from .jfa_pass_pallas import MAX_STEP, jfa_pass

        for step in passes:
            if use_pallas and step <= MAX_STEP:
                state = jfa_pass(
                    state[0], state[1], state[2], step, S,
                    grid.origin_x, grid.origin_y, s.resolution,
                )
                continue

            def static_shifter(o0, x0, y0, dys, dxs, _step=step):
                dy, dx = dys * _step, dxs * _step
                return (
                    shift_fill_s(o0, dy, dx),
                    shift2d(x0, dy, dx),
                    shift2d(y0, dy, dx),
                )

            state = jacobi_pass(*state, static_shifter)
    else:
        steps = jnp.asarray(passes, jnp.int32)

        def dyn_shift(a, dy, dx, fill):
            out = jnp.roll(a, (dy, dx), axis=(0, 1))
            sy = iy - dy
            sx = ix - dx
            bad = (sy < 0) | (sy >= h) | (sx < 0) | (sx >= w)
            return jnp.where(bad, fill, out)

        def body(k, state):
            step = steps[k]

            def dyn_shifter(o0, x0, y0, dys, dxs):
                dy, dx = dys * step, dxs * step
                return (
                    dyn_shift(o0, dy, dx, jnp.int32(S)),
                    dyn_shift(x0, dy, dx, jnp.float32(1e9)),
                    dyn_shift(y0, dy, dx, jnp.float32(1e9)),
                )

            return jacobi_pass(*state, dyn_shifter)

        # unroll=N: XLA:CPU MISCOMPILES this body inside a rolled
        # while-loop - traced-shift rolls (any lowering: combined roll,
        # two rolls, doubled-plane dynamic_slice) + the fold produce wrong
        # owners at a handful of cells (63 on the discovering example;
        # strictly-nearer seeds lost, not ties). lax.scan shares the bug;
        # the same body unrolled (python loop, traced steps, or fori with
        # unroll=N) is correct and matches the static/sharded/brute-force
        # paths bit-exactly. Regression: tests/test_parallel.py::
        # test_incremental_sharded_stencils (the discovering example:
        # sharded JFA vs this path at seed 7, DRYRUN statics).
        state = jax.lax.fori_loop(0, len(passes), body, state,
                                  unroll=len(passes))
    owner = state[0]
    owner = jnp.where(live_mask(grid) & (owner < S), owner, -1)
    return owner
