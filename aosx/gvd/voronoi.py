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

JFA here is the "1+JFA" variant (extra step-1 pass first), with ties broken
by lower seed index; owner POSITIONS are carried as separate planes so each
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
    ox = seeds_x[owner]
    oy = seeds_y[owner]

    def dist2(px, py):
        return (px - cellx) ** 2 + (py - celly) ** 2

    d2 = jnp.where(owner < S, dist2(ox, oy), jnp.float32(3.4e38))

    # Two lowerings of the same pass (identical results):
    # - static unroll: shifts lower to slice+concat; ~4x faster on the v5e
    #   (traced-shift rolls measured ~150x slower than memory-bound there)
    # - dynamic fori + roll: small HLO, fast CPU compiles (tests)
    def dir_update(state, n_owner, n_ox, n_oy):
        owner, ox, oy, d2 = state
        n_d2 = jnp.where(n_owner < S, dist2(n_ox, n_oy), jnp.float32(3.4e38))
        better = (n_d2 < d2) | ((n_d2 == d2) & (n_owner < owner))
        return (
            jnp.where(better, n_owner, owner),
            jnp.where(better, n_ox, ox),
            jnp.where(better, n_oy, oy),
            jnp.where(better, n_d2, d2),
        )

    # optionally peel the trailing small steps into the fused Pallas kernel
    passes = _passes(s)
    pallas_tail = False
    if s.jfa_pallas_small and not s.jfa_dynamic_shifts:
        from .jfa_pallas import SMALL_STEPS

        k = len(SMALL_STEPS)
        if len(passes) > k and tuple(passes[-k:]) == SMALL_STEPS:
            passes = passes[:-k]
            pallas_tail = True

    state = (owner, ox, oy, d2)
    if not s.jfa_dynamic_shifts:
        for step in passes:
            for dys in (-1, 0, 1):
                for dxs in (-1, 0, 1):
                    if dys == 0 and dxs == 0:
                        continue
                    dy, dx = dys * step, dxs * step
                    n_owner = shift2d(state[0], dy, dx)
                    edge = shift2d(jnp.ones((h, w), jnp.int8), dy, dx) == 0
                    n_owner = jnp.where(edge, S, n_owner)
                    state = dir_update(
                        state, n_owner, shift2d(state[1], dy, dx), shift2d(state[2], dy, dx)
                    )
    else:
        steps = jnp.asarray(_passes(s), jnp.int32)

        def dyn_shift(a, dy, dx, fill):
            out = jnp.roll(a, (dy, dx), axis=(0, 1))
            sy = iy - dy
            sx = ix - dx
            bad = (sy < 0) | (sy >= h) | (sx < 0) | (sx >= w)
            return jnp.where(bad, fill, out)

        def body(k, state):
            step = steps[k]
            for dys in (-1, 0, 1):
                for dxs in (-1, 0, 1):
                    if dys == 0 and dxs == 0:
                        continue
                    dy, dx = dys * step, dxs * step
                    n_owner = dyn_shift(state[0], dy, dx, jnp.int32(S))
                    state = dir_update(
                        state,
                        n_owner,
                        dyn_shift(state[1], dy, dx, jnp.float32(1e9)),
                        dyn_shift(state[2], dy, dx, jnp.float32(1e9)),
                    )
            return state

        state = jax.lax.fori_loop(0, len(_passes(s)), body, state)
    owner, ox, oy, d2 = state

    if pallas_tail:
        from .jfa_pallas import jfa_small_steps

        owner, ox, oy = jfa_small_steps(
            owner, ox, oy, grid.origin_x, grid.origin_y, s.resolution, S
        )
    owner = jnp.where(live_mask(grid) & (owner < S), owner, -1)
    return owner
