"""Edge clearances - an extension BEYOND the reference.

The reference declares `edge_clearances` in msg/GvdGraph.msg:58 and always
writes 0.0f (aos_gvd_node.cpp:856,890,1006 - never computed). Here we
actually compute it: a jump-flood distance field to the nearest occupied
skeleton cell (the same obstacle set the edge-crossing filter samples), then
each edge's clearance = min distance over its res/2-spaced samples. Off by
default in build_gvd_graph for strict message parity; enable with
compute_clearances=True.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Statics
from ..perceive.raster import live_mask, shift2d
from ..types import GridWorld


def obstacle_distance_field(grid: GridWorld, s: Statics):
    """Euclidean distance (meters, cell-corner metric) from every cell to the
    nearest occupied cell, via jump flooding over the occupancy itself."""
    h, w = grid.occ.shape
    res = jnp.float32(s.resolution)
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    occ = (grid.occ == 1) & live_mask(grid)
    BIG = jnp.int32(1 << 30)
    ny = jnp.where(occ, iy, BIG)   # nearest occupied cell coords
    nx = jnp.where(occ, ix, BIG)

    def d2_of(py, px):
        dy = (py - iy).astype(jnp.float32)
        dx = (px - ix).astype(jnp.float32)
        return jnp.where(py < BIG, dy * dy + dx * dx, jnp.float32(3.4e38))

    best = d2_of(ny, nx)

    n = max(h, w)
    steps = []
    k = 1
    while k < n:
        k *= 2
    k //= 2
    passes = [1] + [k >> i for i in range(k.bit_length()) if (k >> i) >= 1]

    def dir_update(state, cy, cx):
        ny, nx, best = state
        cand = d2_of(cy, cx)
        better = cand < best
        return (
            jnp.where(better, cy, ny),
            jnp.where(better, cx, nx),
            jnp.where(better, cand, best),
        )

    state = (ny, nx, best)
    if not s.jfa_dynamic_shifts:
        for step in passes:
            for dys in (-1, 0, 1):
                for dxs in (-1, 0, 1):
                    if dys == 0 and dxs == 0:
                        continue
                    dy, dx = dys * step, dxs * step
                    cy = shift2d(state[0], dy, dx)
                    cx = shift2d(state[1], dy, dx)
                    edge = shift2d(jnp.ones((h, w), jnp.int8), dy, dx) == 0
                    state = dir_update(
                        state, jnp.where(edge, BIG, cy), jnp.where(edge, BIG, cx)
                    )
    else:
        steps_arr = jnp.asarray(passes, jnp.int32)

        def dyn_shift(a, dy, dx):
            out = jnp.roll(a, (dy, dx), axis=(0, 1))
            sy = iy - dy
            sx = ix - dx
            bad = (sy < 0) | (sy >= h) | (sx < 0) | (sx >= w)
            return jnp.where(bad, BIG, out)

        def body(k, state):
            step = steps_arr[k]
            for dys in (-1, 0, 1):
                for dxs in (-1, 0, 1):
                    if dys == 0 and dxs == 0:
                        continue
                    dy, dx = dys * step, dxs * step
                    state = dir_update(
                        state, dyn_shift(state[0], dy, dx), dyn_shift(state[1], dy, dx)
                    )
            return state

        # unroll=N: the rolled while-loop lowering of traced-shift rolls is
        # miscompiled by XLA:CPU (see voronoi.py's jump_flood dynamic path
        # + CLAUDE.md); unrolled bodies are correct
        state = jax.lax.fori_loop(0, len(passes), body, state,
                                  unroll=len(passes))
    ny, nx, best = state
    return jnp.sqrt(jnp.minimum(best, 3.4e38)) * res


def edge_clearances(dist_field, grid: GridWorld, pos, edges, edge_valid,
                    s: Statics, n_samples: int = 64):
    """Min obstacle distance along each edge, sampled like the crossing
    filter (res/2 steps, t in [0,1])."""
    res = jnp.float32(s.resolution)
    E = edges.shape[0]
    a = pos[jnp.maximum(edges[:, 0], 0)]
    b = pos[jnp.maximum(edges[:, 1], 0)]
    length = jnp.sqrt(jnp.sum((b - a) ** 2, axis=1))
    num = jnp.minimum((length / (res * 0.5)).astype(jnp.int32) + 1, n_samples - 1)
    i = jnp.arange(n_samples, dtype=jnp.float32)[None, :]
    t = jnp.minimum(i / jnp.maximum(num[:, None].astype(jnp.float32), 1.0), 1.0)
    px = a[:, 0:1] + t * (b[:, 0:1] - a[:, 0:1])
    py = a[:, 1:2] + t * (b[:, 1:2] - a[:, 1:2])
    H, W = dist_field.shape
    mx = jnp.clip(((px - grid.origin_x) / res).astype(jnp.int32), 0, W - 1)
    my = jnp.clip(((py - grid.origin_y) / res).astype(jnp.int32), 0, H - 1)
    d = dist_field[my, mx]
    ok = i <= num[:, None].astype(jnp.float32)
    d = jnp.where(ok, d, 3.4e38)
    out = jnp.min(d, axis=1)
    return jnp.where(edge_valid, out, 0.0)
