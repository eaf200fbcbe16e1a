"""Skeletonization (C4): morphological open (3x3 ellipse == cross) followed by
Zhang-Suen thinning to fixpoint (reference: aos_seed_gen_node.cpp:672-705,
which calls cv::morphologyEx + cv::ximgproc::thinning(THINNING_ZHANGSUEN)).

TPU mapping: each Zhang-Suen sub-iteration is a vectorized 3x3 stencil over
the whole grid (8 shifted planes + arithmetic on the VPU); the fixpoint loop
is a lax.while_loop with an any(changed) reduction. Border semantics follow
OpenCV exactly:
- morph open: erosion treats outside-of-image as 1, dilation as 0
  (cv::morphologyDefaultBorderValue()).
- thinning: the outer 1-pixel ring of the (live) image is never modified
  (OpenCV's loops run over 1..rows-2).

A fused Pallas kernel version (both sub-iterations in one pass over tiles
with halo) lives in aosx/perceive/skeleton_pallas.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import Statics
from ..types import GridWorld
from .raster import live_mask, shift2d

_CROSS = ((-1, 0), (0, -1), (0, 0), (0, 1), (1, 0))


def _outside_live(grid: GridWorld, dy: int, dx: int):
    """Mask of cells whose (y-dy, x-dx) source lies outside the live region."""
    h, w = grid.occ.shape
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    sy, sx = iy - dy, ix - dx
    return (sy < 0) | (sy >= grid.h_cells) | (sx < 0) | (sx >= grid.w_cells)


def morph_open(grid: GridWorld) -> GridWorld:
    """cv::morphologyEx(MORPH_OPEN) with the 3x3 ellipse (cross) kernel."""
    p = grid.occ
    er = jnp.ones_like(p)
    for dy, dx in _CROSS:
        nb = shift2d(p, dy, dx)
        nb = jnp.where(_outside_live(grid, dy, dx), jnp.uint8(1), nb)  # erode border = 1
        er = jnp.minimum(er, nb)
    er = jnp.where(live_mask(grid), er, jnp.uint8(0))  # dead region contributes 0
    di = jnp.zeros_like(p)
    for dy, dx in _CROSS:
        nb = shift2d(er, dy, dx)  # dilate border = 0 (zero-fill shift)
        di = jnp.maximum(di, nb)
    di = jnp.where(live_mask(grid), di, jnp.uint8(0))
    return GridWorld(di, grid.origin_x, grid.origin_y, grid.h_cells, grid.w_cells)


def _neighbors(p):
    """p2..p9 in Zhang-Suen order (N, NE, E, SE, S, SW, W, NW) with row 0 =
    top. Our grid stores y ascending upward; the algorithm is symmetric under
    vertical flip as long as the two sub-iterations use consistent (m1, m2)
    templates, which shifting convention preserves bit-exactly vs the oracle
    (same array layout)."""
    p2 = shift2d(p, 1, 0)    # source (y-1, x): the row-above in array terms
    p3 = shift2d(p, 1, -1)
    p4 = shift2d(p, 0, -1)
    p5 = shift2d(p, -1, -1)
    p6 = shift2d(p, -1, 0)
    p7 = shift2d(p, -1, 1)
    p8 = shift2d(p, 0, 1)
    p9 = shift2d(p, 1, 1)
    return p2, p3, p4, p5, p6, p7, p8, p9


def _subiter(p, phase: int, interior):
    p2, p3, p4, p5, p6, p7, p8, p9 = _neighbors(p)
    seq = (p2, p3, p4, p5, p6, p7, p8, p9, p2)
    A = jnp.zeros(p.shape, jnp.int32)
    for a, b in zip(seq[:-1], seq[1:]):
        A += ((a == 0) & (b == 1)).astype(jnp.int32)
    B = (
        p2.astype(jnp.int32) + p3 + p4 + p5 + p6 + p7 + p8 + p9
    )
    if phase == 0:
        m1 = p2 * p4 * p6
        m2 = p4 * p6 * p8
    else:
        m1 = p2 * p4 * p8
        m2 = p2 * p6 * p8
    delete = (
        (A == 1) & (B >= 2) & (B <= 6) & (m1 == 0) & (m2 == 0) & (p == 1) & interior
    )
    return jnp.where(delete, jnp.uint8(0), p)


def zhang_suen(grid: GridWorld, s: Statics) -> GridWorld:
    """Thin to fixpoint (both sub-iterations per outer iteration, stop when
    unchanged), capped at s.skeleton_max_iters."""
    h, w = grid.occ.shape
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (
        (iy >= 1) & (iy < grid.h_cells - 1) & (ix >= 1) & (ix < grid.w_cells - 1)
    )

    def cond(state):
        _, changed, it = state
        return changed & (it < s.skeleton_max_iters)

    def body(state):
        p, _, it = state
        q = _subiter(p, 0, interior)
        q = _subiter(q, 1, interior)
        changed = jnp.any(q != p)
        return q, changed, it + 1

    p, _, _ = jax.lax.while_loop(cond, body, (grid.occ, jnp.bool_(True), jnp.int32(0)))
    return GridWorld(p, grid.origin_x, grid.origin_y, grid.h_cells, grid.w_cells)


def skeletonize(grid: GridWorld, s: Statics) -> GridWorld:
    """skeletonizeOccupancyGrid (aos_seed_gen_node.cpp:672-705)."""
    opened = morph_open(grid)
    if s.skeleton_pallas:
        from .skeleton_pallas import zhang_suen_pallas

        return zhang_suen_pallas(opened, s)
    return zhang_suen(opened, s)
