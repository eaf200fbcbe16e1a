"""Spatial (grid) sharding for very large maps (SURVEY.md section 2 axis (c):
optional grid sharding across chips for > 200 m fields, and section 5's
"tile the grid / shard across chips" scaling note).

The occupancy grid is sharded row-wise over the mesh axis:

- disc inflation exchanges `inflation_cells` halo rows with mesh neighbors
  via jax.lax.ppermute (ICI traffic only), then each chip runs the
  separable dilation locally;
- skeletonization (morph open + Zhang-Suen thinning) exchanges a 1-row
  halo per stencil application (two per thinning iteration - phase 1's
  output feeds phase 2's neighborhoods) and reduces the fixpoint flag
  with a psum so all chips leave the while_loop together.

Both are bit-identical to the single-device aosx.perceive paths
(tests/test_parallel.py). The JFA ownership field is deliberately NOT
sharded: a jump-flood pass at offset k needs a k-row halo (up to H/2), so
row sharding degenerates into all-gathering the plane every pass; maps
that exceed one chip's HBM should instead run per-tile JFA with boundary
seed reconciliation, which changes the (approximate) 1+JFA semantics and
is out of scope while the largest supported grid fits comfortably on one
chip (2000x2048 u8 planes = 4 MB)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import Statics
from ..perceive.raster import dilate_disc
from ..types import GridWorld


def inflate_sharded(grid: GridWorld, s: Statics, mesh: Mesh, axis: str = "space") -> GridWorld:
    """Row-sharded disc inflation with ppermute halo exchange."""
    ic = s.inflation_cells
    n = mesh.shape[axis]
    H, W = grid.occ.shape
    assert H % n == 0, (H, n)
    Hb = H // n
    assert Hb > ic, "shard height must exceed the halo"

    def block_fn(occ_blk, h_cells, w_cells):
        # occ_blk: [Hb, W] this chip's rows
        i = jax.lax.axis_index(axis)
        # halo from the row-neighbor chips; edge chips receive zeros
        up = jax.lax.ppermute(
            occ_blk[-ic:, :], axis, [(k, k + 1) for k in range(n - 1)]
        )
        down = jax.lax.ppermute(
            occ_blk[:ic, :], axis, [(k + 1, k) for k in range(n - 1)]
        )
        padded = jnp.concatenate([up, occ_blk, down], axis=0)
        dil = dilate_disc(padded, ic)[ic : ic + Hb, :]
        gy = jax.lax.broadcasted_iota(jnp.int32, (Hb, W), 0) + i * Hb
        gx = jax.lax.broadcasted_iota(jnp.int32, (Hb, W), 1)
        live = (gy < h_cells) & (gx < w_cells)
        return jnp.where(live, dil, jnp.uint8(0))

    f = jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P()),
        out_specs=P(axis, None),
        check_vma=False,
    )
    out = f(grid.occ, grid.h_cells, grid.w_cells)
    return GridWorld(out, grid.origin_x, grid.origin_y, grid.h_cells, grid.w_cells)


def skeletonize_sharded(grid: GridWorld, s: Statics, mesh: Mesh, axis: str = "space") -> GridWorld:
    """Row-sharded skeletonization: morph open + Zhang-Suen to fixpoint.

    Per 3x3 stencil application each chip ppermutes one halo row to each
    row-neighbor (edge chips receive zeros, matching shift2d's global
    zero-fill), evaluates the stencil on the halo-padded [Hb+2, W] block
    with GLOBAL live/interior masks, and keeps rows 1..Hb. The fixpoint
    flag is psum-reduced so the while_loop trip count is identical on all
    chips. Bit-identical to perceive.skeleton.skeletonize (reference:
    aos_seed_gen_node.cpp:672-705)."""
    from ..perceive.raster import shift2d
    from ..perceive.skeleton import _CROSS, _subiter

    n = mesh.shape[axis]
    H, W = grid.occ.shape
    assert H % n == 0, (H, n)
    Hb = H // n
    assert Hb >= 2, "shard height must cover the 1-row stencil halo"
    fwd = [(k, k + 1) for k in range(n - 1)]
    bwd = [(k + 1, k) for k in range(n - 1)]

    def block_fn(occ_blk, h_cells, w_cells):
        i = jax.lax.axis_index(axis)
        # global coordinates of the halo-padded block rows (padded row r
        # holds global row i*Hb + r - 1)
        py = jax.lax.broadcasted_iota(jnp.int32, (Hb + 2, W), 0) + i * Hb - 1
        px = jax.lax.broadcasted_iota(jnp.int32, (Hb + 2, W), 1)
        live = (py >= 0) & (py < h_cells) & (px < w_cells)
        interior = (
            (py >= 1) & (py < h_cells - 1) & (px >= 1) & (px < w_cells - 1)
        )

        def pad(p):
            up = jax.lax.ppermute(p[-1:, :], axis, fwd)
            down = jax.lax.ppermute(p[:1, :], axis, bwd)
            return jnp.concatenate([up, p, down], axis=0)

        # ---- morph open (erode border = 1, dilate border = 0, cv::) ----
        padded = pad(occ_blk)
        er = jnp.ones_like(padded)
        for dy, dx in _CROSS:
            nb = shift2d(padded, dy, dx)
            outside = (
                (py - dy < 0) | (py - dy >= h_cells)
                | (px - dx < 0) | (px - dx >= w_cells)
            )
            er = jnp.minimum(er, jnp.where(outside, jnp.uint8(1), nb))
        er = jnp.where(live, er, jnp.uint8(0))[1 : Hb + 1]
        erp = pad(er)
        di = jnp.zeros_like(erp)
        for dy, dx in _CROSS:
            di = jnp.maximum(di, shift2d(erp, dy, dx))
        di = jnp.where(live, di, jnp.uint8(0))[1 : Hb + 1]

        # ---- Zhang-Suen to fixpoint -----------------------------------
        def cond(state):
            _, changed, it = state
            return changed & (it < s.skeleton_max_iters)

        def body(state):
            p, _, it = state
            q = _subiter(pad(p), 0, interior)[1 : Hb + 1]
            q = _subiter(pad(q), 1, interior)[1 : Hb + 1]
            changed_local = jnp.any(q != p)
            changed = jax.lax.psum(changed_local.astype(jnp.int32), axis) > 0
            return q, changed, it + 1

        p, _, _ = jax.lax.while_loop(
            cond, body, (di, jnp.bool_(True), jnp.int32(0))
        )
        return p

    f = jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(), P()),
        out_specs=P(axis, None),
        check_vma=False,
    )
    out = f(grid.occ, grid.h_cells, grid.w_cells)
    return GridWorld(out, grid.origin_x, grid.origin_y, grid.h_cells, grid.w_cells)
