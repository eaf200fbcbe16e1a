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

- the JFA ownership field (jump_flood_sharded): a Jacobi pass at offset k
  needs rows shifted by +-k, and k reaches H/2 - far beyond any halo. The
  row shift is instead decomposed into WHOLE-SHARD moves: a global shift
  by d = q*Hb + r rows is at most two ppermutes (the blocks of mesh
  neighbors i-q-1 and i-q) plus a local stitch, so per-pass ICI traffic
  stays O(shard) regardless of k. The fold math is voronoi.jacobi_fold,
  shared verbatim with the single-device lowering.

All are bit-identical to the single-device aosx.perceive / aosx.gvd paths
(tests/test_parallel.py). Scope honesty: these shard the COMPUTE of the
plane-stencil stages (the iteration-heavy part of perceive); the planes
returned to the caller are still materialized per chip, and the remaining
stages (CCL, crossing filter, graph build, planning) run replicated on
compacted sparse sets orders smaller than the planes. At the largest
supported grid (2000x2048 u8 = 4 MB/plane vs 16 GB HBM) capacity is not
the constraint; fully-distributed plane residency would additionally need
the consumers tiled and is out of scope until a use case exceeds one
chip's memory."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..config import Statics
from ..perceive.raster import dilate_disc
from ..types import GridWorld, SeedSet


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


def jump_flood_sharded(grid: GridWorld, seeds: SeedSet, s: Statics,
                       mesh: Mesh, axis: str = "space"):
    """Row-sharded 1+JFA nearest-seed ownership (gvd.voronoi.jump_flood on
    a grid whose planes live sharded across `axis`).

    A Jacobi pass at offset k reads rows shifted by +-k; k reaches H/2, so
    a halo exchange is hopeless. Instead each global row shift by d rows
    (d = q*Hb + r, floor divmod by the shard height Hb) is assembled from
    at most two whole-shard ppermutes - the blocks of mesh neighbors
    i-q-1 and i-q - stitched locally:

        out_rows[i*Hb .. (i+1)*Hb) = src rows [(i-q)*Hb - r, (i-q+1)*Hb - r)
                                   = block(i-q-1)[Hb-r:] ++ block(i-q)[:Hb-r]

    with owner fill S outside [0, H) (matching shift_fill_s). Column shifts
    stay local (the lane dim is unsharded). The seed-scatter init and the
    fold (voronoi._jfa_init / voronoi.jacobi_fold) are shared verbatim with
    the single-device path; position-plane fill values are irrelevant
    wherever owner == S (see jacobi_fold's docstring), so the owner field
    is BIT-IDENTICAL to jump_flood (tests/test_parallel.py)."""
    from ..gvd.voronoi import _jfa_init, _passes, jacobi_fold

    n = mesh.shape[axis]
    H, W = grid.occ.shape
    assert H % n == 0, (H, n)
    Hb = H // n
    S = seeds.xy.shape[0]
    res = jnp.float32(s.resolution)
    owner0, ox0, oy0 = _jfa_init(grid, seeds, s)
    passes = _passes(s)

    def block_fn(o, x, y, h_cells, w_cells, origin_x, origin_y):
        i = jax.lax.axis_index(axis)
        gy = jax.lax.broadcasted_iota(jnp.int32, (Hb, W), 0) + i * Hb
        gx = jax.lax.broadcasted_iota(jnp.int32, (Hb, W), 1)
        cellx = origin_x + gx.astype(jnp.float32) * res
        celly = origin_y + gy.astype(jnp.float32) * res

        def from_shard(p, off: int):
            # this chip's slot receives chip (i - off)'s block; chips whose
            # source index falls off the mesh receive zeros (masked below)
            if off == 0:
                return p
            return jax.lax.ppermute(
                p, axis, [(j, j + off) for j in range(n) if 0 <= j + off < n])

        def shift_rows(p, d: int, fill):
            # out[g] = p[g - d] in global rows, `fill` outside [0, H)
            if d == 0:
                return p
            q, r = divmod(d, Hb)
            if r == 0:
                out = from_shard(p, q)
            else:
                hi = from_shard(p, q + 1)   # contributes its last r rows
                lo = from_shard(p, q)       # contributes its first Hb-r rows
                out = jnp.concatenate([hi[Hb - r:], lo[:Hb - r]], axis=0)
            src = gy - d
            return jnp.where((src < 0) | (src >= H), fill, out)

        def shift_cols(p, d: int, fill):
            if d == 0:
                return p
            if d > 0:
                return jnp.concatenate(
                    [jnp.full((Hb, min(d, W)), fill, p.dtype), p[:, :-d]], axis=1
                )[:, :W]
            return jnp.concatenate(
                [p[:, -d:], jnp.full((Hb, min(-d, W)), fill, p.dtype)], axis=1
            )[:, :W]

        for step in passes:
            o0, x0, y0 = o, x, y
            neighbors = []
            for dys in (-1, 0, 1):
                od = shift_rows(o0, dys * step, jnp.int32(S))
                xd = shift_rows(x0, dys * step, jnp.float32(1e9))
                yd = shift_rows(y0, dys * step, jnp.float32(1e9))
                for dxs in (-1, 0, 1):
                    if dys == 0 and dxs == 0:
                        continue
                    neighbors.append((
                        shift_cols(od, dxs * step, jnp.int32(S)),
                        shift_cols(xd, dxs * step, jnp.float32(0.0)),
                        shift_cols(yd, dxs * step, jnp.float32(0.0)),
                    ))
            o, x, y = jacobi_fold(o0, x0, y0, neighbors, S, cellx, celly)

        live = (gy < h_cells) & (gx < w_cells)
        return jnp.where(live & (o < S), o, jnp.int32(-1))

    f = jax.shard_map(
        block_fn,
        mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P(), P(), P(), P()),
        out_specs=P(axis, None),
        check_vma=False,
    )
    return f(owner0, ox0, oy0, grid.h_cells, grid.w_cells,
             grid.origin_x, grid.origin_y)
