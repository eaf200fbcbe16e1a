"""Spatial (grid) sharding for very large maps (SURVEY.md section 2 axis (c):
optional grid sharding across chips for > 200 m fields, and section 5's
"tile the grid / shard across chips" scaling note).

The occupancy grid is sharded row-wise over the mesh axis; the disc-
inflation stencil exchanges `inflation_cells` halo rows with mesh neighbors
via jax.lax.ppermute (ICI traffic only), then each chip runs the separable
dilation locally. Bit-identical to the single-device aosx.perceive.raster
path (tests/test_parallel.py).
"""

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
