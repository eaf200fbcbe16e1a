"""Occupancy rasterization + inflation + borders (C3)
(reference: aos_seed_gen_node.cpp:581-967).

TPU mapping decisions:
- scatter-to-grid: one `.at[gy, gx].max(1)` scatter (XLA scatter, O(N)).
- disc inflation: the reference's O(cells x disc) loop becomes a SEPARABLE
  decomposition: horizontal dilations H_k (incremental, k = 0..ic) followed by
  a vertical max over shifted H_{w(|dy|)} where w(dy) = floor(sqrt(ic^2-dy^2)).
  Exactly equals dilation by the disc {dx^2+dy^2 <= ic^2} at O(cells * ic)
  instead of O(cells * ic^2), all as fused elementwise max over [H,W] planes.
- borders / rectangle boundary: pure iota masks (the reference's Bresenham on
  an axis-aligned rectangle degenerates to straight index lines).

The grid lives in a static [grid_h, grid_w] buffer; the live region
[0:h_cells, 0:w_cells] is traced (dynamic within the static cap).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..config import Statics
from ..types import GridWorld


def shift2d(a, dy: int, dx: int):
    """Static zero-fill shift: out[y, x] = a[y - dy, x - dx] (0 outside)."""
    h, w = a.shape
    out = a
    if dy > 0:
        out = jnp.pad(out, ((dy, 0), (0, 0)))[:h, :]
    elif dy < 0:
        out = jnp.pad(out, ((0, -dy), (0, 0)))[-h:, :]
    if dx > 0:
        out = jnp.pad(out, ((0, 0), (dx, 0)))[:, :w]
    elif dx < 0:
        out = jnp.pad(out, ((0, 0), (0, -dx)))[:, -w:]
    return out


def live_mask(grid: GridWorld):
    h, w = grid.occ.shape
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    return (iy < grid.h_cells) & (ix < grid.w_cells)


def generate_grid(xy, keep, bounds, s: Statics) -> GridWorld:
    """generateOccupancyGrid (aos_seed_gen_node.cpp:581-622)."""
    minx, maxx, miny, maxy = bounds
    res = jnp.float32(s.resolution)
    width = jnp.maximum(0.0, jnp.float32(maxx) - jnp.float32(minx))
    height = jnp.maximum(0.0, jnp.float32(maxy) - jnp.float32(miny))
    w_cells = jnp.maximum(1, jnp.ceil(width / res).astype(jnp.int32))
    h_cells = jnp.maximum(1, jnp.ceil(height / res).astype(jnp.int32))
    w_cells = jnp.minimum(w_cells, s.grid_w)
    h_cells = jnp.minimum(h_cells, s.grid_h)

    # C-truncation cast (points are >= origin after clipping, so trunc == floor)
    gx = ((xy[:, 0] - jnp.float32(minx)) / res).astype(jnp.int32)
    gy = ((xy[:, 1] - jnp.float32(miny)) / res).astype(jnp.int32)
    ok = keep & (gx >= 0) & (gx < w_cells) & (gy >= 0) & (gy < h_cells)
    gx = jnp.where(ok, gx, -1)
    gy = jnp.where(ok, gy, -1)
    occ = jnp.zeros((s.grid_h, s.grid_w), jnp.uint8)
    occ = occ.at[gy, gx].max(jnp.uint8(1), mode="drop")
    return GridWorld(
        occ=occ,
        origin_x=jnp.float32(minx),
        origin_y=jnp.float32(miny),
        h_cells=h_cells,
        w_cells=w_cells,
    )


def dilate_disc(occ, ic: int):
    """Binary dilation with the disc dx^2 + dy^2 <= ic^2 via the separable
    horizontal-dilation decomposition (no live-region masking)."""
    H = [occ]
    cur = occ
    for k in range(1, ic + 1):
        cur = jnp.maximum(cur, jnp.maximum(shift2d(occ, 0, k), shift2d(occ, 0, -k)))
        H.append(cur)
    out = H[ic]  # dy = 0 term: full half-width ic
    for dy in range(1, ic + 1):
        w = int(math.floor(math.sqrt(ic * ic - dy * dy)))
        band = H[w]
        out = jnp.maximum(out, jnp.maximum(shift2d(band, dy, 0), shift2d(band, -dy, 0)))
    return out


def inflate(grid: GridWorld, s: Statics) -> GridWorld:
    """applyInflation (aos_seed_gen_node.cpp:933-967): binary dilation with
    the disc dx^2 + dy^2 <= ic^2, ic = int(inflation_radius / resolution)."""
    out = dilate_disc(grid.occ, s.inflation_cells)
    out = jnp.where(live_mask(grid), out, jnp.uint8(0))
    return GridWorld(out, grid.origin_x, grid.origin_y, grid.h_cells, grid.w_cells)


def mark_borders(grid: GridWorld, thickness: int = 5) -> GridWorld:
    """markBoundariesAsOccupied (aos_seed_gen_node.cpp:708-757): `thickness`
    cells along each live edge."""
    h, w = grid.occ.shape
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    border = (
        (iy < thickness)
        | (iy >= grid.h_cells - thickness)
        | (ix < thickness)
        | (ix >= grid.w_cells - thickness)
    )
    occ = jnp.where(border & live_mask(grid), jnp.uint8(1), grid.occ)
    return GridWorld(occ, grid.origin_x, grid.origin_y, grid.h_cells, grid.w_cells)


def edge_replicated(grid: GridWorld):
    """occ with the dead region filled by replicating the live edge:
    occ_ext[y, x] == occ[min(y, h_cells-1), min(x, w_cells-1)].

    Reading occ_ext at STATIC-clamped indices is then identical to the
    reference's worldToGrid clamp-to-live-region (aos_seed_gen_node.cpp:
    760-769). Keeps traced clamp bounds OUT of loop bodies (XLA CPU hangs
    compiling gathers with traced clamp bounds inside loops).

    Built gather-free: broadcast the last live column / row via two dynamic
    slices + selects (a full-grid 2D gather measured ~40 ms on the v5e -
    XLA:TPU gathers run at ~10 ns/element; this form is fused elementwise).
    """
    h, w = grid.occ.shape
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    last_col = jax.lax.dynamic_slice(grid.occ, (0, grid.w_cells - 1), (h, 1))
    colrep = jnp.where(ix >= grid.w_cells, last_col, grid.occ)
    last_row = jax.lax.dynamic_slice(colrep, (grid.h_cells - 1, 0), (1, w))
    return jnp.where(iy >= grid.h_cells, last_row, colrep)


def world_to_grid_clamped(grid: GridWorld, wx, wy, res):
    """worldToGrid (aos_seed_gen_node.cpp:760-769): floor + clamp to live region."""
    gx = jnp.floor((wx - grid.origin_x) / res).astype(jnp.int32)
    gy = jnp.floor((wy - grid.origin_y) / res).astype(jnp.int32)
    gx = jnp.clip(gx, 0, grid.w_cells - 1)
    gy = jnp.clip(gy, 0, grid.h_cells - 1)
    return gx, gy


def mark_polygon_rect(grid: GridWorld, poly, margin, s: Statics) -> GridWorld:
    """markPolygonBoundaryAsOccupied (aos_seed_gen_node.cpp:772-825): draw the
    rectangle (polygon bbox +- margin) boundary. The reference uses Bresenham;
    the rectangle is axis-aligned so the lines are exact index masks. Falls
    back to 5-cell borders when there is no polygon."""
    minx, maxx, miny, maxy = poly.bbox()
    res = jnp.float32(s.resolution)
    gx0, gy0 = world_to_grid_clamped(grid, minx - margin, miny - margin, res)
    gx1, gy1 = world_to_grid_clamped(grid, maxx + margin, maxy + margin, res)
    h, w = grid.occ.shape
    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    on_rect = (
        ((iy == gy0) | (iy == gy1)) & (ix >= gx0) & (ix <= gx1)
    ) | (((ix == gx0) | (ix == gx1)) & (iy >= gy0) & (iy <= gy1))
    occ_rect = jnp.where(on_rect & live_mask(grid), jnp.uint8(1), grid.occ)
    with_rect = GridWorld(occ_rect, grid.origin_x, grid.origin_y, grid.h_cells, grid.w_cells)
    borders = mark_borders(grid)
    has_poly = poly.count > 0
    occ = jnp.where(has_poly, with_rect.occ, borders.occ)
    return GridWorld(occ, grid.origin_x, grid.origin_y, grid.h_cells, grid.w_cells)
