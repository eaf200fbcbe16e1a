"""Pallas TPU kernel for Zhang-Suen thinning (the flagship grid kernel,
SURVEY.md hard part #1).

The XLA version (skeleton.py) materializes ~10 shifted planes plus int32
A/B accumulators in HBM per sub-iteration; at 2000x2048 that is hundreds of
MB of HBM traffic per thinning iteration. This kernel performs BOTH
sub-iterations of one iteration in a single pass over row bands held in
VMEM (u8 in, u8 out, ~8 MB of HBM traffic per iteration) with a 2-row halo
DMA'd per band, and reports a per-band changed flag so the outer
lax.while_loop stops at the fixpoint.

Bit-compatible with skeleton.zhang_suen / the oracle: same neighbor
templates, same border preservation (the live-region outer ring is never
modified), same both-sub-iterations-per-round fixpoint loop. Correctness of
the halo scheme: sub-iteration 1 on band rows needs sub-iteration 0 values
on band rows +-1, which need raw values on band rows +-2 - exactly the halo.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import Statics
from ..types import GridWorld

HALO = 4  # rows of padding each side; sub-iterations need 2, 4 keeps DMA
# slices 8-row aligned (Mosaic tiling requirement: R = bh + 2*HALO % 8 == 0)


def _band_height(grid_h: int) -> int:
    """Largest divisor of grid_h that is a multiple of 8 and <= 256."""
    best = 8
    d = 8
    while d <= min(grid_h, 256):
        if grid_h % d == 0:
            best = d
        d += 8
    return best


def _subiter_band(p, phase: int, deletable):
    """One Zhang-Suen sub-iteration on a [R, W] band value; shifts via
    static slice + zero-row/col concat (Mosaic has no i8 sublane rotate)."""
    R, W = p.shape

    def sh(dy, dx):
        # out[y, x] = p[y - dy, x - dx], zero outside the buffer
        out = p
        if dy > 0:
            out = jnp.concatenate([jnp.zeros((dy, W), out.dtype), out[: R - dy, :]], 0)
        elif dy < 0:
            out = jnp.concatenate([out[-dy:, :], jnp.zeros((-dy, W), out.dtype)], 0)
        if dx > 0:
            out = jnp.concatenate([jnp.zeros((R, dx), out.dtype), out[:, : W - dx]], 1)
        elif dx < 0:
            out = jnp.concatenate([out[:, -dx:], jnp.zeros((R, -dx), out.dtype)], 1)
        return out

    p2 = sh(1, 0)
    p3 = sh(1, -1)
    p4 = sh(0, -1)
    p5 = sh(-1, -1)
    p6 = sh(-1, 0)
    p7 = sh(-1, 1)
    p8 = sh(0, 1)
    p9 = sh(1, 1)
    seq = (p2, p3, p4, p5, p6, p7, p8, p9, p2)
    A = jnp.zeros((R, W), jnp.int32)
    for a, b in zip(seq[:-1], seq[1:]):
        A += ((a == 0) & (b == 1)).astype(jnp.int32)
    B = p2 + p3 + p4 + p5 + p6 + p7 + p8 + p9
    if phase == 0:
        m1 = p2 * p4 * p6
        m2 = p4 * p6 * p8
    else:
        m1 = p2 * p4 * p8
        m2 = p2 * p6 * p8
    delete = (
        (A == 1) & (B >= 2) & (B <= 6) & (m1 == 0) & (m2 == 0) & (p == 1) & deletable
    )
    return jnp.where(delete, jnp.zeros((), p.dtype), p)


def _make_iteration(H: int, W: int, bh: int, nbands: int, interpret: bool):
    R = bh + 2 * HALO

    def kernel(bounds_ref, hbm_in, out_ref, flag_ref, scratch, sem):
        band = pl.program_id(0)
        h_cells = bounds_ref[0]
        w_cells = bounds_ref[1]
        cp = pltpu.make_async_copy(
            hbm_in.at[pl.ds(band * bh, R), :], scratch, sem
        )
        cp.start()
        cp.wait()
        # all in-kernel logic in i32 (v5e Mosaic rejects u8 comparisons)
        p = scratch[:].astype(jnp.int32)
        iy_global = jax.lax.broadcasted_iota(jnp.int32, (R, W), 0) + band * bh - HALO
        ix = jax.lax.broadcasted_iota(jnp.int32, (R, W), 1)
        interior = (
            (iy_global >= 1) & (iy_global < h_cells - 1)
            & (ix >= 1) & (ix < w_cells - 1)
        )
        iy_local = jax.lax.broadcasted_iota(jnp.int32, (R, W), 0)
        ring1 = (iy_local >= HALO - 1) & (iy_local < bh + HALO + 1)
        band_rows = (iy_local >= HALO) & (iy_local < bh + HALO)
        q = _subiter_band(p, 0, interior & ring1)
        q = _subiter_band(q, 1, interior & band_rows)
        out = q[HALO : bh + HALO, :]
        out_ref[:] = out.astype(jnp.uint8)
        # i32 sum instead of an i1 any-reduction (Mosaic relayout limitation)
        n_changed = jnp.sum(
            (out != p[HALO : bh + HALO, :]).astype(jnp.int32)
        )
        flag_ref[:] = jnp.full(flag_ref.shape, n_changed, jnp.int32)

    def one_iteration(bounds, padded):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nbands,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
                out_specs=[
                    pl.BlockSpec((bh, W), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, 128), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                ],
                scratch_shapes=[
                    pltpu.VMEM((R, W), jnp.uint8),
                    pltpu.SemaphoreType.DMA,
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((H, W), jnp.uint8),
                jax.ShapeDtypeStruct((nbands * 8, 128), jnp.int32),
            ],
            interpret=interpret,
        )(bounds, padded)

    return one_iteration


def zhang_suen_pallas(grid: GridWorld, s: Statics, *, interpret: bool = False) -> GridWorld:
    """Thin to fixpoint using the banded Pallas iteration kernel."""
    H, W = grid.occ.shape
    bh = _band_height(H)
    nbands = H // bh
    bounds = jnp.stack(
        [grid.h_cells.astype(jnp.int32), grid.w_cells.astype(jnp.int32)]
    )
    one_iteration = _make_iteration(H, W, bh, nbands, interpret)

    def cond(state):
        _, changed, it = state
        return changed & (it < s.skeleton_max_iters)

    def body(state):
        occ, _, it = state
        padded = jnp.pad(occ, ((HALO, HALO), (0, 0)))
        out, flags = one_iteration(bounds, padded)
        return out, jnp.any(flags > 0), it + 1

    occ, _, _ = jax.lax.while_loop(
        cond, body, (grid.occ, jnp.bool_(True), jnp.int32(0))
    )
    return GridWorld(occ, grid.origin_x, grid.origin_y, grid.h_cells, grid.w_cells)
