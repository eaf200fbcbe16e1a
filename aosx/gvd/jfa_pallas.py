"""Pallas TPU kernel for the small-step jump-flood passes.

STATUS: retired. This kernel reproduces the ORIGINAL Gauss-Seidel pass
chaining (directions within a pass saw earlier directions' updates), which
jump_flood no longer uses - the pipeline moved to the textbook Jacobi pass
(see voronoi.jump_flood and jfa_pass_pallas.py). It also measured only at
parity with the XLA lowering (110.6 vs 105.9 ms end-to-end) because the
small column tiles pay ~11x redundant halo compute. Kept as a record of the
trapezoid-fusion approach; not wired into jump_flood anymore.

The JFA schedule is [1, 1024, 512, ..., 2, 1]. The big steps need halos up
to 1024 rows (stay in XLA - 5 passes), but the trailing small steps
(64, 32, 16, 8, 4, 2, 1 - halo sum 127) fuse into ONE kernel: each
[bh x wc] tile is DMA'd once with a 128-cell halo on every side, all
7 passes x 8 directions run in VMEM (trapezoid fusion - the valid region
shrinks by each step's halo), and the tile is written once. The XLA version
re-reads ~3 planes from HBM for every one of the 56 direction-updates.
Tiles are small ([168 x 768] working buffers) because Mosaic's scoped VMEM
budget must also hold the shifted temporaries.

Bit-identical update rule to voronoi.jump_flood: candidate wins iff
(d2 < best) or (d2 == best and owner < best_owner), with d2 recomputed from
the owner position planes in f32 (the same expression the XLA path uses).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SMALL_STEPS = (64, 32, 16, 8, 4, 2, 1)
HALO = 128  # sum(SMALL_STEPS) = 127, padded to tile-friendly 128
BH = 40     # output rows per tile (must divide grid_h; 2000 % 40 == 0)
WC = 512    # output cols per tile


def _tile_dims(H: int, W: int):
    bh = BH if H % BH == 0 else max(d for d in range(8, 65, 8) if H % d == 0)
    wc = WC if W % WC == 0 else max(d for d in range(128, 1025, 128) if W % d == 0)
    return bh, wc


def _shift(p, dy, dx, fill):
    R, C = p.shape
    out = p
    if dy > 0:
        out = jnp.concatenate([jnp.full((dy, C), fill, out.dtype), out[: R - dy]], 0)
    elif dy < 0:
        out = jnp.concatenate([out[-dy:], jnp.full((-dy, C), fill, out.dtype)], 0)
    if dx > 0:
        out = jnp.concatenate([jnp.full((R, dx), fill, out.dtype), out[:, : C - dx]], 1)
    elif dx < 0:
        out = jnp.concatenate([out[:, -dx:], jnp.full((R, -dx), fill, out.dtype)], 1)
    return out


def _kernel(org_ref, own_hbm, ox_hbm, oy_hbm, own_out, ox_out, oy_out,
            s_own, s_ox, s_oy, sems, *, bh: int, wc: int, res: float, n_seeds: int):
    band = pl.program_id(0)
    col = pl.program_id(1)
    R = bh + 2 * HALO
    C = wc + 2 * HALO
    cps = [
        pltpu.make_async_copy(
            own_hbm.at[pl.ds(band * bh, R), pl.ds(col * wc, C)], s_own, sems.at[0]),
        pltpu.make_async_copy(
            ox_hbm.at[pl.ds(band * bh, R), pl.ds(col * wc, C)], s_ox, sems.at[1]),
        pltpu.make_async_copy(
            oy_hbm.at[pl.ds(band * bh, R), pl.ds(col * wc, C)], s_oy, sems.at[2]),
    ]
    for cp in cps:
        cp.start()
    for cp in cps:
        cp.wait()

    own = s_own[:]
    ox = s_ox[:]
    oy = s_oy[:]
    iy = jax.lax.broadcasted_iota(jnp.int32, (R, C), 0) + band * bh - HALO
    ix = jax.lax.broadcasted_iota(jnp.int32, (R, C), 1) + col * wc - HALO
    cellx = org_ref[0] + ix.astype(jnp.float32) * res
    celly = org_ref[1] + iy.astype(jnp.float32) * res
    BIG = jnp.float32(3.4e38)
    d2 = jnp.where(own < n_seeds, (ox - cellx) ** 2 + (oy - celly) ** 2, BIG)

    for step in SMALL_STEPS:
        for dys in (-1, 0, 1):
            for dxs in (-1, 0, 1):
                if dys == 0 and dxs == 0:
                    continue
                dy, dx = dys * step, dxs * step
                n_own = _shift(own, dy, dx, n_seeds)
                n_ox = _shift(ox, dy, dx, 1e9)
                n_oy = _shift(oy, dy, dx, 1e9)
                n_d2 = jnp.where(
                    n_own < n_seeds, (n_ox - cellx) ** 2 + (n_oy - celly) ** 2, BIG
                )
                better = (n_d2 < d2) | ((n_d2 == d2) & (n_own < own))
                own = jnp.where(better, n_own, own)
                ox = jnp.where(better, n_ox, ox)
                oy = jnp.where(better, n_oy, oy)
                d2 = jnp.where(better, n_d2, d2)

    own_out[:] = own[HALO : HALO + bh, HALO : HALO + wc]
    ox_out[:] = ox[HALO : HALO + bh, HALO : HALO + wc]
    oy_out[:] = oy[HALO : HALO + bh, HALO : HALO + wc]


def jfa_small_steps(owner, ox, oy, origin_x, origin_y, res: float, n_seeds: int,
                    *, interpret: bool = False):
    """Apply the SMALL_STEPS passes. owner [H,W] i32 (n_seeds = empty),
    ox/oy [H,W] f32 owner positions. Returns updated (owner, ox, oy)."""
    H, W = owner.shape
    bh, wc = _tile_dims(H, W)
    nbands = H // bh
    ncols = W // wc
    pads = ((HALO, HALO), (HALO, HALO))
    own_p = jnp.pad(owner, pads, constant_values=n_seeds)
    ox_p = jnp.pad(ox, pads, constant_values=1e9)
    oy_p = jnp.pad(oy, pads, constant_values=1e9)
    org = jnp.stack([jnp.float32(origin_x), jnp.float32(origin_y)])

    R = bh + 2 * HALO
    C = wc + 2 * HALO
    out = pl.pallas_call(
        functools.partial(_kernel, bh=bh, wc=wc, res=res, n_seeds=n_seeds),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nbands, ncols),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
                pl.BlockSpec(memory_space=pltpu.ANY),
            ],
            out_specs=[
                pl.BlockSpec((bh, wc), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((bh, wc), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((bh, wc), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM),
            ],
            scratch_shapes=[
                pltpu.VMEM((R, C), jnp.int32),
                pltpu.VMEM((R, C), jnp.float32),
                pltpu.VMEM((R, C), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((H, W), jnp.int32),
            jax.ShapeDtypeStruct((H, W), jnp.float32),
            jax.ShapeDtypeStruct((H, W), jnp.float32),
        ],
        interpret=interpret,
    )(org, own_p, ox_p, oy_p)
    return out[0], out[1], out[2]
