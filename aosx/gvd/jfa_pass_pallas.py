"""Pallas TPU kernel: ONE Jacobi jump-flood pass (all 8 directions) over
row bands.

Why: the XLA lowering of a JFA pass materializes every shifted plane and
select output in HBM (~6.5 ms/pass measured on the v5e at 2000x2048); this
kernel performs the whole 8-direction lexicographic-min update on a row band
held in VMEM, so a pass costs one read + one write of the three carried
planes (owner i32, ox f32, oy f32).

Used for steps <= MAX_STEP (the vertical halo must fit in VMEM alongside the
band); the large-step passes (256/512/1024) stay on the XLA path. d2 is
recomputed in-kernel from (ox, oy) - the same f32 expression on the same
inputs as voronoi.jump_flood's Jacobi pass, so results are bit-identical
(validated in interpret mode and on the real chip).

Mosaic notes (v5e):
- lane-dimension concatenate rejects inputs carrying an unaligned SUBLANE
  offset ("result/input offset mismatch on non-concat dimension"), so slices
  of the DMA window must start at multiples of 8 rows. Steps that are
  multiples of 8 slice the core band directly; smaller steps compute on the
  whole window (offset-0 concat shifts, ~1.2x extra rows) and slice the
  core only at the end.
- cell coordinates are recomputed in-kernel from f32 scalar-prefetch
  origins with the same i32-iota -> f32 -> mul expression as the XLA path.

Semantics reference: voronoi.jump_flood (itself replacing cv::Subdiv2D
facets, voronoi_diagram.cpp:16-147; see voronoi.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_STEP = 128
_INF = 3.4e38

# test hook: force interpret mode for every jfa_pass call (so the CPU test
# suite can pin the bench-default kernel against the XLA lowering without
# plumbing a flag through Statics) - see tests/test_pallas_kernels.py
INTERPRET = False


def _band_height(grid_h: int, hp: int) -> int:
    """Largest divisor of grid_h that is a multiple of 8 with a window
    (band + 2*hp rows) small enough for VMEM (~8 MB at W=2048); the band
    itself is capped at 104 rows so Mosaic's per-direction temporaries
    ([rows, W] f32) stay well under the 16 MB VMEM budget."""
    best = 8
    d = 8
    while d <= grid_h:
        if grid_h % d == 0 and d + 2 * hp <= 320 and d <= 104:
            best = d
        d += 8
    return best


@functools.lru_cache(maxsize=None)
def _make_pass(H: int, W: int, step: int, S: int, res: float, interpret: bool):
    hp = max(8, ((step + 7) // 8) * 8)  # halo rows, 8-aligned for DMA
    bh = _band_height(H, hp)
    nb = H // bh
    R = bh + 2 * hp
    aligned = step % 8 == 0  # core-row slices of the window stay 8-aligned

    def kernel(org_ref, o_hbm, x_hbm, y_hbm,
               oo_ref, ox_ref, oy_ref, so, sx, sy, sem_o, sem_x, sem_y):
        band = pl.program_id(0)
        cpo = pltpu.make_async_copy(o_hbm.at[pl.ds(band * bh, R), :], so, sem_o)
        cpx = pltpu.make_async_copy(x_hbm.at[pl.ds(band * bh, R), :], sx, sem_x)
        cpy = pltpu.make_async_copy(y_hbm.at[pl.ds(band * bh, R), :], sy, sem_y)
        cpo.start()
        cpx.start()
        cpy.start()
        cpo.wait()
        cpx.wait()
        cpy.wait()

        rows = bh if aligned else R
        row0 = band * bh if aligned else band * bh - hp  # global row of row 0
        iyk = jax.lax.broadcasted_iota(jnp.int32, (rows, W), 0) + row0
        ixk = jax.lax.broadcasted_iota(jnp.int32, (rows, W), 1)
        resf = jnp.float32(res)
        cellx = org_ref[0] + ixk.astype(jnp.float32) * resf
        celly = org_ref[1] + iyk.astype(jnp.float32) * resf

        def dist2(px, py):
            return (px - cellx) ** 2 + (py - celly) ** 2

        def shx(a, dx, fill):
            if dx > 0:
                return jnp.concatenate(
                    [jnp.full((rows, dx), fill, a.dtype), a[:, : W - dx]], 1
                )
            if dx < 0:
                return jnp.concatenate(
                    [a[:, -dx:], jnp.full((rows, -dx), fill, a.dtype)], 1
                )
            return a

        if aligned:
            def src(ref, dy, fill):
                r0 = hp - dy  # multiple of 8: offset-free layout
                return ref[r0 : r0 + bh, :]

            oc = so[hp : hp + bh, :]
            xc = sx[hp : hp + bh, :]
            yc = sy[hp : hp + bh, :]
        else:
            def src(ref, dy, fill):
                a = ref[:]
                if dy > 0:
                    return jnp.concatenate(
                        [jnp.full((dy, W), fill, a.dtype), a[: R - dy, :]], 0
                    )
                if dy < 0:
                    return jnp.concatenate(
                        [a[-dy:, :], jnp.full((-dy, W), fill, a.dtype)], 0
                    )
                return a

            oc = so[:]
            xc = sx[:]
            yc = sy[:]

        d2c = jnp.where(oc < S, dist2(xc, yc), jnp.float32(_INF))
        for dys in (-1, 0, 1):
            for dxs in (-1, 0, 1):
                if dys == 0 and dxs == 0:
                    continue
                dy, dx = dys * step, dxs * step
                no = shx(src(so, dy, jnp.int32(S)), dx, jnp.int32(S))
                nx = shx(src(sx, dy, jnp.float32(1e9)), dx, jnp.float32(1e9))
                ny = shx(src(sy, dy, jnp.float32(1e9)), dx, jnp.float32(1e9))
                n_d2 = jnp.where(no < S, dist2(nx, ny), jnp.float32(_INF))
                better = (n_d2 < d2c) | ((n_d2 == d2c) & (no < oc))
                oc = jnp.where(better, no, oc)
                xc = jnp.where(better, nx, xc)
                yc = jnp.where(better, ny, yc)
                d2c = jnp.where(better, n_d2, d2c)
        if not aligned:
            oc = oc[hp : hp + bh, :]
            xc = xc[hp : hp + bh, :]
            yc = yc[hp : hp + bh, :]
        oo_ref[:] = oc
        ox_ref[:] = xc
        oy_ref[:] = yc

    def one_pass(origins, o_pad, x_pad, y_pad):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(nb,),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY),
                ],
                out_specs=[
                    pl.BlockSpec((bh, W), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((bh, W), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((bh, W), lambda i, *_: (i, 0), memory_space=pltpu.VMEM),
                ],
                scratch_shapes=[
                    pltpu.VMEM((R, W), jnp.int32),
                    pltpu.VMEM((R, W), jnp.float32),
                    pltpu.VMEM((R, W), jnp.float32),
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA,
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((H, W), jnp.int32),
                jax.ShapeDtypeStruct((H, W), jnp.float32),
                jax.ShapeDtypeStruct((H, W), jnp.float32),
            ],
            interpret=interpret,
        )(origins, o_pad, x_pad, y_pad)

    return one_pass, hp


def jfa_pass(owner, ox, oy, step: int, S: int, origin_x, origin_y, res: float,
             *, interpret: bool = False):
    """One 8-direction Jacobi JFA pass via the banded kernel. step must be
    <= MAX_STEP. Inputs/outputs are the full [H, W] carried planes."""
    H, W = owner.shape
    one_pass, hp = _make_pass(H, W, step, S, float(res),
                              interpret or INTERPRET)
    o_pad = jnp.pad(owner, ((hp, hp), (0, 0)), constant_values=S)
    x_pad = jnp.pad(ox, ((hp, hp), (0, 0)), constant_values=1e9)
    y_pad = jnp.pad(oy, ((hp, hp), (0, 0)), constant_values=1e9)
    origins = jnp.stack(
        [jnp.asarray(origin_x, jnp.float32), jnp.asarray(origin_y, jnp.float32)]
    )
    return one_pass(origins, o_pad, x_pad, y_pad)
