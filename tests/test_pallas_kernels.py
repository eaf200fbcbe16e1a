"""Interpret-mode parity for the bench-default Pallas kernels (ADVICE r1):
BENCH_STATICS ships with jfa_pass_pallas=True, and the skeleton/ROR kernels
are selectable; a silent regression in any of them would corrupt the
headline bench. These tests pin each kernel bit-exactly against its XLA
lowering on CPU via the Pallas interpreter.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aosx.config import DRYRUN_STATICS, AosParams, params_as_f32
from aosx.types import GridWorld


def _grid(mask, s):
    return GridWorld(
        occ=jnp.asarray(mask, jnp.uint8),
        origin_x=jnp.float32(0.0),
        origin_y=jnp.float32(0.0),
        h_cells=jnp.int32(mask.shape[0]),
        w_cells=jnp.int32(mask.shape[1]),
    )


def _blobby_mask(h, w, seed, density=0.004, live_h=None, live_w=None):
    """Random dilated blobs, confined to the live region."""
    rng = np.random.default_rng(seed)
    m = (rng.random((h, w)) < density)
    for _ in range(2):  # crude dilation to make connected blobs
        m = m | np.roll(m, 1, 0) | np.roll(m, 1, 1) | np.roll(m, -1, 0) | np.roll(m, -1, 1)
    out = np.zeros((h, w), np.uint8)
    lh = live_h or h
    lw = live_w or w
    out[1:lh - 1, 1:lw - 1] = m[1:lh - 1, 1:lw - 1]
    return out


def test_jfa_pass_pallas_matches_xla_full_flood():
    """Full jump_flood: banded Pallas passes (interpret) == XLA Jacobi
    passes bit-exactly. DRYRUN grid is 192x256, so the pass schedule
    [1,128,64,...,2,1] exercises both the 8-aligned band path (steps 8..128)
    and the whole-window unaligned path (steps 1,2,4)."""
    from aosx.gvd import jfa_pass_pallas as jpp
    from aosx.gvd.voronoi import jump_flood
    from aosx.types import SeedSet

    s_x = dataclasses.replace(DRYRUN_STATICS, jfa_pass_pallas=False)
    s_p = dataclasses.replace(DRYRUN_STATICS, jfa_pass_pallas=True)
    h, w = s_x.grid_h, s_x.grid_w
    grid = _grid(np.zeros((h, w), np.uint8), s_x)

    rng = np.random.default_rng(3)
    S = s_x.max_seeds
    n = 40
    xy = np.zeros((S, 2), np.float32)
    xy[:n, 0] = rng.uniform(0.2, w * s_x.resolution - 0.2, n)
    xy[:n, 1] = rng.uniform(0.2, h * s_x.resolution - 0.2, n)
    valid = np.zeros(S, bool)
    valid[:n] = True
    seeds = SeedSet(xy=jnp.asarray(xy), valid=jnp.asarray(valid),
                    kind=jnp.zeros(S, jnp.int8))

    ref = np.asarray(jump_flood(grid, seeds, s_x))
    jpp.INTERPRET = True
    try:
        got = np.asarray(jump_flood(grid, seeds, s_p))
    finally:
        jpp.INTERPRET = False
    assert np.array_equal(ref, got)


@pytest.mark.parametrize("live_h,live_w", [(192, 256), (184, 232)])
def test_zhang_suen_pallas_matches_xla(live_h, live_w):
    """Banded-halo thinning kernel (interpret) == XLA fixpoint thinning,
    including live regions that are NOT a multiple of the band height."""
    from aosx.perceive.skeleton import zhang_suen
    from aosx.perceive.skeleton_pallas import zhang_suen_pallas

    s = DRYRUN_STATICS
    h, w = s.grid_h, s.grid_w
    mask = _blobby_mask(h, w, seed=7, live_h=live_h, live_w=live_w)
    g = GridWorld(occ=jnp.asarray(mask), origin_x=jnp.float32(0.0),
                  origin_y=jnp.float32(0.0), h_cells=jnp.int32(live_h),
                  w_cells=jnp.int32(live_w))
    ref = np.asarray(zhang_suen(g, s).occ)
    got = np.asarray(zhang_suen_pallas(g, s, interpret=True).occ)
    assert np.array_equal(ref, got)


def test_ror_pallas_matches_exact():
    from aosx.perceive.points import ror_counts
    from aosx.perceive.ror_pallas import ror_counts_pallas

    rng = np.random.default_rng(11)
    n = 2048
    xyz = np.stack([rng.uniform(0, 30, n), rng.uniform(0, 10, n),
                    rng.uniform(-0.3, 0.4, n)], 1).astype(np.float32)
    valid = np.ones(n, bool)
    valid[n - 50:] = False
    # parity target is the 'mxu' path: the kernel uses the same
    # |a|^2+|b|^2-2ab formulation, whose rounding differs from the
    # elementwise-diff 'exact' path on pairs at exactly d ~= r
    ref, _ = ror_counts(jnp.asarray(xyz), jnp.asarray(valid), 0.2,
                        method="mxu")
    # mirror ror_counts' parking + padding, then call the kernel directly in
    # interpret mode (ror_counts(method='pallas') has no interpret hook)
    park = 1e9 + np.arange(n, dtype=np.float32)[:, None] * 1e3
    pts = np.where(valid[:, None], xyz, park).astype(np.float32)
    got = ror_counts_pallas(jnp.asarray(pts), jnp.float32(0.2) ** 2,
                            interpret=True)[:n] - 1
    assert np.array_equal(np.asarray(ref)[valid], np.asarray(got)[valid])
