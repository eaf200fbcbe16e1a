"""Point-cloud preprocessing (C2): radius outlier removal + clipping +
exclusion discs, as fixed-shape masks (reference: aos_seed_gen_node.cpp:230-538).

TPU mapping: ROR is the FLOP-heavy part (O(N^2) neighbor counting). Two paths:
- 'mxu'  : blocked ||x||^2 + ||y||^2 - 2 x.y via jnp.dot (MXU, HIGHEST
           precision) — the fast path for large N.
- 'exact': blocked elementwise (xi-xj)^2 sums in f32 — bit-matches the f32
           oracle; used for parity tests and small N.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import AosParams, Statics
from ..geom import active_bounds, point_in_polygon
from ..types import PointCloud, Polygon


def ror_counts(xyz, valid, radius, *, method: str = "exact", block: int = None):
    """Number of OTHER valid points within `radius` (3D), per point.

    method: 'pallas' (fused MXU kernel, fastest), 'mxu' (blocked XLA dots),
    'exact' (elementwise diffs, bit-matches the f32 oracle).

    Returns (counts [n] i32, span_violated bool) - the flag is only ever
    True for the 'sorted' method when its block-span exactness precondition
    breaks (PARITY.md, guards.GUARD_ROR_SPAN)."""
    if block is None:
        # big tiles for the MXU path: per-iteration loop overhead dominates
        # small tiles on TPU; [8192, 8192] f32 d2 tiles are ~256 MB, fine
        block = 8192 if method == "mxu" else 2048
    n = xyz.shape[0]
    big = jnp.float32(1e9)
    # park invalid points far away (each gets a distinct parking spot so they
    # never count each other either)
    park = big + jnp.arange(n, dtype=jnp.float32)[:, None] * 1e3
    pts = jnp.where(valid[:, None], xyz, park)
    r2 = jnp.asarray(radius, jnp.float32) ** 2

    nblk = (n + block - 1) // block
    pad = nblk * block - n
    pts_p = jnp.pad(pts, ((0, pad), (0, 0)), constant_values=-1e9)

    if method == "sorted":
        return _ror_counts_sorted(pts, n, r2)

    if method == "pallas":
        from .ror_pallas import ror_counts_pallas

        cnt = ror_counts_pallas(pts_p, r2)
        return cnt[:n] - 1, jnp.bool_(False)

    if method == "mxu":
        sq = jnp.sum(pts_p * pts_p, axis=1)  # [Np]

        def row_chunk(carry, i):
            # [block, 3] row tile against ALL columns in col tiles, so the
            # largest intermediate is [block, block] (f32, a few MB)
            rows = jax.lax.dynamic_slice(pts_p, (i * block, 0), (block, 3))
            rows_sq = jax.lax.dynamic_slice(sq, (i * block,), (block,))

            def col_chunk(cc, j):
                cols = jax.lax.dynamic_slice(pts_p, (j * block, 0), (block, 3))
                cols_sq = jax.lax.dynamic_slice(sq, (j * block,), (block,))
                dots = jnp.dot(rows, cols.T, precision=jax.lax.Precision.HIGHEST)
                d2 = rows_sq[:, None] + cols_sq[None, :] - 2.0 * dots
                return cc + jnp.sum(d2 <= r2, axis=1), None

            cnt_i, _ = jax.lax.scan(
                col_chunk, jnp.zeros((block,), jnp.int32), jnp.arange(nblk)
            )
            return carry, cnt_i

        _, cnt_chunks = jax.lax.scan(row_chunk, None, jnp.arange(nblk))
        cnt = cnt_chunks.reshape(-1)
    else:

        def body(carry, j):
            cnt = carry
            cols = jax.lax.dynamic_slice(pts_p, (j * block, 0), (block, 3))
            diff = pts_p[:, None, :] - cols[None, :, :]
            d2 = jnp.sum(diff * diff, axis=-1)
            cnt = cnt + jnp.sum(d2 <= r2, axis=1)
            return cnt, None

        cnt, _ = jax.lax.scan(body, jnp.zeros((nblk * block,), jnp.int32), jnp.arange(nblk))

    # exclude self (d2 == 0 with itself always counted)
    return cnt[:n] - 1, jnp.bool_(False)


def _ror_counts_sorted(pts, n, r2, W: int = 2048):
    """Sorted-sweep exact neighbor counting: sort by x, compare each block of
    W points only against itself and its two neighbor blocks. Exact whenever
    no pair within `radius` spans two block boundaries - guaranteed when
    every 2 consecutive blocks cover > radius of x-extent (orchard maps:
    ~700 points/m vs W=2048 per block; safety margin ~15x). N^2/21 the work
    of the full pairwise path.

    Returns counts (excluding self) in the ORIGINAL point order."""
    N = pts.shape[0]
    pad = (-N) % W
    parked = 2e9 + jnp.arange(pad, dtype=jnp.float32) * 1e3
    ptsp = jnp.concatenate(
        [pts, jnp.stack([parked, parked, parked], axis=1)], axis=0
    ) if pad else pts
    Np = ptsp.shape[0]
    order = jnp.argsort(ptsp[:, 0])
    ps = ptsp[order]                                  # [Np,3] sorted by x
    Nb = Np // W
    blocks = ps.reshape(Nb, W, 3)
    far = jnp.full((1, W, 3), -3e9, jnp.float32)
    left = jnp.concatenate([far, blocks[:-1]], axis=0)
    far2 = jnp.full((1, W, 3), 3.2e9, jnp.float32)
    right = jnp.concatenate([blocks[1:], far2], axis=0)
    trip = jnp.concatenate([left, blocks, right], axis=1)   # [Nb, 3W, 3]

    # row-chunked tiles: the full [W, 3W] f32 tile is 50 MB, which under a
    # vmapped Monte-Carlo batch multiplies into HBM-crashing transients;
    # [C, 3W] chunks keep it ~6 MB per orchard, same counts
    C = min(512, W)

    def body(carry, idx):
        t = trip[idx]                                  # [3W,3]

        def chunk(_, j):
            b = jax.lax.dynamic_slice(blocks[idx], (j * C, 0), (C, 3))
            d2 = jnp.sum((b[:, None, :] - t[None, :, :]) ** 2, axis=-1)
            return None, jnp.sum(d2 <= r2, axis=1) - 1  # exclude self

        _, cnt = jax.lax.scan(chunk, None, jnp.arange(W // C))
        return carry, cnt.reshape(-1)

    _, cnts = jax.lax.scan(body, None, jnp.arange(Nb))
    cnt_sorted = cnts.reshape(-1)
    cnt = jnp.zeros((Np,), jnp.int32).at[order].set(cnt_sorted)
    # precondition guard (PARITY.md): exact only if no within-radius pair
    # skips a whole block, i.e. every block's x-span keeps blocks i and i+2
    # more than radius apart. Parked pad points sit at 2e9+, so a violated
    # gap involving them is impossible (radius << 1e9).
    first_x = blocks[:, 0, 0]
    last_x = blocks[:, -1, 0]
    if Nb > 2:
        violated = jnp.any(first_x[2:] - last_x[:-2] < jnp.sqrt(r2))
    else:
        violated = jnp.bool_(False)
    return cnt[:n], violated


def static_keep_mask(xyz, params: AosParams, exclusions, bounds):
    """The per-point filters that do NOT depend on other points: PassThrough
    z / x / y against the active bounds + exclusion discs
    (aos_seed_gen_node.cpp:452-525). Factored out so the incremental map
    update (aosx.incremental) applies literally the same predicate."""
    minx, maxx, miny, maxy = bounds
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    m = (z >= params.clipping_minz) & (z <= params.clipping_maxz)
    m &= (x >= minx) & (x <= maxx) & (y >= miny) & (y <= maxy)
    ex = jnp.asarray(exclusions, jnp.float32)
    d2 = (x[:, None] - ex[None, :, 0]) ** 2 + (y[:, None] - ex[None, :, 1]) ** 2
    inside_excl = jnp.any((d2 <= ex[None, :, 2] ** 2) & (ex[None, :, 2] > 0), axis=1)
    return m & ~inside_excl


def preprocess_full(
    pc: PointCloud,
    poly: Polygon,
    params: AosParams,
    exclusions,  # [E,3] (x, y, r); rows with r <= 0 are inactive
    s: Statics,
    *,
    ror_method: str = "exact",
):
    """Full preprocessing, exposing the intermediates the incremental path
    carries: returns (xy [N,2], keep [N], cnt [N] i32 ROR neighbor counts,
    valid [N] post-isfinite, bounds tuple, guards i32 bitmask).

    Steps (aos_seed_gen_node.cpp:230-538): ROR (r=0.2, >=2 neighbors), then
    PassThrough z / x / y against the active bounds, exclusion discs
    (d^2 <= r^2 removed), flatten to xy.
    """
    xyz, valid = pc.xyz, pc.valid
    # isfinite hygiene at the input boundary (PCL marks invalid returns with
    # NaN points; the reference's pipeline is littered with isfinite checks,
    # e.g. voronoi_diagram.cpp:28-30). Must happen BEFORE the sorted-sweep
    # ROR: NaN sort keys would silently break its block-span invariant.
    valid = valid & jnp.all(jnp.isfinite(xyz), axis=1)
    cnt, ror_span_violated = ror_counts(xyz, valid, params.ror_radius,
                                        method=ror_method)
    keep = valid & (cnt >= params.ror_min_neighbors)

    bounds = active_bounds(
        poly,
        (params.clipping_minx, params.clipping_maxx, params.clipping_miny, params.clipping_maxy),
        params.polygon_margin,
    )
    keep &= static_keep_mask(xyz, params, exclusions, bounds)

    from ..guards import GUARD_ROR_SPAN

    guards = jnp.where(ror_span_violated, jnp.int32(GUARD_ROR_SPAN), 0)
    return xyz[:, :2], keep, cnt, valid, bounds, guards


def preprocess(
    pc: PointCloud,
    poly: Polygon,
    params: AosParams,
    exclusions,
    s: Statics,
    *,
    ror_method: str = "exact",
):
    """Full preprocessing: returns (xy [N,2], keep-mask [N], bounds tuple,
    guards i32 bitmask - see aosx.guards)."""
    xy, keep, _, _, bounds, guards = preprocess_full(
        pc, poly, params, exclusions, s, ror_method=ror_method)
    return xy, keep, bounds, guards
