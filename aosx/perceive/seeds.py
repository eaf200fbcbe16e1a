"""Voronoi seed generation (C6)
(reference: aos_seed_gen_node.cpp:1670-2268 - virtual seeds along rows with
perpendicular raycasts, endpoint rays, row endpoint seeds, greedy dedupes).

TPU mapping:
- raycasts: all rays march in lockstep (one [N_rays] gather per step) -
  fori_loop for the bounded virtual-seed rays (4 m / (res/2) steps),
  while_loop with an active mask for the unbounded endpoint rays.
- the reference's greedy sequential 0.5 m dedupe is ORDER-DEPENDENT
  (accept candidate i iff no previously-accepted j < i within 0.5 m). We
  compute the identical result with a parallel frontier algorithm:
  each round decides every candidate whose earlier conflicts are all
  decided; rejected candidates never block. Converges in O(longest
  conflict chain) rounds (short in practice) instead of C sequential steps.
- all three candidate families keep the reference's publish order
  (virtual, ray, endpoint; aos_seed_gen_node.cpp:1670-1710), because the
  downstream GVD seed merge is itself order-dependent.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import AosParams, Statics
from ..geom import point_in_polygon
from ..types import GridWorld, Polygon, SeedSet, TreeRows
from .raster import edge_replicated


def greedy_dedupe(xy, valid, thresh, *, block: int = 1024):
    """Accepted mask of the sequential greedy dedupe: candidate i is accepted
    iff valid[i] and no accepted j < i within `thresh`. Parallel frontier
    formulation, bit-identical to the sequential loop."""
    C = xy.shape[0]
    t2 = jnp.asarray(thresh, jnp.float32) ** 2
    nblk = (C + block - 1) // block
    pad = nblk * block - C
    xyp = jnp.pad(xy.astype(jnp.float32), ((0, pad), (0, 0)), constant_values=1e9)
    validp = jnp.pad(valid, (0, pad))
    idx = jnp.arange(nblk * block)

    def conflicts(mask):
        """for each i: does any j < i with mask[j] lie within thresh?"""

        def body(carry, b):
            out = carry
            cols = jax.lax.dynamic_slice(xyp, (b * block, 0), (block, 2))
            mcol = jax.lax.dynamic_slice(mask, (b * block,), (block,))
            jcol = b * block + jnp.arange(block)
            d2 = (
                (xyp[:, None, 0] - cols[None, :, 0]) ** 2
                + (xyp[:, None, 1] - cols[None, :, 1]) ** 2
            )
            hit = (d2 < t2) & mcol[None, :] & (jcol[None, :] < idx[:, None])
            return out | jnp.any(hit, axis=1), None

        out, _ = jax.lax.scan(body, jnp.zeros((nblk * block,), bool), jnp.arange(nblk))
        return out

    def cond(state):
        accepted, rejected, it = state
        undecided = validp & ~accepted & ~rejected
        return jnp.any(undecided) & (it < C)

    def body(state):
        accepted, rejected, it = state
        undecided = validp & ~accepted & ~rejected
        conf_acc = conflicts(accepted)
        conf_und = conflicts(undecided)
        newly_rej = undecided & conf_acc
        newly_acc = undecided & ~conf_acc & ~conf_und
        return accepted | newly_acc, rejected | newly_rej, it + 1

    accepted, _, _ = jax.lax.while_loop(
        cond,
        body,
        (jnp.zeros((nblk * block,), bool), jnp.zeros((nblk * block,), bool), jnp.int32(0)),
    )
    return accepted[:C]


def raycast_bounded(grid: GridWorld, start, direction, active, max_dist, min_dist, s: Statics):
    """raycastToOccupiedCell (cpp:1730-1771): step = res/2, first occupied
    sample at distance >= min_dist wins; worldToGrid CLAMPS out-of-bounds.
    start/direction: [N,2]. Returns (hit [N], hit_xy [N,2]).

    COARSE-TO-FINE lockstep march (XLA:TPU gathers are ~10 ns/element, so
    cost == lookup count; the previous dense [N, n_steps] gather paid
    N*n_steps):

    1. COARSE: every C=8th fine sample, looked up in the occupancy grid
       dilated by Chebyshev radius 3. Fine samples are <= res/2 * |dir|
       apart; for unit directions any fine sample lies within C/2 = 4 fine
       steps (<= 2 cells, +1 for cell rounding) of a coarse sample, and
       index clamping is a contraction so the bound survives the
       out-of-bounds clamp. Rays with |dir| > 1 (none today) force-flag
       every coarse window, degrading to exact-but-dense.
    2. FINE: exact 9-lane windows (+-C/2 around the flagged coarse sample)
       of the ORIGINAL grid, examined in ascending window order per ray
       under a while_loop (1-2 iterations in practice: the first flagged
       window is the own-row shadow below min_dist or the actual hit).
       The first window reporting a fine hit yields exactly the global
       first hit: a hit f* flags its nearest coarse window w*, and any
       earlier window's lane range ends at (w*-1)*C + C/2 = w*C - C/2,
       the lower edge of w*'s own coverage - so an earlier window can only
       report f* itself.

    The reference accumulates `cur += dir * step`; k steps of that f64
    accumulation equal start + dir * (k * step) up to float error, and we
    reproduce the position as start + dir*k*step (f32). Sample positions can
    differ from the reference by < 1e-5 m (documented deviation)."""
    res = jnp.float32(s.resolution)
    step = s.resolution * 0.5
    n_steps = int(max_dist / step)  # max_dist must be a static float
    occ_ext = edge_replicated(grid)
    H, W = occ_ext.shape
    N = start.shape[0]
    C = 8
    NC = (n_steps + C - 1) // C            # coarse windows 0..NC
    LN = C + 1                             # fine lanes per window (+-C/2)

    # radius-3 Chebyshev dilation (separable 1x7 / 7x1 max)
    occ01 = (occ_ext == 1).astype(jnp.uint8)
    dil = jax.lax.reduce_window(occ01, jnp.uint8(0), jax.lax.max,
                                (1, 7), (1, 1), "SAME")
    dil = jax.lax.reduce_window(dil, jnp.uint8(0), jax.lax.max,
                                (7, 1), (1, 1), "SAME")

    dnorm = jnp.sqrt(jnp.sum(direction * direction, axis=1))          # [N]

    kc = (jnp.arange(NC + 1, dtype=jnp.float32) * C)[None, :]         # [1,NC+1]
    cpx = start[:, 0:1] + direction[:, 0:1] * (kc * step)
    cpy = start[:, 1:2] + direction[:, 1:2] * (kc * step)
    cgx = jnp.clip(jnp.floor((cpx - grid.origin_x) / res).astype(jnp.int32), 0, W - 1)
    cgy = jnp.clip(jnp.floor((cpy - grid.origin_y) / res).astype(jnp.int32), 0, H - 1)
    cmask = dil.reshape(-1)[cgy * W + cgx] == 1                       # [N,NC+1]
    cmask = cmask | (dnorm > 1.0 + 1e-6)[:, None]   # non-unit dirs: dense
    cmask = cmask & active[:, None]

    occ_flat = occ_ext.reshape(-1)
    widx = jnp.arange(NC + 1, dtype=jnp.int32)[None, :]
    lanes = jnp.arange(LN, dtype=jnp.float32)[None, :] - C / 2        # [1,LN]

    def fine_window(w):
        """Exact lane evaluation of window w [N]; returns (found, first_k)."""
        f = w.astype(jnp.float32)[:, None] * C + lanes                # [N,LN]
        ok = (f >= 1.0) & (f <= float(n_steps))
        px = start[:, 0:1] + direction[:, 0:1] * (f * step)
        py = start[:, 1:2] + direction[:, 1:2] * (f * step)
        d = f * step * dnorm[:, None]
        gx = jnp.clip(jnp.floor((px - grid.origin_x) / res).astype(jnp.int32), 0, W - 1)
        gy = jnp.clip(jnp.floor((py - grid.origin_y) / res).astype(jnp.int32), 0, H - 1)
        occ = occ_flat[gy * W + gx] == 1
        cand = occ & ok & (d >= min_dist)
        found = jnp.any(cand, axis=1)
        lane = jnp.argmax(cand, axis=1)
        first_k = (w * C - C // 2 + lane).astype(jnp.int32)
        return found, first_k

    def cond(state):
        resolved, _, _, _ = state
        return jnp.any(~resolved)

    def body(state):
        resolved, kcur, hit, first_k = state
        rem = cmask & (widx >= kcur[:, None])                         # [N,NC+1]
        has_w = jnp.any(rem, axis=1)
        w = jnp.argmax(rem, axis=1).astype(jnp.int32)
        found, fk = fine_window(w)
        live = ~resolved & has_w
        newly_hit = live & found
        hit = hit | newly_hit
        first_k = jnp.where(newly_hit, fk, first_k)
        resolved = resolved | ~has_w | newly_hit
        kcur = jnp.where(live & ~found, w + 1, kcur)
        return resolved, kcur, hit, first_k

    resolved0 = ~active | ~jnp.any(cmask, axis=1)
    state0 = (resolved0, jnp.zeros((N,), jnp.int32),
              jnp.zeros((N,), bool), jnp.ones((N,), jnp.int32))
    _, _, hit, first_k = jax.lax.while_loop(cond, body, state0)

    kf = first_k.astype(jnp.float32)
    hx = start[:, 0] + direction[:, 0] * (kf * step)
    hy = start[:, 1] + direction[:, 1] * (kf * step)
    hit_xy = jnp.where(hit[:, None], jnp.stack([hx, hy], axis=1), 0.0)
    return hit, hit_xy


def cast_rays_unbounded(
    grid: GridWorld, start, direction, active, min_dist, step: float, diag_mult: float, s: Statics
):
    """castRayFromEndpoint (cpp:1774-1891): march from min_dist with `step`
    until leaving the grid (return the clamped boundary point) or hitting an
    occupied skeleton cell (return the sample point). start/direction: [N,2]."""
    res = jnp.float32(s.resolution)
    minx = grid.origin_x
    maxx = grid.origin_x + grid.w_cells.astype(jnp.float32) * res
    miny = grid.origin_y
    maxy = grid.origin_y + grid.h_cells.astype(jnp.float32) * res
    gw = grid.w_cells.astype(jnp.float32) * res
    gh = grid.h_cells.astype(jnp.float32) * res
    abs_max = jnp.sqrt(gw * gw + gh * gh) * diag_mult

    def clamp(p):
        return jnp.stack(
            [jnp.clip(p[:, 0], minx, maxx), jnp.clip(p[:, 1], miny, maxy)], axis=1
        )

    # default result: terminal point at abs_max, clamped (cpp:1874-1890)
    result0 = clamp(start + direction * abs_max)
    N = start.shape[0]
    CH = 256  # steps evaluated per while iteration (vectorized chunk)
    Hc, Wc = grid.occ.shape

    def cond(state):
        dist, done, _ = state
        return jnp.any(~done & (dist <= abs_max))

    def body(state):
        dist, done, result = state
        k = jnp.arange(CH, dtype=jnp.float32)[None, :]
        dk = dist[:, None] + k * step                          # [N,CH]
        px = start[:, 0:1] + direction[:, 0:1] * dk
        py = start[:, 1:2] + direction[:, 1:2] * dk
        inb = (px >= minx) & (px <= maxx) & (py >= miny) & (py <= maxy)
        # C-truncation cast toward zero (cpp:1821-1822)
        mx = ((px - grid.origin_x) / res).astype(jnp.int32)
        my = ((py - grid.origin_y) / res).astype(jnp.int32)
        ing = (mx >= 0) & (mx < grid.w_cells) & (my >= 0) & (my < grid.h_cells)
        occ = (
            grid.occ.reshape(-1)[jnp.clip(my, 0, Hc - 1) * Wc + jnp.clip(mx, 0, Wc - 1)]
            == 1
        ) & ing
        within = dk <= abs_max
        event = (~inb | occ) & within
        has = jnp.any(event, axis=1)
        first = jnp.argmax(event, axis=1)
        rows = jnp.arange(N)
        ep = jnp.stack([px[rows, first], py[rows, first]], axis=1)
        e_inb = inb[rows, first]
        fire = ~done & has
        result = jnp.where((fire & ~e_inb)[:, None], clamp(ep), result)
        result = jnp.where((fire & e_inb)[:, None], ep, result)
        done = done | fire
        return dist + CH * step, done, result

    dist0 = jnp.full((N,), jnp.float32(min_dist))
    done0 = ~active
    _, _, result = jax.lax.while_loop(cond, body, (dist0, done0, result0))
    return result


def _row_dirs(rows: TreeRows):
    d = rows.ep2 - rows.ep1
    dist = jnp.sqrt(jnp.sum(d * d, axis=1))
    safe = jnp.maximum(dist, 1e-6)
    rd = d / safe[:, None]
    return d, dist, rd


def virtual_seed_candidates(rows: TreeRows, skel: GridWorld, poly: Polygon,
                            params: AosParams, s: Statics):
    """Ordered candidate list for generateVirtualSeeds (cpp:1987-2268):
    per row r, per interval i (1..num), the triple (base, perp1-ray seed,
    perp2-ray seed). Returns (xy [R*I*3, 2], valid [R*I*3])."""
    R, I = s.max_rows, s.max_seeds_per_row
    d, dist, rd = _row_dirs(rows)
    num = jnp.floor(dist / params.virtual_seed_interval).astype(jnp.int32)
    row_ok = rows.valid & (dist >= params.virtual_seed_interval)

    i_idx = jnp.arange(1, I + 1, dtype=jnp.float32)          # [I]
    t = i_idx[None, :] / (num[:, None].astype(jnp.float32) + 1.0)   # [R,I]
    base = rows.ep1[:, None, :] + t[..., None] * d[:, None, :]      # [R,I,2]
    iv = row_ok[:, None] & (jnp.arange(1, I + 1)[None, :] <= num[:, None])  # [R,I]

    perp1 = jnp.stack([-rd[:, 1], rd[:, 0]], axis=1)          # [R,2]
    perp2 = -perp1

    base_f = base.reshape(R * I, 2)
    iv_f = iv.reshape(R * I)
    starts = jnp.concatenate([base_f, base_f], axis=0)        # [2*R*I, 2]
    dirs = jnp.concatenate(
        [jnp.broadcast_to(perp1[:, None, :], (R, I, 2)).reshape(R * I, 2),
         jnp.broadcast_to(perp2[:, None, :], (R, I, 2)).reshape(R * I, 2)], axis=0)
    act = jnp.concatenate([iv_f, iv_f])
    hit, hit_xy = raycast_bounded(
        skel, starts, dirs, act, s.seed_raycast_max, params.seed_raycast_min, s
    )
    miss_xy = starts + dirs * s.seed_raycast_max
    ray_xy = jnp.where(hit[:, None], hit_xy, miss_xy)
    ray1 = ray_xy[: R * I].reshape(R, I, 2)
    ray2 = ray_xy[R * I :].reshape(R, I, 2)

    # ray seeds skipped when inside the polygon (cpp:2128-2135)
    has_poly = poly.count >= 3
    in1 = point_in_polygon(ray1[..., 0], ray1[..., 1], poly) & has_poly
    in2 = point_in_polygon(ray2[..., 0], ray2[..., 1], poly) & has_poly

    cand = jnp.stack([base, ray1, ray2], axis=2)              # [R,I,3,2]
    cvalid = jnp.stack([iv, iv & ~in1, iv & ~in2], axis=2)    # [R,I,3]
    return cand.reshape(R * I * 3, 2), cvalid.reshape(R * I * 3)


def endpoint_ray_candidates(rows: TreeRows, skel: GridWorld, poly: Polygon,
                            params: AosParams, s: Statics):
    """Ordered candidates for generateRayPointsFromEndpoints (cpp:1894-1982):
    per row, 6 rays (ep1: 0/-90/+90 deg; ep2: 0/-90/+90 deg). Kept iff inside
    the grid bounds and OUTSIDE the polygon."""
    R = s.max_rows

    def ray_dir(ep, other, angle_deg):
        d = other - ep
        n = jnp.sqrt(jnp.sum(d * d, axis=1))
        fwd = jnp.where(n[:, None] > 1e-6, d / jnp.maximum(n, 1e-6)[:, None],
                        jnp.array([1.0, 0.0], jnp.float32))
        outward = -fwd
        perp = jnp.stack([-fwd[:, 1], fwd[:, 0]], axis=1)
        a = jnp.float32(abs(angle_deg) * jnp.pi / 180.0)
        if angle_deg > 0:
            rd = jnp.cos(a) * outward + jnp.sin(a) * perp
        else:
            rd = jnp.cos(a) * outward + jnp.sin(a) * (-perp)
        return rd / jnp.maximum(jnp.sqrt(jnp.sum(rd * rd, axis=1)), 1e-12)[:, None]

    starts, dirs = [], []
    for ep, other in ((rows.ep1, rows.ep2), (rows.ep2, rows.ep1)):
        for ang in (0.0, -90.0, 90.0):
            starts.append(ep)
            dirs.append(ray_dir(ep, other, ang))
    start = jnp.stack(starts, axis=1).reshape(R * 6, 2)   # [R,6,2] C-order
    direction = jnp.stack(dirs, axis=1).reshape(R * 6, 2)
    active = jnp.repeat(rows.valid, 6)

    pts = cast_rays_unbounded(
        skel, start, direction, active,
        jnp.float32(params.seed_raycast_min), 0.1, 3.0, s
    )
    res = jnp.float32(s.resolution)
    minx = skel.origin_x
    maxx = skel.origin_x + skel.w_cells.astype(jnp.float32) * res
    miny = skel.origin_y
    maxy = skel.origin_y + skel.h_cells.astype(jnp.float32) * res
    in_grid = (
        (pts[:, 0] >= minx) & (pts[:, 0] <= maxx)
        & (pts[:, 1] >= miny) & (pts[:, 1] <= maxy)
    )
    has_poly = poly.count >= 3
    in_poly = point_in_polygon(pts[:, 0], pts[:, 1], poly) & has_poly
    finite = jnp.isfinite(pts[:, 0]) & jnp.isfinite(pts[:, 1])
    valid = active & finite & in_grid & ~in_poly
    return pts, valid


def endpoint_seed_candidates(rows: TreeRows, s: Statics):
    """Row start/end points (cpp:1450-1497), order [ep1_r, ep2_r] per row."""
    R = s.max_rows
    pts = jnp.stack([rows.ep1, rows.ep2], axis=1).reshape(R * 2, 2)
    valid = jnp.repeat(rows.valid, 2)
    return pts, valid


def generate_seeds(rows: TreeRows, skel: GridWorld, poly: Polygon,
                   params: AosParams, s: Statics) -> SeedSet:
    """Full /voronoi_seeds assembly in publish order (cpp:1670-1710):
    virtual (base+ray, deduped), endpoint rays (deduped), row endpoints
    (deduped); real seeds are permanently empty in the reference
    (tree-tracking removed; cpp:1431-1432, 2277-2278)."""
    v_xy, v_val = virtual_seed_candidates(rows, skel, poly, params, s)
    r_xy, r_val = endpoint_ray_candidates(rows, skel, poly, params, s)
    e_xy, e_val = endpoint_seed_candidates(rows, s)

    v_acc = greedy_dedupe(v_xy, v_val, params.seed_dedupe_dist)
    r_acc = greedy_dedupe(r_xy, r_val, params.seed_dedupe_dist)
    e_acc = greedy_dedupe(e_xy, e_val, params.seed_dedupe_dist)

    xy = jnp.concatenate([v_xy, r_xy, e_xy], axis=0)
    acc = jnp.concatenate([v_acc, r_acc, e_acc], axis=0)
    kind = jnp.concatenate(
        [
            jnp.zeros(v_xy.shape[0], jnp.int8),
            jnp.full(r_xy.shape[0], 2, jnp.int8),
            jnp.full(e_xy.shape[0], 3, jnp.int8),
        ]
    )
    # order-preserving compaction into the seed buffer
    Smax = s.max_seeds
    rank = jnp.cumsum(acc.astype(jnp.int32)) - 1
    tgt = jnp.where(acc & (rank < Smax), rank, Smax)
    out_xy = jnp.zeros((Smax + 1, 2), jnp.float32).at[tgt].set(xy, mode="drop")[:Smax]
    out_kind = jnp.zeros((Smax + 1,), jnp.int8).at[tgt].set(kind, mode="drop")[:Smax]
    n = jnp.minimum(jnp.sum(acc.astype(jnp.int32)), Smax)
    return SeedSet(xy=out_xy, valid=jnp.arange(Smax) < n, kind=out_kind)
