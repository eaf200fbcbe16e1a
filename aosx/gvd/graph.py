"""GVD graph builder (C8) - the jitted equivalent of aos_gvd_node.cpp.

Stages (reference lines cited per function):
 1. greedy 0.5 m seed merge                      (aos_gvd_node.cpp:84-128)
 2. jump-flood nearest-seed field                 (replaces Subdiv2D facets)
 3. Voronoi vertices: >=3 distinct owners around a cell corner, plus border
    vertices where ownership changes along the live border (the reference's
    facet vertices after its outside-grid filter, cpp:420-483)
 4. ridge edges: vertices sharing a seed-pair ridge, connected consecutively
    along the ridge tangent (sort by (pair key, tangent projection))
 5. occupied-crossing filter, sampled at res/2    (cpp:320-359)
 6. proximity edges <= 0.5 m                      (cpp:861-894)
 7. TL/TR/BL/BR labels: expanding-radius quarter-plane search + castRay
    fallback                                      (cpp:485-790)
 8. GvdGraph assembly with bitmask labels + per-(cluster,label) node table
                                                  (cpp:897-1010)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import AosParams, Statics
from ..types import GridWorld, GvdGraph, SeedSet, TreeRows
from .voronoi import jump_flood

# Proximity-pass row-chunk size (build_edges): bounds the [RC, N] pairwise
# transient at N x 8 KB instead of the [N, N] plane that would be 4 GB at
# the for_grid giant-map node caps. Module-level so the bit-equality test
# can pin chunked == unchunked (tests/test_gvd.py).
_PROX_CHUNK = 2048


def _clearances(skel, pos, edges, edge_valid, s):
    from .clearance import edge_clearances, obstacle_distance_field

    dist = obstacle_distance_field(skel, s)
    return edge_clearances(dist, skel, pos, edges, edge_valid, s)


# ---------------------------------------------------------------------------
# 1. seed merge
# ---------------------------------------------------------------------------


def merge_seeds(seeds: SeedSet, params: AosParams, s: Statics) -> SeedSet:
    """Greedy order-dependent merge (cpp:84-128): seed i is a representative
    iff no earlier representative lies within merge_distance (<=); every
    non-representative is absorbed by its EARLIEST representative; the output
    is the member centroid, in representative order. Computed with the same
    parallel-frontier scheme as perceive.seeds.greedy_dedupe (d <= t here).

    Non-finite seeds are dropped up front, mirroring the reference's isfinite
    hygiene at the Voronoi boundary (voronoi_diagram.cpp:28-30,67-69)."""
    S = seeds.xy.shape[0]
    finite = jnp.all(jnp.isfinite(seeds.xy), axis=1)
    seeds = SeedSet(xy=jnp.where(finite[:, None], seeds.xy, 0.0),
                    valid=seeds.valid & finite, kind=seeds.kind)
    xy = jnp.where(seeds.valid[:, None], seeds.xy, 1e9 + jnp.arange(S, dtype=jnp.float32)[:, None] * 1e3)
    t = jnp.asarray(params.seed_merge_dist, jnp.float32)
    idx = jnp.arange(S)
    d2 = jnp.sum((xy[:, None, :] - xy[None, :, :]) ** 2, axis=-1)  # [S,S]
    conflict = (d2 <= t * t) & (idx[None, :] < idx[:, None])       # j < i within t

    def cond(state):
        rep, absorbed, it = state
        return jnp.any(seeds.valid & ~rep & ~absorbed) & (it < S)

    def body(state):
        rep, absorbed, it = state
        undecided = seeds.valid & ~rep & ~absorbed
        conf_rep = jnp.any(conflict & rep[None, :], axis=1)
        conf_und = jnp.any(conflict & undecided[None, :], axis=1)
        newly_abs = undecided & conf_rep
        newly_rep = undecided & ~conf_rep & ~conf_und
        return rep | newly_rep, absorbed | newly_abs, it + 1

    rep, absorbed, _ = jax.lax.while_loop(
        cond, body, (jnp.zeros(S, bool), jnp.zeros(S, bool), jnp.int32(0))
    )
    # absorber = earliest representative within t
    within = (d2 <= t * t) & rep[None, :] & (idx[None, :] < idx[:, None])
    absorber = jnp.min(jnp.where(within, idx[None, :], S), axis=1)
    owner = jnp.where(rep, idx, jnp.where(absorbed, absorber, S))
    sum_xy = jax.ops.segment_sum(
        jnp.where(seeds.valid[:, None], seeds.xy, 0.0), owner, num_segments=S + 1
    )[:S]
    cnt = jax.ops.segment_sum(seeds.valid.astype(jnp.float32), owner, num_segments=S + 1)[:S]
    centroid = sum_xy / jnp.maximum(cnt[:, None], 1.0)

    # compact representatives in order
    rank = jnp.cumsum(rep.astype(jnp.int32)) - 1
    n = jnp.sum(rep.astype(jnp.int32))
    tgt = jnp.where(rep, rank, S)
    out = jnp.zeros((S + 1, 2), jnp.float32).at[tgt].set(centroid, mode="drop")[:S]
    return SeedSet(xy=out, valid=jnp.arange(S) < n, kind=jnp.zeros(S, jnp.int8))


# ---------------------------------------------------------------------------
# 3. vertices
# ---------------------------------------------------------------------------


def extract_vertices(grid: GridWorld, owner, s: Statics):
    """Voronoi vertices from the ownership field.

    Returns (pos [N,2] f32, owners [N,4] i32 (-1 pad), valid [N]) with N =
    s.max_nodes, in raster order (interior corners first, then border runs).
    """
    h, w = owner.shape
    res = jnp.float32(s.resolution)
    S_NONE = jnp.int32(-1)

    o00 = owner
    o01 = jnp.roll(owner, -1, axis=1)
    o10 = jnp.roll(owner, -1, axis=0)
    o11 = jnp.roll(jnp.roll(owner, -1, axis=0), -1, axis=1)

    iy = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    ix = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    interior = (iy < grid.h_cells - 1) & (ix < grid.w_cells - 1)

    def distinct_count(a, b, c, d):
        ok = lambda v: v >= 0
        cnt = ok(a).astype(jnp.int32)
        cnt += (ok(b) & (b != a)).astype(jnp.int32)
        cnt += (ok(c) & (c != a) & (c != b)).astype(jnp.int32)
        cnt += (ok(d) & (d != a) & (d != b) & (d != c)).astype(jnp.int32)
        return cnt

    ncnt = distinct_count(o00, o01, o10, o11)
    is_vertex = interior & (ncnt >= 3)
    vx = grid.origin_x + (ix + 1).astype(jnp.float32) * res
    vy = grid.origin_y + (iy + 1).astype(jnp.float32) * res

    # border vertices: ownership change along the live border
    top = (iy == grid.h_cells - 1) & (ix < grid.w_cells - 1) & (o00 != o01) & (o00 >= 0) & (o01 >= 0)
    bot = (iy == 0) & (ix < grid.w_cells - 1) & (o00 != o01) & (o00 >= 0) & (o01 >= 0)
    lef = (ix == 0) & (iy < grid.h_cells - 1) & (o00 != o10) & (o00 >= 0) & (o10 >= 0)
    rig = (ix == grid.w_cells - 1) & (iy < grid.h_cells - 1) & (o00 != o10) & (o00 >= 0) & (o10 >= 0)

    # candidates: the interior plane [H*W] plus 4 border VECTORS (the border
    # sets live on single rows/columns; keeping them as [H,W] planes made the
    # compaction input 5x larger for nothing)
    topy = grid.origin_y + grid.h_cells.astype(jnp.float32) * res
    boty = jnp.zeros(()) + grid.origin_y
    lefx = jnp.zeros(()) + grid.origin_x
    rigx = grid.origin_x + grid.w_cells.astype(jnp.float32) * res
    hm1 = jnp.clip(grid.h_cells - 1, 0, h - 1)
    wm1 = jnp.clip(grid.w_cells - 1, 0, w - 1)

    def row_at(plane, r):
        return jax.lax.dynamic_index_in_dim(plane, r, axis=0, keepdims=False)

    def col_at(plane, c):
        return jax.lax.dynamic_index_in_dim(plane, c, axis=1, keepdims=False)

    none_w = jnp.full((w,), -1, jnp.int32)
    none_h = jnp.full((h,), -1, jnp.int32)
    segs = [
        # (mask, px, py, owner0, owner1, owner2, owner3), flattened in order
        (is_vertex.reshape(-1), vx.reshape(-1), vy.reshape(-1),
         o00.reshape(-1), o01.reshape(-1), o10.reshape(-1), o11.reshape(-1)),
        (row_at(top, hm1), row_at(vx, hm1), jnp.full((w,), 1.0) * topy,
         row_at(o00, hm1), row_at(o01, hm1), none_w, none_w),
        (bot[0], vx[0], jnp.full((w,), 1.0) * boty,
         o00[0], o01[0], none_w, none_w),
        (lef[:, 0], jnp.full((h,), 1.0) * lefx, vy[:, 0],
         o00[:, 0], o10[:, 0], none_h, none_h),
        (col_at(rig, wm1), jnp.full((h,), 1.0) * rigx, col_at(vy, wm1),
         col_at(o00, wm1), col_at(o10, wm1), none_h, none_h),
    ]
    masks = jnp.concatenate([p[0] for p in segs])
    pxs = jnp.concatenate([p[1].astype(jnp.float32) for p in segs])
    pys = jnp.concatenate([p[2].astype(jnp.float32) for p in segs])
    ow = [jnp.concatenate([p[3 + k] for p in segs]) for k in range(4)]

    N = s.max_nodes
    from ..ops import compact_take, compact_true_hier

    # hierarchical first-N-true: vertex corners are sparse, so the
    # window-level pass shrinks the top_k input ~32x (exact; direct
    # fallback if > N windows contain a vertex)
    sel, n_nodes = compact_true_hier(masks, N, kw=N)
    pos = jnp.stack(
        [compact_take(pxs, sel, 0.0), compact_take(pys, sel, 0.0)], axis=1
    )
    owners = jnp.stack([compact_take(o, sel, -1) for o in ow], axis=1)
    # mask duplicate owners within a vertex to -1 (so pair keys are unique)
    a = owners
    for k in range(1, 4):
        dup = jnp.zeros((N,), bool)
        for j in range(k):
            dup |= (a[:, k] == a[:, j]) & (a[:, k] >= 0)
        a = a.at[:, k].set(jnp.where(dup, -1, a[:, k]))
    valid = jnp.arange(N) < n_nodes
    return pos, a, valid


# ---------------------------------------------------------------------------
# 4-6. edges
# ---------------------------------------------------------------------------


def _edge_crossing_dense(grid: GridWorld, a, b, valid, num, s: Statics,
                         n_samples: int):
    """Dense [E, n_samples] sampling (fallback path; num precomputed/clamped
    per entry). Same per-sample arithmetic as the packed path."""
    res = jnp.float32(s.resolution)
    length = jnp.sqrt(jnp.sum((b - a) ** 2, axis=1))
    i = jnp.arange(n_samples, dtype=jnp.float32)[None, :]                 # [1,T]
    t = jnp.minimum(i / jnp.maximum(num[:, None].astype(jnp.float32), 1.0), 1.0)
    px = a[:, 0:1] + t * (b[:, 0:1] - a[:, 0:1])
    py = a[:, 1:2] + t * (b[:, 1:2] - a[:, 1:2])
    mx = ((px - grid.origin_x) / res).astype(jnp.int32)
    my = ((py - grid.origin_y) / res).astype(jnp.int32)
    ing = (mx >= 0) & (mx < grid.w_cells) & (my >= 0) & (my < grid.h_cells)
    # flat 1D gather: measured ~1.6x faster than the 2D form on the v5e
    Hs, Ws = grid.occ.shape
    flat_idx = jnp.clip(my, 0, Hs - 1) * Ws + jnp.clip(mx, 0, Ws - 1)
    occ = grid.occ.reshape(-1)[flat_idx] == 1
    sample_ok = i <= num[:, None].astype(jnp.float32)
    crossing = jnp.any(occ & ing & sample_ok, axis=1) & valid & (length >= 1e-6)
    return crossing


def edge_crossing_packed(grid: GridWorld, a, b, nmax, valid, s: Statics,
                         cap: int, return_diag: bool = False):
    """edgePassesThroughOccupiedPixels (cpp:320-359) for a batch of entries
    with per-entry sample caps: num = min(len/step + 1, nmax-1), samples
    k = 0..num at t = k/num (so the final sample lands on the endpoint).

    COARSE-TO-FINE packed evaluation. XLA:TPU gathers run near-scalar
    (~10-18 ns/element, CLAUDE.md), so cost == number of occupancy lookups.
    Two exact-decision passes:

    1. COARSE: every C4-th fine sample (C4 = s.crossing_coarse_factor),
       looked up in the occupancy grid dilated by Chebyshev radius
       C4/4 + 1. Fine samples are <= res/2 apart, so any fine sample lies
       within C4/2 fine steps (<= C4/4 cells) of a coarse sample; the
       +1-cell rounding margin makes the dilation catch every possible
       fine hit (no false negatives). Entries whose per-sample spacing
       exceeds res/2 (num capped by nmax) break that bound - their coarse
       slots are force-flagged so the fine pass evaluates them fully.
    2. FINE: exact sampling of the ORIGINAL grid, but only in 2*C4-lane
       windows around coarse hits - ~10x fewer lookups than the all-fine
       packed layout on real GVD candidate sets.

    EVERY per-slot cost in here (the hold-last scans, the coarse gather,
    the window compaction top_k, the fine gather) is proportional to the
    COARSE buffer size cap/C4, independent of how many slots are actually
    used - measured ~12 ms device at C4=4 even for near-empty candidate
    sets. C4=8 halves all of it.

    Slot layout (both passes): entries laid end-to-end in a [cap'] buffer:
    per-entry offsets by cumsum, per-slot edge parameters by a start-scatter
    + hold-last associative scan (pure vector work). On coarse-slot or
    window overflow, falls back to the dense path (jax.lax.cond) so
    decisions never change, only speed."""
    res = jnp.float32(s.resolution)
    step = res * 0.5
    E = a.shape[0]
    length = jnp.sqrt(jnp.sum((b - a) ** 2, axis=1))
    num_raw = (length / step).astype(jnp.int32) + 1
    num = jnp.minimum(num_raw, nmax - 1)
    capped = num_raw > nmax - 1            # spacing coarser than res/2
    C4 = s.crossing_coarse_factor          # coarse factor
    assert C4 % 4 == 0 and C4 >= 4, C4
    numc = (num + C4 - 1) // C4            # coarse samples = 0..numc
    nsamp = jnp.where(valid, numc + 1, 0)
    off = jnp.cumsum(nsamp) - nsamp        # exclusive prefix
    total = off[-1] + nsamp[-1]

    # 2D slot layout [NR, NC]: flat 1-D scans over ~1M slots compile
    # pathologically on the TPU backend; lane-dim scans over a grid-like 2D
    # shape plus a tiny per-row carry scan are equivalent.
    NC = 4096
    NR = (cap // C4 + NC - 1) // NC
    capp = NR * NC
    F = max(4096, cap // 64)               # fine-window buffer

    # occupancy dilated by Chebyshev radius C4/4 + 1: a fine hit within
    # C4/2 fine steps of a coarse sample is <= C4/2 * res/2 = C4/4 cells
    # away, + 1 for cell rounding (separable row/col max windows)
    rad = C4 // 4 + 1
    occ1 = (grid.occ == 1).astype(jnp.uint8)
    dil = jax.lax.reduce_window(occ1, jnp.uint8(0), jax.lax.max,
                                (1, 2 * rad + 1), (1, 1), "SAME")
    dil = jax.lax.reduce_window(dil, jnp.uint8(0), jax.lax.max,
                                (2 * rad + 1, 1), (1, 1), "SAME")

    dx = b[:, 0] - a[:, 0]
    dy = b[:, 1] - a[:, 1]
    eidx = jnp.arange(E, dtype=jnp.float32)
    rows = jnp.stack(
        [a[:, 0], a[:, 1], dx, dy, num.astype(jnp.float32),
         off.astype(jnp.float32), eidx, capped.astype(jnp.float32),
         jnp.ones((E,), jnp.float32)], axis=1)           # [E,9]
    tgt = jnp.where((nsamp > 0) & (off < capp), off, capp)
    table = (jnp.zeros((capp + 1, 9), jnp.float32)
             .at[tgt].set(rows, mode="drop")[:capp])
    t2 = table.reshape(NR, NC, 9)
    flag = t2[:, :, 8] > 0.5                             # [NR,NC]

    def op(x, y):
        fx, vx = x
        fy, vy = y
        return fx | fy, jnp.where(fy[..., None], vy, vx)

    # hold-last within each row, then carry the last start of preceding
    # rows into slots before a row's first start
    f_in, v_in = jax.lax.associative_scan(op, (flag, t2[:, :, :8]), axis=1)
    f_last = f_in[:, -1]                                  # [NR]
    v_last = v_in[:, -1]                                  # [NR,8]
    f_c, v_c = jax.lax.associative_scan(op, (f_last, v_last), axis=0)
    carry = jnp.concatenate([jnp.zeros((1, 8), jnp.float32), v_c[:-1]], 0)
    vals = jnp.where(f_in[..., None], v_in, carry[:, None, :])  # [NR,NC,8]

    Hs, Ws = grid.occ.shape
    slot = (jax.lax.broadcasted_iota(jnp.int32, (NR, NC), 0) * NC
            + jax.lax.broadcasted_iota(jnp.int32, (NR, NC), 1))
    m = slot.astype(jnp.float32) - vals[:, :, 5]          # coarse index
    nums = vals[:, :, 4]
    tt = jnp.minimum(m * C4 / jnp.maximum(nums, 1.0), 1.0)
    px = vals[:, :, 0] + tt * vals[:, :, 2]
    py = vals[:, :, 1] + tt * vals[:, :, 3]
    mx = ((px - grid.origin_x) / res).astype(jnp.int32)
    my = ((py - grid.origin_y) / res).astype(jnp.int32)
    # clamped (no in-grid mask): a coarse sample just outside the grid can
    # still cover an in-grid fine hit; the fine pass applies the exact mask
    flat = jnp.clip(my, 0, Hs - 1) * Ws + jnp.clip(mx, 0, Ws - 1)
    dhit = dil.reshape(-1)[flat.reshape(-1)].reshape(NR, NC) == 1
    hitc = (dhit | (vals[:, :, 7] > 0.5)) & (slot < total)
    nwin_true = jnp.sum(hitc.astype(jnp.int32))

    from ..ops import compact_take, compact_true

    def fine(_):
        wsel, _ = compact_true(hitc.reshape(-1), F)       # slot indices
        wv = compact_take(vals.reshape(capp, 8), wsel, 0.0)   # [F,8]
        wok = wsel >= 0
        wnum = jnp.maximum(wv[:, 4], 1.0)
        wm = wsel.astype(jnp.float32) - wv[:, 5]
        fc = jnp.minimum(wm * C4, wv[:, 4])               # center fine idx
        # window must cover fine samples within C4/2 of the coarse sample
        fi = (fc[:, None] - C4 / 2
              + jnp.arange(2 * C4, dtype=jnp.float32)[None, :])
        fok = (fi >= 0.0) & (fi <= wv[:, 4:5]) & wok[:, None]
        t = jnp.clip(fi, 0.0, wv[:, 4:5]) / wnum[:, None]
        fpx = wv[:, 0:1] + t * wv[:, 2:3]
        fpy = wv[:, 1:2] + t * wv[:, 3:4]
        fmx = ((fpx - grid.origin_x) / res).astype(jnp.int32)
        fmy = ((fpy - grid.origin_y) / res).astype(jnp.int32)
        ing = (fmx >= 0) & (fmx < grid.w_cells) & (fmy >= 0) & (fmy < grid.h_cells)
        fflat = jnp.clip(fmy, 0, Hs - 1) * Ws + jnp.clip(fmx, 0, Ws - 1)
        focc = grid.occ.reshape(-1)[fflat.reshape(-1)].reshape(F, 2 * C4) == 1
        whit = jnp.any(focc & ing & fok, axis=1)
        we = jnp.where(wok, wv[:, 6].astype(jnp.int32), E)
        out = (jnp.zeros((E + 1,), jnp.int32)
               .at[we].max(whit.astype(jnp.int32), mode="drop"))
        return out[:E] > 0

    def dense(_):
        # track the long-edge tier so the exact fallback is never coarser
        # than the fast path it replaces
        return _edge_crossing_dense(grid, a, b, valid, num, s,
                                    max(256, s.crossing_nmax_long))

    ok_fast = (total <= capp) & (nwin_true <= F)
    if s.exact_fallbacks:
        crossing = jax.lax.cond(ok_fast, fine, dense, None)
    else:
        # batched MC path: a vmapped cond would evaluate the dense 256-sample
        # path for every lane every time; overflow is flagged
        # (GUARD_CROSS_DENSE), and the fast result on an overflowed lane may
        # keep edges the dense path would drop
        crossing = fine(None)

    from ..guards import GUARD_CROSS_DENSE, GUARD_EDGE_COARSE

    guards = jnp.where(jnp.any(valid & (num_raw > nmax - 1)),
                       jnp.int32(GUARD_EDGE_COARSE), 0)
    guards |= jnp.where(~ok_fast, jnp.int32(GUARD_CROSS_DENSE), 0)
    out = crossing & valid & (length >= 1e-6)
    if return_diag:  # buffer-sizing diagnostics (benchmarks/probe_build_edges)
        return out, guards, dict(total=total, capp=jnp.int32(capp),
                                 nwin_true=nwin_true, F=jnp.int32(F))
    return out, guards


def _ridge_edges_from(lo, hi, pok, vidx, pos, sx, sy, N: int, S: int, E: int):
    """Candidate (pair, vertex) entries [L] -> E-compacted deduped ridge
    edges. Entries sharing a seed-pair ridge are connected consecutively
    along the ridge tangent (sort by (pair key, tangent projection)); same
    algorithm regardless of L, so the compacted fast path and the full
    fallback below produce identical prefixes."""
    tx = sx[jnp.minimum(hi, S)] - sx[jnp.minimum(lo, S)]
    ty = sy[jnp.minimum(hi, S)] - sy[jnp.minimum(lo, S)]
    # ridge tangent = rot90(seed_b - seed_a)
    tangx, tangy = -ty, tx
    vsafe = jnp.clip(vidx, 0, N - 1)
    vposx = pos[vsafe, 0]
    vposy = pos[vsafe, 1]
    tproj = vposx * tangx + vposy * tangy

    key = jnp.where(pok, lo * (S + 1) + hi, jnp.int32((S + 1) * (S + 1)))
    order = jnp.lexsort((tproj, key))
    key_s = key[order]
    vidx_s = vidx[order]
    same = (key_s[:-1] == key_s[1:]) & (key_s[:-1] < (S + 1) * (S + 1))
    ra = vidx_s[:-1]
    rb = vidx_s[1:]
    r_valid = same & (ra != rb)

    # canonical + dedupe (same vertex pair may border two different ridges)
    ea = jnp.minimum(ra, rb)
    eb = jnp.maximum(ra, rb)
    ekey = jnp.where(r_valid, ea * N + eb, jnp.int32(N) * N)
    ekey_s = jnp.sort(ekey)
    first = jnp.concatenate([jnp.array([True]), ekey_s[1:] != ekey_s[:-1]])
    ridge_valid = first & (ekey_s < jnp.int32(N) * N)
    ridge_a = (ekey_s // N).astype(jnp.int32)
    ridge_b = (ekey_s % N).astype(jnp.int32)

    # compact ridge candidates (cap E); the crossing filter then runs only
    # on the compacted set
    rrank = jnp.cumsum(ridge_valid.astype(jnp.int32)) - 1
    rtgt = jnp.where(ridge_valid & (rrank < E), rrank, E)
    edges_a = jnp.full((E + 1,), -1, jnp.int32).at[rtgt].set(ridge_a, mode="drop")[:E]
    edges_b = jnp.full((E + 1,), -1, jnp.int32).at[rtgt].set(ridge_b, mode="drop")[:E]
    n_ridge_cand = jnp.minimum(jnp.sum(ridge_valid.astype(jnp.int32)), E)
    return edges_a, edges_b, n_ridge_cand


def build_edges(pos, owners, node_valid, grid: GridWorld, seeds: SeedSet,
                params: AosParams, s: Statics, return_diag: bool = False):
    """Ridge edges + proximity edges, occupied-crossing filtered."""
    N, E = s.max_nodes, s.max_edges
    S = seeds.xy.shape[0]

    # ---- ridge entries: (pair key, tangent projection, vertex idx) --------
    pairs = []
    for ii in range(4):
        for jj in range(ii + 1, 4):
            a = owners[:, ii]
            b = owners[:, jj]
            lo = jnp.minimum(a, b)
            hi = jnp.maximum(a, b)
            ok = (lo >= 0) & node_valid
            pairs.append((jnp.where(ok, lo, S), jnp.where(ok, hi, S), ok))
    lo = jnp.concatenate([p[0] for p in pairs])      # [6N]
    hi = jnp.concatenate([p[1] for p in pairs])
    pok = jnp.concatenate([p[2] for p in pairs])
    vidx = jnp.tile(jnp.arange(N, dtype=jnp.int32), 6)

    sx = jnp.concatenate([seeds.xy[:, 0], jnp.zeros((1,), jnp.float32)])
    sy = jnp.concatenate([seeds.xy[:, 1], jnp.zeros((1,), jnp.float32)])

    # compact the candidate entries BEFORE the two sorts: vertices carry ~3
    # owner pairs on average (4-owner corners are rare), so the live entry
    # count is ~3N while the raw list is 6N and the sorts dominate this
    # stage's device time. cumsum+scatter compaction (top_k at large k costs
    # a full sort - CLAUDE.md), preserving index order, so the sorted
    # sequences and every downstream decision are identical. Overflow
    # (> RK live entries) falls back to the full-list path under lax.cond
    # (exact mode) or trips GUARD_RIDGE_COMPACT (fast-only mode).
    RK = 3 * N
    n_live = jnp.sum(pok.astype(jnp.int32))
    crank = jnp.cumsum(pok.astype(jnp.int32)) - 1
    ctgt = jnp.where(pok & (crank < RK), crank, RK)
    clo = jnp.full((RK + 1,), S, jnp.int32).at[ctgt].set(lo, mode="drop")[:RK]
    chi = jnp.full((RK + 1,), S, jnp.int32).at[ctgt].set(hi, mode="drop")[:RK]
    cvidx = jnp.zeros((RK + 1,), jnp.int32).at[ctgt].set(vidx, mode="drop")[:RK]
    cpok = jnp.zeros((RK + 1,), bool).at[ctgt].set(pok, mode="drop")[:RK]

    def ridge_fast(_):
        return _ridge_edges_from(clo, chi, cpok, cvidx, pos, sx, sy, N, S, E)

    def ridge_full(_):
        return _ridge_edges_from(lo, hi, pok, vidx, pos, sx, sy, N, S, E)

    ridge_ok = n_live <= RK
    if s.exact_fallbacks:
        edges_a, edges_b, n_ridge_cand = jax.lax.cond(
            ridge_ok, ridge_fast, ridge_full, None)
    else:
        edges_a, edges_b, n_ridge_cand = ridge_fast(None)
    from ..guards import GUARD_RIDGE_COMPACT

    ridge_guard = jnp.where(~ridge_ok, jnp.int32(GUARD_RIDGE_COMPACT), 0)
    rvalid = jnp.arange(E) < n_ridge_cand
    pa = pos[jnp.maximum(edges_a, 0)]
    pb = pos[jnp.maximum(edges_b, 0)]
    # two-tier sample caps: 64 samples suffice for edges <= 63*res/2 (the
    # vast majority); the rare long edges sample at s.crossing_nmax_long
    # (default 256; coarser than the reference for edges beyond
    # (it-1)*res/2 - documented deviation, PARITY.md, flagged
    # GUARD_EDGE_COARSE; MC_REALISM_STATICS raises it for the long
    # corridor-spanning ridges curved/dropout orchards grow)
    T1 = 64
    length = jnp.sqrt(jnp.sum((pb - pa) ** 2, axis=1))
    num = (length / (s.resolution * 0.5)).astype(jnp.int32) + 1
    short = num <= T1 - 1
    nmax_ridge = jnp.where(short, jnp.int32(T1),
                           jnp.int32(s.crossing_nmax_long))

    # ---- proximity edges <= 0.5 m (cpp:861-894) ---------------------------
    # pairwise over nodes; (i < j) lexicographic order like the reference.
    # ROW-CHUNKED (round 5): a full [N, N] d2/mask pair is 1 GB at
    # N = 16384 and 4 GB at the for_grid giant-map caps — chunks keep the
    # transient O(RC * N) with bit-identical per-row results (the partner
    # top_k and the overflow row-sum are row-local).
    posm = jnp.where(node_valid[:, None], pos, 1e9)
    iidx = jnp.arange(N)
    t = jnp.asarray(params.proximity_edge_dist, jnp.float32)
    # per-row top_k (nodes rarely have > PPN partners within 0.5 m), then a
    # small compaction - a global top_k over the N^2 mask was the hot spot
    from ..ops import compact_true

    PPN = 8
    # guard the per-node partner cap: a node with > PPN partners within the
    # proximity distance silently drops edges the reference would add
    # (PARITY.md bounded approximations; ADVICE r1)
    from ..guards import GUARD_PROX_PPN

    def _prox_rows(rpos, ri):
        """[RC] global row ids -> (overflow bool, partner ids [RC, PPN])."""
        d2 = (
            (rpos[:, None, 0] - posm[None, :, 0]) ** 2
            + (rpos[:, None, 1] - posm[None, :, 1]) ** 2
        )
        prox = (d2 <= t * t) & (d2 > 1e-12) & (iidx[None, :] > ri[:, None])
        over = jnp.any(jnp.sum(prox.astype(jnp.int32), axis=1) > PPN)
        row_j = jnp.where(prox, iidx[None, :], N)
        negj, _ = jax.lax.top_k(-row_j, PPN)                # j ascending
        return over, -negj

    RC = min(_PROX_CHUNK, N)
    if N % RC:  # caps are powers of two in every preset; keep the chunking
        RC = N  # honest for odd user caps by falling back to one chunk
    if N == RC:
        ppn_overflow, cand_j = _prox_rows(posm, iidx)
    else:
        def _chunk(carry, ci):
            base = ci * RC
            rpos = jax.lax.dynamic_slice(posm, (base, 0), (RC, 2))
            over, cj = _prox_rows(rpos, base + jnp.arange(RC))
            return carry | over, cj

        ppn_overflow, cand_chunks = jax.lax.scan(
            _chunk, jnp.bool_(False), jnp.arange(N // RC))
        cand_j = cand_chunks.reshape(N, PPN)
    cand_ok = cand_j < N
    cand_i = jnp.broadcast_to(iidx[:, None], (N, PPN))
    flat_ok = cand_ok.reshape(-1)                           # (i asc, j asc)
    PE = E
    psel, n_prox_cand = compact_true(flat_ok, PE)
    sel_safe = jnp.maximum(psel, 0)
    cpi = jnp.where(psel >= 0, cand_i.reshape(-1)[sel_safe], -1)
    cpj = jnp.where(psel >= 0, cand_j.reshape(-1)[sel_safe], -1)
    pvalid = jnp.arange(PE) < n_prox_cand
    cpa = pos[jnp.maximum(cpi, 0)]
    cpb = pos[jnp.maximum(cpj, 0)]

    # ---- ONE packed crossing pass over ridge + prox candidates ------------
    # (prox entries tested before the in-ridge dedupe: the dedupe only drops
    # duplicates whose crossing value is irrelevant to the final mask)
    all_a_pts = jnp.concatenate([pa, cpa])
    all_b_pts = jnp.concatenate([pb, cpb])
    nmax_all = jnp.concatenate([nmax_ridge, jnp.full((PE,), 32, jnp.int32)])
    valid_all = jnp.concatenate([rvalid, pvalid])
    # cap sized for fields dense in LONG ridge candidates: the bench orchard
    # has ~3.6k 9 m corridor-spanning candidates at ~182 samples each
    # (~750k slots) on top of ~50k short-edge slots
    cross_out = edge_crossing_packed(
        grid, all_a_pts, all_b_pts, nmax_all, valid_all, s,
        cap=s.crossing_cap_edges_factor * s.max_edges,
        return_diag=return_diag)
    crossing_all, cross_guards = cross_out[0], cross_out[1]
    rvalid = rvalid & ~crossing_all[:E]
    pcross = crossing_all[E:]

    # re-compact surviving ridge edges (keeps sorted-key order)
    rrank2 = jnp.cumsum(rvalid.astype(jnp.int32)) - 1
    rtgt2 = jnp.where(rvalid & (rrank2 < E), rrank2, E)
    edges_a = jnp.full((E + 1,), -1, jnp.int32).at[rtgt2].set(edges_a, mode="drop")[:E]
    edges_b = jnp.full((E + 1,), -1, jnp.int32).at[rtgt2].set(edges_b, mode="drop")[:E]
    n_ridge = jnp.minimum(jnp.sum(rvalid.astype(jnp.int32)), E)

    # not already a surviving ridge edge (the reference only records edges
    # that passed the crossing filter in added_edges; cpp:844-857)
    skeys = jnp.sort(jnp.where(jnp.arange(E) < n_ridge, edges_a * N + edges_b, jnp.int32(N) * N))
    ckeys = jnp.where(pvalid, cpi * N + cpj, jnp.int32(N) * N - 1)
    loc = jnp.searchsorted(skeys, ckeys)
    in_ridge = (loc < E) & (skeys[jnp.minimum(loc, E - 1)] == ckeys)
    pvalid = pvalid & ~in_ridge & ~pcross

    # ---- final edge list: ridges then proximity ---------------------------
    all_a = jnp.concatenate([edges_a, jnp.where(pvalid, cpi, -1)])
    all_b = jnp.concatenate([edges_b, jnp.where(pvalid, cpj, -1)])
    all_ok = jnp.concatenate([jnp.arange(E) < n_ridge, pvalid])
    frank = jnp.cumsum(all_ok.astype(jnp.int32)) - 1
    ftgt = jnp.where(all_ok & (frank < E), frank, E)
    fa = jnp.full((E + 1,), -1, jnp.int32).at[ftgt].set(all_a, mode="drop")[:E]
    fb = jnp.full((E + 1,), -1, jnp.int32).at[ftgt].set(all_b, mode="drop")[:E]
    n_edges = jnp.minimum(jnp.sum(all_ok.astype(jnp.int32)), E)
    ev = jnp.arange(E) < n_edges
    lengths = jnp.where(
        ev,
        jnp.sqrt(jnp.sum((pos[jnp.maximum(fb, 0)] - pos[jnp.maximum(fa, 0)]) ** 2, axis=1)),
        0.0,
    )
    guards = (cross_guards | ridge_guard
              | jnp.where(ppn_overflow, jnp.int32(GUARD_PROX_PPN), 0))
    if return_diag:
        return fa, fb, ev, lengths, n_edges, guards, cross_out[2]
    return fa, fb, ev, lengths, n_edges, guards


# ---------------------------------------------------------------------------
# 7. labels
# ---------------------------------------------------------------------------


def _cast_ray_gvd(grid: GridWorld, start, direction, active, s: Statics):
    """castRay (cpp:558-684): step = max(res/2, 0.01), from min_dist 1.0,
    until leaving the grid (clamped boundary point) or an occupied cell."""
    from ..perceive.seeds import cast_rays_unbounded

    step = max(s.resolution * 0.5, 0.01)
    return cast_rays_unbounded(grid, start, direction, active, jnp.float32(1.0), step, 3.0, s)


def find_labels(pos, node_valid, rows_sorted: TreeRows, skel: GridWorld,
                params: AosParams, s: Statics):
    """findClusterEndpointVoronoiBoundaryPoints (cpp:485-556) +
    findVoronoiBoundaryPointNearEndpoint (cpp:686-790).

    rows_sorted: exploration rows in published (sorted) order; endpoints are
    re-oriented so ep1 = smaller x ("TOP", cpp:134-145). For each (cluster,
    label in TL,TR,BL,BR): expanding radii {5,7,9,diag*2}; candidates must
    satisfy dist in (min_dist, radius], dot(outward,dir)>=0 and the perp
    half-plane; nearest candidate wins; castRay fallback otherwise.

    Returns (label_points [C,4,2], label_is_node [C,4] node idx or -1)."""
    C = s.max_rows
    N = s.max_nodes
    res = jnp.float32(s.resolution)

    # ep1 = smaller x
    swap = rows_sorted.ep1[:, 0] > rows_sorted.ep2[:, 0]
    ep1 = jnp.where(swap[:, None], rows_sorted.ep2, rows_sorted.ep1)
    ep2 = jnp.where(swap[:, None], rows_sorted.ep1, rows_sorted.ep2)

    # per (cluster, label): endpoint, other, perp sign
    eps = jnp.stack([ep1, ep1, ep2, ep2], axis=1)        # [C,4,2]
    oth = jnp.stack([ep2, ep2, ep1, ep1], axis=1)
    sign = jnp.array([-1.0, 1.0, -1.0, 1.0], jnp.float32)  # TL,TR,BL,BR

    d = oth - eps
    n = jnp.sqrt(jnp.sum(d * d, axis=-1, keepdims=True))
    main = jnp.where(n > 1e-6, d / jnp.maximum(n, 1e-6), jnp.array([1.0, 0.0]))
    outward = -main                                       # [C,4,2]
    perp = jnp.stack([-main[..., 1], main[..., 0]], axis=-1)

    diff = pos[None, None, :, :] - eps[:, :, None, :]      # [C,4,N,2]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    dirn = diff / jnp.maximum(dist, 1e-12)[..., None]
    dot_out = jnp.sum(outward[:, :, None, :] * dirn, axis=-1)
    dot_perp = jnp.sum(perp[:, :, None, :] * dirn, axis=-1)
    base_ok = (
        node_valid[None, None, :]
        & (dist >= params.label_search_min_dist)
        & (dot_out >= 0.0)
        & (dot_perp * sign[None, :, None] >= 0.0)
    )
    gw = skel.w_cells.astype(jnp.float32) * res
    gh = skel.h_cells.astype(jnp.float32) * res
    diag2 = jnp.sqrt(gw * gw + gh * gh) * 2.0
    radii = [params.label_search_radius0, jnp.float32(7.0), jnp.float32(9.0), diag2]

    big = jnp.float32(1e9)
    best = jnp.full((C, 4), big)
    best_idx = jnp.full((C, 4), -1, jnp.int32)
    found = jnp.zeros((C, 4), bool)
    for r in radii:
        ok = base_ok & (dist <= r)
        dmask = jnp.where(ok, dist, big)
        tier_best = jnp.min(dmask, axis=-1)
        tier_idx = jnp.argmin(dmask, axis=-1).astype(jnp.int32)
        tier_found = tier_best < big
        use = ~found & tier_found
        best = jnp.where(use, tier_best, best)
        best_idx = jnp.where(use, tier_idx, best_idx)
        found = found | tier_found

    # castRay fallback for not-found (always "valid" per cpp:788-789)
    ang = sign  # -90 => -perp, +90 => +perp (cpp:710-717)
    ray_dir = perp * sign[None, :, None]
    starts = eps.reshape(C * 4, 2)
    dirs = ray_dir.reshape(C * 4, 2)
    need = (~found & rows_sorted.valid[:, None]).reshape(C * 4)
    fb = _cast_ray_gvd(skel, starts, dirs, need, s).reshape(C, 4, 2)

    node_pts = pos[jnp.maximum(best_idx, 0)]
    label_points = jnp.where(found[..., None], node_pts, fb)
    label_valid = rows_sorted.valid[:, None] & jnp.ones((C, 4), bool)
    return label_points, label_valid, jnp.where(found, best_idx, -1)


def assign_labels(pos, node_valid, label_points, label_valid, params, s: Statics):
    """publishGraph label matching (cpp:918-995): node gets bit (1<<li) when
    within 0.1 m of any cluster's label point; label_node[c,li] = first
    matching node index."""
    C = s.max_rows
    N = s.max_nodes
    tol = jnp.asarray(params.label_match_tolerance, jnp.float32)
    diff = pos[:, None, None, :] - label_points[None, :, :, :]     # [N,C,4,2]
    d = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
    match = (d < tol) & label_valid[None, :, :] & node_valid[:, None, None]
    bits = jnp.array([1, 2, 4, 8], jnp.int32)
    node_labels = jnp.sum(
        jnp.where(jnp.any(match, axis=1), bits[None, :], 0), axis=-1
    ).astype(jnp.int32)
    idxs = jnp.where(match, jnp.arange(N)[:, None, None], N)
    first = jnp.min(idxs, axis=0)
    label_node = jnp.where(first < N, first, -1).astype(jnp.int32)  # [C,4]
    return node_labels, label_node


# ---------------------------------------------------------------------------
# full build
# ---------------------------------------------------------------------------


def build_gvd_graph(
    seeds: SeedSet,
    rows_sorted: TreeRows,
    skel: GridWorld,
    params: AosParams,
    s: Statics,
    *,
    compute_clearances: bool = False,
    stencil_mesh=None,
    stencil_axis: str = "space",
) -> GvdGraph:
    """processGraph (cpp:255-318) as one jitted function.

    compute_clearances: the reference always publishes edge_clearances = 0
    (aos_gvd_node.cpp:856); True computes real min-obstacle distances
    (extension; see gvd/clearance.py).
    stencil_mesh: optional Mesh - run the JFA ownership field row-sharded
    across chips (parallel/spatial.jump_flood_sharded, bit-identical);
    the sparse graph stages stay replicated (spatial.py docstring)."""
    merged = merge_seeds(seeds, params, s)
    if stencil_mesh is not None:
        from ..parallel.spatial import jump_flood_sharded

        owner = jump_flood_sharded(skel, merged, s, stencil_mesh, stencil_axis)
    else:
        owner = jump_flood(skel, merged, s)
    pos, owners, node_valid = extract_vertices(skel, owner, s)
    ea, eb, ev, lengths, n_edges, edge_guards = build_edges(
        pos, owners, node_valid, skel, merged, params, s
    )
    label_points, label_valid, _ = find_labels(
        pos, node_valid, rows_sorted, skel, params, s
    )
    node_labels, label_node = assign_labels(
        pos, node_valid, label_points, label_valid, params, s
    )
    return GvdGraph(
        nodes=pos,
        node_valid=node_valid,
        node_labels=node_labels,
        label_node=label_node,
        edges=jnp.stack([ea, eb], axis=1),
        edge_valid=ev,
        edge_lengths=lengths,
        edge_clearances=(
            _clearances(skel, pos, jnp.stack([ea, eb], axis=1), ev, s)
            if compute_clearances
            else jnp.zeros_like(lengths)  # reference always writes 0
        ),
        num_nodes=jnp.sum(node_valid.astype(jnp.int32)),
        num_edges=n_edges,
        guards=edge_guards,
    )
