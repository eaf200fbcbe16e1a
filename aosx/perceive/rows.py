"""Skeleton clustering + tree-row fitting (C5)
(reference: aos_seed_gen_node.cpp:970-1512).

TPU mapping:
- The skeleton is sparse (<< 1% of cells), so connected components run on a
  COMPACTED cell list (raster-order scatter compaction), not the dense grid:
  a Shiloach-Vishkin style hook + full path compression union-find over a
  [MAX_SKEL, 8] neighbor table. Gathers touch 16k elements instead of 4M grid
  cells, and convergence is O(log n) outer rounds (plain min-neighbor
  propagation is linear on zigzag chains - measured, not guessed).
- Cluster ordering: component root = min compact index = first cell in raster
  order == the reference's BFS discovery order (the C++ scans y-major and
  starts BFS at the first unvisited cell), so compacted cluster ids match.
- per-cluster stats: segment reductions over the cell list.
- exact max-pairwise length (cpp:1062-1074): blocked pairwise distances with
  a same-cluster mask + segment max. Exact, like the reference (not 2-sweep).
- endpoints (cpp:1354-1402): farthest-from-centroid, then farthest in the
  opposite half-space; ties broken by lowest cell index (the reference breaks
  ties by BFS order; documented deviation, measure-zero on real data).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import AosParams, Statics
from ..geom import point_in_polygon
from ..types import GridWorld, Polygon, TreeRows
from .raster import live_mask

_NEIGH = ((-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1))


def compact_cells(mask, s: Statics):
    """Scatter-compact True cells of mask [H,W] into raster order.

    Returns (cell_flat [M] i32 flat index or -1, cell_ok [M] bool,
    inv [H*W+1] i32 mapping flat index -> compact index (M if not a cell)).
    """
    from ..ops import compact_true

    h, w = mask.shape
    M = s.max_skel_cells
    flat = mask.reshape(-1)
    cell_flat, _ = compact_true(flat, M)
    cell_ok = cell_flat >= 0
    inv_tgt = jnp.where(cell_ok, cell_flat, h * w)
    inv = (
        jnp.full((h * w + 1,), M, jnp.int32)
        .at[inv_tgt]
        .set(jnp.arange(M, dtype=jnp.int32), mode="drop")
    )
    inv = inv.at[h * w].set(M)
    return cell_flat, cell_ok, inv


def neighbor_table(cell_flat, cell_ok, inv, h: int, w: int):
    """[M,8] compact indices of 8-neighbors (M = none)."""
    M = cell_flat.shape[0]
    safe = jnp.maximum(cell_flat, 0)
    cy = safe // w
    cx = safe % w
    cols = []
    for dy, dx in _NEIGH:
        ny, nx = cy + dy, cx + dx
        ok = cell_ok & (ny >= 0) & (ny < h) & (nx >= 0) & (nx < w)
        nflat = jnp.where(ok, ny * w + nx, h * w)
        cols.append(inv[nflat])
    return jnp.stack(cols, axis=1)


def run_collapse_init(cell_flat, cell_ok, w: int):
    """Initial labels with horizontal runs pre-merged: label = compact index
    of the run's first cell. Compaction is raster-order-preserving, so a
    run's members occupy consecutive compact indices; a cummax over
    run-start markers labels every member. Cells of one run start identical
    and update identically (their label evolution depends only on the label
    value), so runs stay label-uniform for the whole union-find — measured
    on bench data this removes one hooking round AND makes the E/W neighbor
    columns permanently redundant (benchmarks/probe_uf_variants.py)."""
    M = cell_flat.shape[0]
    prev_flat = jnp.concatenate([jnp.array([-9], jnp.int32), cell_flat[:-1]])
    prev_ok = jnp.concatenate([jnp.zeros((1,), bool), cell_ok[:-1]])
    xcol = jnp.where(cell_flat >= 0, cell_flat % w, 0)
    # prev_ok matters when cell_ok is NOT a compaction prefix (cells masked
    # out post-compaction, e.g. by the polygon filter): an excluded cell
    # must break the run
    cont = (cell_flat == prev_flat + 1) & (xcol > 0) & cell_ok & prev_ok
    idx = jnp.arange(M, dtype=jnp.int32)
    starts = jnp.where(cont, -1, idx)
    L = jax.lax.associative_scan(jnp.maximum, starts)
    return jnp.where(cell_ok, L, idx)


def union_find_labels(nbrs, s: Statics, L0=None):
    """Connected-component labels on the compact cell list.
    Returns L [M] i32: per-cell root compact index (root = min index)."""
    M = nbrs.shape[0]
    if L0 is None:
        L0 = jnp.arange(M, dtype=jnp.int32)

    def compress(L):
        # fixed-trip pointer jumping (no per-hop convergence reductions).
        # 4 hops compress 2^4-deep label chains per round; the outer hooking
        # loop supplies the remaining factor, converging in a handful of
        # rounds overall (hooking-dominated: rounds are identical for 4/6/10
        # hops on bench data, and full log2(M) compression per round is
        # slower end-to-end - benchmarks/probe_uf_variants.py).
        def cbody(_, Lc):
            return jnp.minimum(Lc, Lc[Lc])

        return jax.lax.fori_loop(0, 4, cbody, L)

    def cond(state):
        _, changed, it = state
        return changed & (it < s.ccl_max_iters)

    def body(state):
        L, _, it = state
        Lext = jnp.concatenate([L, jnp.array([M], jnp.int32)])
        nbmin = jnp.min(Lext[nbrs], axis=1)  # [M]; "no neighbor" yields M >= L
        nbmin = jnp.minimum(nbmin, L)
        # hook: scatter-min each cell's best candidate onto its ROOT
        # (writing to the cell itself would merge only 1 step per round)
        L1 = L.at[L].min(nbmin)
        L1 = compress(L1)
        return L1, jnp.any(L1 != L), it + 1

    L, _, _ = jax.lax.while_loop(cond, body, (L0, jnp.bool_(True), jnp.int32(0)))
    return L


def run_level_labels(cell_flat, cell_ok, h: int, w: int, s: Statics):
    """Connected-component labels via a RUN-LEVEL union-find.

    Horizontal runs are the unit of merging: on real skeletons they
    outnumber cells ~10:1 less (bench instance: 36,325 cells -> 3,753 runs
    with 4,404 run-adjacency pairs - benchmarks/probe_runs.py), so every
    union-find round's gather/scatter footprint shrinks from [M,6]+[M]
    to [P]+[R] with R = P = max_skel_cells // 8. Semantics are identical
    to the cell-level path (root = min compact cell index == the
    reference's BFS discovery order, aos_seed_gen_node.cpp:970-1083):
    a component's minimum cell always starts a run (its W neighbor cannot
    be in the mask), run ids are monotone in compact order, so the minimum
    run id's start cell IS the minimum cell.

    Returns (L [M] i32 root compact index per cell, overflow bool). When
    runs or pairs overflow the static buffers the caller must use the
    cell-level path (we return overflow=True and the fast-path labels are
    garbage - the caller wraps both in lax.cond)."""
    M = cell_flat.shape[0]
    # every union-find round costs 2 gathers + 2 scatter-mins on [P] and 4
    # compression gathers on [R]; bench uses 3,753 runs / 4,404 pairs of
    # M//8 = 8192, and overflow falls back to the exact cell-level path
    # static run / pair buffer sizes; dropout-fragmented skeletons have
    # more, shorter runs (MC_REALISM_STATICS raises max_ccl_runs)
    R = s.max_ccl_runs or max(256, s.max_skel_cells // 8)
    P = R

    # run decomposition (compaction preserves raster order, so a run's
    # members are consecutive compact slots); prev_ok breaks runs at cells
    # masked out AFTER compaction (polygon filter)
    prev_flat = jnp.concatenate([jnp.array([-9], jnp.int32), cell_flat[:-1]])
    prev_ok = jnp.concatenate([jnp.zeros((1,), bool), cell_ok[:-1]])
    xcol = jnp.where(cell_flat >= 0, cell_flat % w, 0)
    cont = (cell_flat == prev_flat + 1) & (xcol > 0) & cell_ok & prev_ok
    is_start = cell_ok & ~cont
    nrun = jnp.sum(is_start.astype(jnp.int32))
    rid = jnp.cumsum(is_start.astype(jnp.int32)) - 1        # [M]

    # run id of every grid cell (h*w+1 sentinel row holds -1 = "not a cell")
    tgt = jnp.where(cell_ok, jnp.maximum(cell_flat, 0), h * w + 1)
    rid_plane = (
        jnp.full((h * w + 1,), -1, jnp.int32).at[tgt].set(rid, mode="drop")
    )

    # adjacency pairs from the 3 BACKWARD neighbor columns (NW, N, NE);
    # W/E are intra-run by construction and forward duplicates are
    # symmetric (the hook scatters to both roots)
    safe = jnp.maximum(cell_flat, 0)
    cy = safe // w
    cx = safe % w
    pas, pbs, oks = [], [], []
    for dy, dx in _NEIGH[:3]:
        ny, nx = cy + dy, cx + dx
        inb = cell_ok & (ny >= 0) & (nx >= 0) & (nx < w)
        nflat = jnp.where(inb, ny * w + nx, h * w)
        rnb = rid_plane[nflat]
        oks.append(inb & (rnb >= 0))
        pas.append(rid)
        pbs.append(rnb)
    pa_all = jnp.concatenate(pas)
    pb_all = jnp.concatenate(pbs)
    ok_all = jnp.concatenate(oks)
    npairs = jnp.sum(ok_all.astype(jnp.int32))

    from ..ops import compact_take, compact_true

    sel, _ = compact_true(ok_all, P)
    pa = compact_take(pa_all, sel, R)
    pb = compact_take(pb_all, sel, R)
    pok = sel >= 0

    def body(state):
        Lr, _, it = state
        ca = Lr[jnp.minimum(pa, R - 1)]
        cb = Lr[jnp.minimum(pb, R - 1)]
        m = jnp.minimum(ca, cb)
        Lr1 = Lr.at[jnp.where(pok, ca, R)].min(m, mode="drop")
        Lr1 = Lr1.at[jnp.where(pok, cb, R)].min(m, mode="drop")

        def cbody(_, Lc):
            return jnp.minimum(Lc, Lc[Lc])

        Lr1 = jax.lax.fori_loop(0, 4, cbody, Lr1)
        return Lr1, jnp.any(Lr1 != Lr), it + 1

    def cond(state):
        _, changed, it = state
        return changed & (it < s.ccl_max_iters)

    Lr0 = jnp.arange(R, dtype=jnp.int32)
    Lr, _, _ = jax.lax.while_loop(cond, body, (Lr0, jnp.bool_(True), jnp.int32(0)))

    # root run -> its start's compact index (= the component's min cell)
    stgt = jnp.where(is_start & (rid < R), rid, R)
    run_start_idx = (
        jnp.full((R + 1,), M, jnp.int32)
        .at[stgt]
        .set(jnp.arange(M, dtype=jnp.int32), mode="drop")[:R]
    )
    root_run = Lr[jnp.clip(rid, 0, R - 1)]
    L = jnp.where(cell_ok, run_start_idx[root_run], jnp.arange(M, dtype=jnp.int32))
    overflow = (nrun > R) | (npairs > P)
    return L, overflow


def cluster_grid(skel: GridWorld, poly: Polygon, params: AosParams, s: Statics):
    """clusterOccupiedCells (cpp:970-1083): components of occupied & in-polygon
    cells. Returns padded cluster arrays (grid-unit centers, exact lengths in
    meters, sizes) ordered like the reference, plus the compacted cell list."""
    h, w = skel.occ.shape
    res = jnp.float32(s.resolution)
    M = s.max_skel_cells
    # compact occ & live cells FIRST (hierarchical window compaction), then
    # evaluate point-in-polygon only on the M compacted cells - the
    # full-grid PIP broadcast ([H,W,P]) and the direct 4M-element top_k
    # were both measured multi-ms on v5e (benchmarks/probe_compaction.py)
    from ..ops import compact_true_hier

    mask0 = (skel.occ == 1) & live_mask(skel)
    # kw = M//8 windows of 32 cells: the expansion top_k input (kw*32) is
    # the dominant hier cost; skeleton masks occupy ~2k of 131k windows on
    # the bench instance, so 8k windows keep 4x margin before the (exact,
    # slower) direct-top_k fallback triggers
    cell_flat, _, hier_overflow = compact_true_hier(
        mask0.reshape(-1), M, kw=max(4096, M // 8),
        exact_fallback=s.exact_fallbacks, with_overflow=True,
    )
    in_buf = cell_flat >= 0
    safe0 = jnp.maximum(cell_flat, 0)
    cwx0 = skel.origin_x + (safe0 % w).astype(jnp.float32) * res
    cwy0 = skel.origin_y + (safe0 // w).astype(jnp.float32) * res
    has_poly = poly.count >= 3
    inp = point_in_polygon(cwx0, cwy0, poly)
    cell_ok = in_buf & jnp.where(has_poly, inp, True)
    # inverse map (flat -> compact; M elsewhere), used by the fallback path
    inv_tgt = jnp.where(cell_ok, safe0, h * w + 1)
    inv = (
        jnp.full((h * w + 1,), M, jnp.int32)
        .at[inv_tgt]
        .set(jnp.arange(M, dtype=jnp.int32), mode="drop")
    )
    # fast path: run-level union-find (R = P = max_skel_cells // 8 buffers);
    # exact cell-level fallback when runs/pairs overflow those buffers
    L_fast, uf_overflow = run_level_labels(cell_flat, cell_ok, h, w, s)

    def _cell_level(_):
        nbrs = neighbor_table(cell_flat, cell_ok, inv, h, w)
        # run-collapse init keeps each horizontal run label-uniform, so the
        # W (col 3) and E (col 4) neighbors never contribute a new minimum
        nbrs6 = nbrs[:, jnp.array([0, 1, 2, 5, 6, 7])]
        return union_find_labels(
            nbrs6, s, L0=run_collapse_init(cell_flat, cell_ok, w)
        )

    if s.exact_fallbacks:
        L = jax.lax.cond(uf_overflow, _cell_level, lambda _: L_fast, None)
    else:
        # batched MC path: a vmapped cond would run the cell-level path for
        # every lane every time; overflow is flagged (guard below), not fixed
        L = L_fast

    # cluster ids: rank of root among roots (raster == discovery order)
    is_root = cell_ok & (L == jnp.arange(M))
    rank = jnp.cumsum(is_root.astype(jnp.int32)) - 1
    n_clusters = jnp.sum(is_root.astype(jnp.int32))
    root_rank = jnp.where(is_root, rank, 0)
    cid = jnp.where(cell_ok, root_rank[L], -1)  # [M] in [0..K) or -1

    K = s.max_clusters
    seg = jnp.where((cid >= 0) & (cid < K), cid, K)
    safe = jnp.maximum(cell_flat, 0)
    cell_x = jnp.where(cell_ok, (safe % w).astype(jnp.float32), 0.0)
    cell_y = jnp.where(cell_ok, (safe // w).astype(jnp.float32), 0.0)

    ones = jnp.where(cell_ok, 1.0, 0.0)
    count = jax.ops.segment_sum(ones, seg, num_segments=K + 1)[:K]
    sum_x = jax.ops.segment_sum(cell_x, seg, num_segments=K + 1)[:K]
    sum_y = jax.ops.segment_sum(cell_y, seg, num_segments=K + 1)[:K]
    valid = (jnp.arange(K) < jnp.minimum(n_clusters, K)) & (count > 0)
    center_x = jnp.where(count > 0, sum_x / jnp.maximum(count, 1), 0.0)
    center_y = jnp.where(count > 0, sum_y / jnp.maximum(count, 1), 0.0)

    # exact max pairwise distance per cluster, BANDED: cells sorted (stably)
    # by cluster id are contiguous per cluster, so same-cluster pairs live
    # within +-1 block of each other for clusters <= B cells (a 409 m
    # skeleton row at 0.1 m res; full-pairwise fallback only if B >= M).
    cell_cid = jnp.where(cell_ok, jnp.minimum(seg, K), K)
    from ..config import _round_up

    B = s.cluster_band if s.cluster_band else min(4096, M)
    if B > 512:  # the row-chunk scan below requires B % C == 0 (C = 512)
        B = _round_up(B, 512)
    nblk = (M + B - 1) // B
    Mp = nblk * B
    sorder = jnp.argsort(cell_cid, stable=True)
    sx = jnp.where(cell_ok, cell_x, 1e9)[sorder]
    sy = jnp.where(cell_ok, cell_y, -1e9)[sorder]
    sc = cell_cid[sorder]
    if Mp != M:  # pad to a whole number of blocks (M not a multiple of B)
        sx = jnp.concatenate([sx, jnp.full((Mp - M,), 1e9, jnp.float32)])
        sy = jnp.concatenate([sy, jnp.full((Mp - M,), -1e9, jnp.float32)])
        sc = jnp.concatenate([sc, jnp.full((Mp - M,), K, jnp.int32)])
    sxb = sx.reshape(nblk, B)
    syb = sy.reshape(nblk, B)
    scb = sc.reshape(nblk, B)

    def nb_concat(a, fill):
        left = jnp.concatenate([jnp.full((1, B), fill, a.dtype), a[:-1]], 0)
        right = jnp.concatenate([a[1:], jnp.full((1, B), fill, a.dtype)], 0)
        return jnp.concatenate([left, a, right], axis=1)  # [nblk, 3B]

    tx = nb_concat(sxb, jnp.float32(-1e9))
    ty = nb_concat(syb, jnp.float32(1e9))
    tc = nb_concat(scb, jnp.int32(K))

    # row-chunked pairwise tiles: a full [B, 3B] f32 tile is 50 MB at B=4096,
    # which under a vmapped Monte-Carlo batch multiplies into HBM-crashing
    # transients; [C, 3B] chunks keep the per-orchard transient ~6 MB with
    # bit-identical results (max-of-maxes)
    C = min(512, B)

    def blk(carry, i):
        def chunk(best, j):
            rx = jax.lax.dynamic_slice(sxb[i], (j * C,), (C,))
            ry = jax.lax.dynamic_slice(syb[i], (j * C,), (C,))
            rc = jax.lax.dynamic_slice(scb[i], (j * C,), (C,))
            d2 = (rx[:, None] - tx[i][None, :]) ** 2 + (ry[:, None] - ty[i][None, :]) ** 2
            same = rc[:, None] == tc[i][None, :]
            row_max = jnp.max(jnp.where(same, d2, -1.0), axis=1)
            best = jnp.maximum(best, jax.ops.segment_max(row_max, rc, num_segments=K + 1))
            return best, None

        best, _ = jax.lax.scan(chunk, carry, jnp.arange(B // C))
        return best, None

    best, _ = jax.lax.scan(blk, jnp.full((K + 1,), -1.0), jnp.arange(nblk))
    length = jnp.where(valid, jnp.sqrt(jnp.maximum(best[:K], 0.0)) * res, 0.0)

    # runtime guards for the documented caps (PARITY.md, VERDICT r1 #7):
    # cells beyond max_skel_cells are dropped; clusters wider than the band
    # get under-estimated lengths
    from ..guards import (
        GUARD_CCL_CELL_FALLBACK,
        GUARD_CLUSTER_CAP,
        GUARD_CLUSTER_LEN,
        GUARD_SKEL_OVERFLOW,
    )

    # occ & live cells beyond the compact buffer are dropped (PIP runs
    # post-compaction, so the buffer bound applies to occ & live, not to
    # in-polygon cells - see PARITY.md)
    n_cells_true = jnp.sum(mask0.astype(jnp.int32))
    guards = jnp.where(n_cells_true > M, jnp.int32(GUARD_SKEL_OVERFLOW), 0)
    # window-compaction overflow drops trailing cells on the fast-only path
    guards |= jnp.where(hier_overflow & ~jnp.bool_(s.exact_fallbacks),
                        jnp.int32(GUARD_SKEL_OVERFLOW), 0)
    guards |= jnp.where((B < M) & jnp.any(count > B),
                        jnp.int32(GUARD_CLUSTER_LEN), 0)
    guards |= jnp.where(uf_overflow, jnp.int32(GUARD_CCL_CELL_FALLBACK), 0)
    # components beyond max_clusters are silently dropped from the tour —
    # whole tree rows would vanish with no flag (round-5 review finding on
    # dropout-fragmented giant maps); detect, don't trust
    guards |= jnp.where(n_clusters > K, jnp.int32(GUARD_CLUSTER_CAP), 0)

    return dict(
        guards=guards,
        count=count,
        center_x=center_x,
        center_y=center_y,
        length=length,
        valid=valid,
        n_clusters=n_clusters,
        cell_x=cell_x,
        cell_y=cell_y,
        cell_cid=cell_cid,
        cell_ok=cell_ok,
    )


def rows_from_clusters(
    clusters: dict, skel: GridWorld, poly: Polygon, params: AosParams, s: Statics
) -> TreeRows:
    """Length filter (cpp:1262-1270) + convertClustersToTreeRows
    (cpp:1309-1512). Rows keep the cluster order (NOT sorted); sorting for
    /exploration_tree_rows_info happens in sort_rows()."""
    K = s.max_clusters
    res = jnp.float32(s.resolution)
    center_wx = skel.origin_x + clusters["center_x"] * res
    center_wy = skel.origin_y + clusters["center_y"] * res
    has_poly = poly.count >= 3
    in_poly = point_in_polygon(center_wx, center_wy, poly)
    keep = (
        clusters["valid"]
        & (clusters["length"] >= params.cluster_min_length)
        & jnp.where(has_poly, in_poly, True)
    )

    cwx = skel.origin_x + clusters["cell_x"] * res     # [M]
    cwy = skel.origin_y + clusters["cell_y"] * res
    ccid = clusters["cell_cid"]                        # [M] in [0..K]
    M = cwx.shape[0]
    cidc = jnp.minimum(ccid, K - 1)

    dx = cwx - center_wx[cidc]
    dy = cwy - center_wy[cidc]
    d2 = dx * dx + dy * dy
    d2m = jnp.where(ccid < K, d2, -1.0)

    def seg_argmax(vals, segs, num):
        """argmax per segment, lowest index on ties; M when segment empty."""
        maxv = jax.ops.segment_max(vals, segs, num_segments=num)
        is_max = (vals == maxv[segs]) & (vals > -0.5)
        idxs = jnp.where(is_max, jnp.arange(vals.shape[0]), M)
        arg = jax.ops.segment_min(idxs, segs, num_segments=num)
        return maxv, arg

    segs = jnp.minimum(ccid, K)
    max_d2, arg1 = seg_argmax(d2m, segs, K + 1)
    arg1 = jnp.minimum(arg1[:K], M - 1)
    ep1x, ep1y = cwx[arg1], cwy[arg1]                   # [K]
    n1 = jnp.sqrt(jnp.maximum(max_d2[:K], 1e-30))
    f_dirx = (ep1x - center_wx) / n1
    f_diry = (ep1y - center_wy) / n1

    nrm = jnp.sqrt(jnp.maximum(d2, 1e-30))
    dot = (dx / nrm) * f_dirx[cidc] + (dy / nrm) * f_diry[cidc]
    not_first = jnp.arange(M) != arg1[cidc]
    opp_ok = (dot < 0.0) & not_first & (ccid < K) & (d2 > 0)
    d2_opp = jnp.where(opp_ok, d2, -1.0)
    max_opp, arg2a = seg_argmax(d2_opp, segs, K + 1)
    # fallback: farthest from ep1 (cpp:1388-1399)
    fdx = cwx - ep1x[cidc]
    fdy = cwy - ep1y[cidc]
    fd2 = jnp.where(not_first & (ccid < K), fdx * fdx + fdy * fdy, -1.0)
    _, arg2b = seg_argmax(fd2, segs, K + 1)
    use_fallback = max_opp[:K] <= 0.0
    arg2 = jnp.where(use_fallback, arg2b[:K], arg2a[:K])
    arg2 = jnp.minimum(arg2, M - 1)
    ep2x, ep2y = cwx[arg2], cwy[arg2]

    R = s.max_rows
    kept_rank = jnp.cumsum(keep.astype(jnp.int32)) - 1
    n_rows = jnp.sum(keep.astype(jnp.int32))
    tgt = jnp.where(keep & (kept_rank < R), kept_rank, R)

    def compact(vals, fill=0.0):
        out = jnp.full((R + 1,), fill, vals.dtype)
        return out.at[tgt].set(vals, mode="drop")[:R]

    return TreeRows(
        center=jnp.stack([compact(center_wx), compact(center_wy)], -1),
        ep1=jnp.stack([compact(ep1x), compact(ep1y)], -1),
        ep2=jnp.stack([compact(ep2x), compact(ep2y)], -1),
        length=compact(clusters["length"]),
        valid=jnp.arange(R) < jnp.minimum(n_rows, R),
    )


def sort_rows(rows: TreeRows) -> TreeRows:
    """Sort by center y (x tie-break within 1e-6; cpp:2552-2560)."""
    big = jnp.float32(1e9)
    key_y = jnp.where(rows.valid, rows.center[:, 1], big)
    key_x = jnp.where(rows.valid, rows.center[:, 0], big)
    # the reference comparator treats |dy| < 1e-6 as equal; quantize y
    # RELATIVE to the smallest valid y so y*1e6 stays within f32 integer
    # range (raw y*1e6 loses the 1e-6 tolerance above |y| ~ 17 m)
    ybase = jnp.min(key_y)
    order = jnp.lexsort((key_x, jnp.round((key_y - ybase) * 1e6)))
    return TreeRows(
        center=rows.center[order],
        ep1=rows.ep1[order],
        ep2=rows.ep2[order],
        length=rows.length[order],
        valid=rows.valid[order],
    )
