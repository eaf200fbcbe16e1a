"""Path linearization (C11; reference: src/aos_path_linearization_node.cpp).

Recursive regression splitting (max 4 segments; 10 when the goal is the
origin), 5 cm interpolation, backtracking-point removal.

TPU mapping: the O(P) per-split regression sums become O(1) via prefix sums
(the reference recomputes sums per candidate split, cpp:50-96+99-125 =
O(P^2) per split); the recursion becomes an explicit DFS stack inside a
while_loop (left segment first, matching the reference's call order and its
breakpoint-count gating).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config import AosParams, Statics
from ..types import Path

SEG_CAP = 1024  # interpolated points cap per segment (51 m at 5 cm)


def _prefix(v):
    return jnp.concatenate([jnp.zeros((1,), jnp.float32), jnp.cumsum(v)])


def _fit_tables(xy, count):
    """Prefix sums enabling O(1) (slope, intercept, mse) for any [s,e]."""
    idx = jnp.arange(xy.shape[0])
    m = idx < count
    x = jnp.where(m, xy[:, 0], 0.0)
    y = jnp.where(m, xy[:, 1], 0.0)
    return dict(
        sx=_prefix(x),
        sy=_prefix(y),
        sxy=_prefix(x * y),
        sxx=_prefix(x * x),
        syy=_prefix(y * y),
    )


def _linreg(tab, s_, e_):
    """y = a x + b over inclusive [s,e] (cpp:50-96). Returns (a, b, mse)."""
    n = (e_ - s_ + 1).astype(jnp.float32)
    seg = lambda p: p[e_ + 1] - p[s_]
    sx, sy = seg(tab["sx"]), seg(tab["sy"])
    sxy, sxx, syy = seg(tab["sxy"]), seg(tab["sxx"]), seg(tab["syy"])
    den = n * sxx - sx * sx
    degenerate = jnp.abs(den) < 1e-9
    a = jnp.where(degenerate, 0.0, (n * sxy - sx * sy) / jnp.where(degenerate, 1.0, den))
    b = jnp.where(degenerate, sy / jnp.maximum(n, 1.0), (sy - a * sx) / jnp.maximum(n, 1.0))
    err = (syy - 2 * a * sxy - 2 * b * sy + a * a * sxx + 2 * a * b * sx + n * b * b) / jnp.maximum(n, 1.0)
    short = (e_ <= s_) | (e_ - s_ < 2)
    return (
        jnp.where(short, 0.0, a),
        jnp.where(short, 0.0, b),
        jnp.where(short, 0.0, jnp.maximum(err, 0.0)),
    )


def _best_split(tab, s_, e_, P):
    """findBestSplitPoint (cpp:99-125): argmin over sp in (s,e) of the
    count-weighted mean of the two segment MSEs."""
    sp = jnp.arange(P)
    a1, b1, e1 = _linreg(tab, jnp.full((P,), 1, jnp.int32) * s_, sp)
    a2, b2, e2 = _linreg(tab, sp, jnp.full((P,), 1, jnp.int32) * e_)
    n1 = (sp - s_ + 1).astype(jnp.float32)
    n2 = (e_ - sp + 1).astype(jnp.float32)
    tot = (e1 * n1 + e2 * n2) / jnp.maximum(n1 + n2, 1.0)
    ok = (sp > s_) & (sp < e_)
    tot = jnp.where(ok, tot, jnp.float32(3.4e38))
    best = jnp.argmin(tot).astype(jnp.int32)
    return jnp.where(e_ <= s_ + 1, e_, best)


def _find_breakpoints(xy, count, max_segments, params, P):
    """splitPathRecursive (cpp:128-177) as an explicit DFS stack (left first).
    Returns bp_mask [P] (breakpoint indices, excluding the forced 0/end)."""
    tab = _fit_tables(xy, count)
    idxs = jnp.arange(P)
    STK = 2 * 16  # generous: depth <= 2 * max_segments

    def cond(st):
        bp_mask, stack_s, stack_e, sp_, nbp = st
        return sp_ > 0

    def body(st):
        bp_mask, stack_s, stack_e, sp_, nbp = st
        sp_ = sp_ - 1
        s_ = stack_s[sp_]
        e_ = stack_e[sp_]
        a, b, _ = _linreg(tab, s_, e_)
        interior = (idxs > s_) & (idxs < e_) & (idxs < count)
        dev = jnp.abs(xy[:, 1] - (a * xy[:, 0] + b))
        max_dev = jnp.max(jnp.where(interior, dev, -1.0))
        skip = (e_ <= s_) | (max_dev < params.linearize_max_dev) | (nbp >= max_segments - 1)
        split = _best_split(tab, s_, e_, P)
        is_new = ~bp_mask[split] & ~skip
        bp_mask = bp_mask.at[split].set(bp_mask[split] | ~skip)
        nbp = nbp + is_new.astype(jnp.int32)
        recurse = ~skip & (nbp < max_segments - 1)
        # push right then left (left popped first)
        stack_s = jnp.where(recurse, stack_s.at[sp_].set(split), stack_s)
        stack_e = jnp.where(recurse, stack_e.at[sp_].set(e_), stack_e)
        stack_s = jnp.where(recurse, stack_s.at[sp_ + 1].set(s_), stack_s)
        stack_e = jnp.where(recurse, stack_e.at[sp_ + 1].set(split), stack_e)
        sp_ = jnp.where(recurse, sp_ + 2, sp_)
        return bp_mask, stack_s, stack_e, sp_, nbp

    bp0 = jnp.zeros((P,), bool)
    ss = jnp.zeros((STK,), jnp.int32).at[0].set(0)
    se = jnp.zeros((STK,), jnp.int32).at[0].set(count - 1)
    bp_mask, _, _, _, _ = jax.lax.while_loop(
        cond, body, (bp0, ss, se, jnp.int32(1), jnp.int32(0))
    )
    return bp_mask


def linearize(path: Path, params: AosParams, s: Statics) -> Path:
    """convertToLinearSegments (cpp:248-370) + 1 Hz republish semantics are
    the caller's concern. Input path of n points:
      n <= 1: passthrough; n == 2: single interpolated segment;
      3 <= n <= 4: consecutive-point interpolation; else regression split."""
    P = s.max_path
    Q = s.max_plan
    xy, count = path.xy, path.count
    end_pt = xy[jnp.maximum(count - 1, 0)]
    start_pt = xy[0]
    is_long = (jnp.abs(end_pt[0]) < 1e-6) & (jnp.abs(end_pt[1]) < 1e-6)
    max_segments = jnp.where(is_long, s.max_segments, 4)

    bp_mask = _find_breakpoints(xy, count, max_segments, params, P)
    # <= 4 points: every interior point is a breakpoint (consecutive interp)
    few = count <= 4
    idxs = jnp.arange(P)
    interior_all = (idxs > 0) & (idxs < count - 1)
    bp_mask = jnp.where(few, interior_all, bp_mask)
    # force 0 and end
    bp_mask = bp_mask & (idxs > 0) & (idxs < count - 1)
    bp_mask = bp_mask.at[0].set(count > 0)
    bp_mask = bp_mask | (idxs == count - 1)
    bp_mask = bp_mask & (idxs < count)

    # breakpoint list in index order, capped at NSEG+1
    NSEG = s.max_segments + 6  # few-point mode can have more joints than segs
    MAXBP = NSEG + 1
    rank = jnp.cumsum(bp_mask.astype(jnp.int32)) - 1
    tgt = jnp.where(bp_mask & (rank < MAXBP), rank, MAXBP)
    bps = jnp.full((MAXBP + 1,), -1, jnp.int32).at[tgt].set(idxs, mode="drop")[:MAXBP]
    nbp = jnp.minimum(jnp.sum(bp_mask.astype(jnp.int32)), MAXBP)

    # few-point mode may exceed MAXBP interior joints; fall back to capping
    # (paths with <= 4 points always fit: 2 + 2 interior)

    # ---- interpolate segments at 5 cm (cpp:190-245) -----------------------
    spacing = params.linearize_spacing
    seg_i = jnp.arange(NSEG)
    s_idx = bps[jnp.clip(seg_i, 0, MAXBP - 1)]
    e_idx = bps[jnp.clip(seg_i + 1, 0, MAXBP - 1)]
    seg_ok = (seg_i < nbp - 1) & (s_idx >= 0) & (e_idx >= 0)
    p1 = xy[jnp.maximum(s_idx, 0)]
    p2 = xy[jnp.maximum(e_idx, 0)]
    d = p2 - p1
    dist = jnp.sqrt(jnp.sum(d * d, axis=1))
    yaw = jnp.arctan2(d[:, 1], d[:, 0])
    degen = dist < 1e-6
    num_mid = jnp.floor(dist / spacing).astype(jnp.int32)

    k = jnp.arange(SEG_CAP, dtype=jnp.float32)[None, :]            # [1,T]
    t = k * spacing / jnp.maximum(dist[:, None], 1e-9)
    # slot 0 = start point (only for the first segment), slots 1..num = mids,
    # slot num+1 = end point
    is_start = (k == 0)
    is_mid = (k >= 1) & (k <= num_mid[:, None].astype(jnp.float32)) & (t < 1.0)
    # end slot index = (number of emitted mids) + 1
    n_mid = jnp.sum(is_mid, axis=1).astype(jnp.int32)               # [NSEG]
    is_end = jnp.arange(SEG_CAP)[None, :] == (n_mid[:, None] + 1)
    px = jnp.where(is_end, p2[:, 0:1], p1[:, 0:1] + t * d[:, 0:1])
    py = jnp.where(is_end, p2[:, 1:2], p1[:, 1:2] + t * d[:, 1:2])
    emit_start = is_start & (seg_i == 0)[:, None]
    emit = (emit_start | is_mid | is_end) & seg_ok[:, None] & ~degen[:, None]
    # degenerate segment: single point p1 when not skipping start (cpp:200-206)
    emit_degen = is_start & (seg_i == 0)[:, None] & degen[:, None] & seg_ok[:, None]
    px = jnp.where(emit_degen, p1[:, 0:1], px)
    py = jnp.where(emit_degen, p1[:, 1:2], py)
    emit = emit | emit_degen

    flat_xy = jnp.stack([px.reshape(-1), py.reshape(-1)], axis=1)
    flat_yaw = jnp.broadcast_to(yaw[:, None], (NSEG, SEG_CAP)).reshape(-1)
    flat_ok = emit.reshape(-1)
    rank2 = jnp.cumsum(flat_ok.astype(jnp.int32)) - 1
    tgt2 = jnp.where(flat_ok & (rank2 < Q), rank2, Q)
    oxy = jnp.zeros((Q + 1, 2), jnp.float32).at[tgt2].set(flat_xy, mode="drop")[:Q]
    oyaw = jnp.zeros((Q + 1,), jnp.float32).at[tgt2].set(flat_yaw, mode="drop")[:Q]
    ocount = jnp.minimum(jnp.sum(flat_ok.astype(jnp.int32)), Q)

    # exact endpoints (cpp:329-333)
    oxy = jnp.where(ocount > 0, oxy.at[0].set(start_pt), oxy)
    oxy = jnp.where(ocount > 0, oxy.at[jnp.maximum(ocount - 1, 0)].set(end_pt), oxy)

    # ---- backtracking removal (cpp:336-369): sequential scan. Fast path:
    # interpolated points within a segment are collinear, so reversals can
    # only exist at segment joints; when the vectorized triple check finds
    # none, the whole path is kept and the sequential scan is skipped.
    prev_pt = jnp.roll(oxy, 1, axis=0)
    next_pt = jnp.roll(oxy, -1, axis=0)
    idxq = jnp.arange(Q)
    triple_ok = (idxq >= 1) & (idxq < ocount - 1)
    rev = triple_ok & (
        jnp.sum((oxy - prev_pt) * (next_pt - oxy), axis=1) < -0.01
    )
    any_reversal = jnp.any(rev)

    def seq_scan(oxy):
        def body(i, st):
            keep, prev2, prev1, nkept = st
            c = oxy[i]
            d1 = prev1 - prev2
            d2 = c - prev1
            back = (nkept > 1) & (jnp.sum(d1 * d2) < -0.01)
            k = (i < ocount) & ~back
            keep = keep.at[i].set(k)
            prev2 = jnp.where(k & (nkept >= 1), prev1, prev2)
            prev1 = jnp.where(k, c, prev1)
            nkept = nkept + k.astype(jnp.int32)
            return keep, prev2, prev1, nkept

        keep, _, _, _ = jax.lax.fori_loop(
            0, Q, body, (jnp.zeros((Q,), bool), jnp.zeros(2), jnp.zeros(2), jnp.int32(0))
        )
        return keep

    keep = jax.lax.cond(
        any_reversal, seq_scan, lambda o: jnp.arange(Q) < ocount, oxy
    )
    skip_removal = ocount <= 2
    keep = jnp.where(skip_removal, jnp.arange(Q) < ocount, keep)
    rank3 = jnp.cumsum(keep.astype(jnp.int32)) - 1
    tgt3 = jnp.where(keep & (rank3 < Q), rank3, Q)
    fxy = jnp.zeros((Q + 1, 2), jnp.float32).at[tgt3].set(oxy, mode="drop")[:Q]
    fyaw = jnp.zeros((Q + 1,), jnp.float32).at[tgt3].set(oyaw, mode="drop")[:Q]
    fcount = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), Q)
    fxy = jnp.where(fcount > 0, fxy.at[jnp.maximum(fcount - 1, 0)].set(end_pt), fxy)

    # passthrough for 0/1-point paths
    tiny = count <= 1
    out_xy = jnp.where(tiny, jnp.zeros_like(fxy).at[0].set(start_pt), fxy)
    out_yaw = jnp.where(tiny, jnp.zeros_like(fyaw), fyaw)
    out_count = jnp.where(tiny, count, fcount)
    return Path(xy=out_xy, yaw=out_yaw, count=out_count)
