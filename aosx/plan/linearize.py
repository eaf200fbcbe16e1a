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


def _backtrack_keep(oxy, oseg, ocount, NSEG: int):
    """Keep-mask of the sequential backtracking removal, computed per
    SEGMENT (see the call-site comment for the equivalence argument).
    Carry: (prev2, prev1) = last two kept points, nkept."""
    Q = oxy.shape[0]
    idxq = jnp.arange(Q)
    live = idxq < ocount

    def body(carry, j):
        prev2, prev1, nkept = carry
        in_seg = (oseg == j) & live

        # first in-segment point passing the check against the ENTRY prevs
        d1 = prev1 - prev2
        vals0 = jnp.sum((oxy - prev1[None, :]) * d1[None, :], axis=1)
        c1 = in_seg & ((nkept <= 1) | (vals0 >= -0.01))
        any1 = jnp.any(c1)
        k1 = jnp.argmax(c1)
        p_k1 = oxy[k1]

        # prevs after keeping k1; first later point passing the re-check
        prev2_a = jnp.where(nkept >= 1, prev1, prev2)
        d1a = p_k1 - prev2_a
        vals1 = jnp.sum((oxy - p_k1[None, :]) * d1a[None, :], axis=1)
        c2 = in_seg & (idxq > k1) & ((nkept + 1 <= 1) | (vals1 >= -0.01))
        any2 = jnp.any(c2)
        k2 = jnp.argmax(c2)

        keep_seg = in_seg & any1 & ((idxq == k1) | (any2 & (idxq >= k2)))
        cnt = jnp.sum(keep_seg.astype(jnp.int32))

        last = jnp.max(jnp.where(keep_seg, idxq, -1))
        second = jnp.max(jnp.where(keep_seg & (idxq < last), idxq, -1))
        p_last = oxy[jnp.maximum(last, 0)]
        p_second = oxy[jnp.maximum(second, 0)]
        new_prev1 = jnp.where(cnt >= 1, p_last, prev1)
        new_prev2 = jnp.where(
            cnt >= 2, p_second, jnp.where((cnt == 1) & (nkept >= 1), prev1, prev2)
        )
        return (new_prev2, new_prev1, nkept + cnt), keep_seg

    (_, _, _), keeps = jax.lax.scan(
        body,
        (jnp.zeros(2), jnp.zeros(2), jnp.int32(0)),
        jnp.arange(NSEG, dtype=jnp.int32),
    )
    return jnp.any(keeps, axis=0)


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

    # breakpoint list in index order, capped at NSEG+1. Breakpoint count is
    # provably <= max(max_segments, 4) + 1: the DFS skips once nbp reaches
    # max_segments - 1 interior breakpoints (non-long paths always run with
    # max_segments=4, line 180), plus the forced 0 and end; few-point mode
    # (count <= 4) peaks at 4 bps. One extra slot of slack. The max(.., 4)
    # keeps a Statics with max_segments < 3 from silently truncating the
    # final segment (ADVICE r2).
    NSEG = max(s.max_segments, 4) + 1
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

    # Emitted slots per segment are CONTIGUOUS local indices k (slot 0 =
    # start point, first segment only; 1..n_mid = interior samples with
    # t = k*spacing/dist < 1; n_mid+1 = exact end point while it fits the
    # SEG_CAP window). The previous lowering materialized a [NSEG, SEG_CAP]
    # sample grid and compacted it with 16k-update scatters - under vmap
    # that was most of the batched engine.step cost (~15 of 17 ms at batch
    # 64; benchmarks/probe_rollout_step.py). Closed-form counts + an
    # output-slot -> segment one-hot (offset comparisons) produce the SAME
    # points in the SAME order with zero gathers/scatters. The one-hot
    # reads use masked broadcast-sums, not a matmul: TPU f32 matmuls may
    # decompose to bf16 passes and break bit-exactness.
    #
    # n_mid closed form: is_mid(k) is monotone in k (k*spacing and the
    # divide round monotonically), and only k = num_mid can violate t < 1
    # (t(num_mid-1) <= 1 - spacing/dist, and spacing/dist >= 1/SEG_CAP >>
    # f32 eps), so the prefix length is cand minus at most one.
    cand = jnp.minimum(num_mid, SEG_CAP - 1)
    t_cand = cand.astype(jnp.float32) * spacing / jnp.maximum(dist, 1e-9)
    n_mid = jnp.maximum(cand - (t_cand >= 1.0).astype(jnp.int32), 0)
    has_end = (n_mid + 1) <= SEG_CAP - 1
    k0 = jnp.where(seg_i == 0, 0, 1)
    cnt = jnp.where(
        seg_ok & ~degen,
        n_mid + (seg_i == 0).astype(jnp.int32) + has_end.astype(jnp.int32),
        0,
    )
    # degenerate segment: single point p1 when not skipping start (cpp:200-206)
    cnt = jnp.where(seg_ok & degen, jnp.where(seg_i == 0, 1, 0), cnt)
    off = jnp.cumsum(cnt) - cnt
    total = jnp.sum(cnt)

    qidx = jnp.arange(Q)
    onehot = (qidx[:, None] >= off[None, :]) & (
        qidx[:, None] < (off + cnt)[None, :]
    )                                                              # [Q,NSEG]
    valid_q = jnp.any(onehot, axis=1)

    def pick(v):
        """[NSEG] -> [Q]; exactly one (or zero) nonzero term per slot."""
        return jnp.sum(jnp.where(onehot, v[None, :], jnp.zeros_like(v)[None, :]), axis=1)

    kq_i = qidx - pick(off) + pick(k0)
    t_q = kq_i.astype(jnp.float32) * spacing / jnp.maximum(pick(dist), 1e-9)
    is_end_q = valid_q & (kq_i == pick(n_mid) + 1)
    px_q = jnp.where(is_end_q, pick(p2[:, 0]), pick(p1[:, 0]) + t_q * pick(d[:, 0]))
    py_q = jnp.where(is_end_q, pick(p2[:, 1]), pick(p1[:, 1]) + t_q * pick(d[:, 1]))
    oxy = jnp.where(valid_q[:, None], jnp.stack([px_q, py_q], axis=1), 0.0)
    oyaw = jnp.where(valid_q, pick(yaw), 0.0)
    oseg = jnp.where(valid_q, pick(seg_i).astype(jnp.int32), NSEG)
    ocount = jnp.minimum(total, Q)

    # exact endpoints (cpp:329-333)
    oxy = jnp.where(ocount > 0, oxy.at[0].set(start_pt), oxy)
    oxy = jnp.where(ocount > 0, oxy.at[jnp.maximum(ocount - 1, 0)].set(end_pt), oxy)

    # ---- backtracking removal (cpp:336-369). The reference's sequential
    # point scan (keep c iff nkept<=1 or dot(prev1-prev2, c-prev1) >= -0.01,
    # prevs advance over KEPT points) is O(Q) sequential — and under vmap a
    # lax.cond fast path executes BOTH branches, so batched rollouts paid
    # the full Q-iteration fori_loop every tick (~15 of the 17 ms batched
    # step; benchmarks/probe_rollout_step.py). Segment structure collapses
    # it to an NSEG-iteration scan with identical decisions:
    #   - within one segment the emitted points are collinear and ordered
    #     along +u, so while prevs are FROZEN (during a run of drops) the
    #     dot is linear in the arc position -> the kept set inside a
    #     segment is {first point passing the entry check k1} plus the
    #     suffix from the first post-k1 point passing the re-check k2;
    #   - after TWO consecutive in-segment keeps, d1 and d2 are both
    #     forward along u, so dot = |d1||d2| >= 0 > -0.01 with margin
    #     >> f32 interpolation noise — the remaining points auto-keep.
    # k1/k2 are evaluated on the STORED floats (bit-identical decisions);
    # only the auto-keep tail uses the sign argument, where the 0.01
    # threshold dwarfs any float error. Parity: test_plan.py +
    # test_linearize_backtracking_equivalence.
    keep = _backtrack_keep(oxy, oseg, ocount, NSEG)
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
