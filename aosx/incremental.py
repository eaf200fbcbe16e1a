"""Exact incremental map update (the round-3 structural reformulation).

The reference recomputes the ENTIRE perceive -> GVD -> plan world from
scratch on every map callback (aos_gvd_node.cpp:152-177 re-runs processGraph
on any input change; aos_seed_gen_node.cpp:230-248 re-runs the full
perception chain per /lio_sam/mapping/global_map message) even though a
growing SLAM map is append-only and mostly re-observes the same trees.

This module exploits three exact structural facts:

1. ROR neighbor counts are MONOTONE under append-only deltas:
     cnt_f[i] = cnt_{f-1}[i] + |{j in delta : d(i,j) <= r}|
   so one O(N*D) cross pass replaces the O(N^2) pass (points.ror_counts),
   and the keep mask can only gain points (cnt only grows, the static
   clip/exclusion filters are per-point).
2. Disc dilation distributes over union, and the raw scatter grid is cheap
   (O(N) scatter), so the inflated plane is recomputed exactly in ~1 ms.
3. Everything downstream of the skeleton - clustering, rows, seeds, GVD
   graph, cost matrix, waypoints, trim plane - is a pure function of
   (skeleton, polygon, params). Equality gates therefore give EXACT reuse:
     inflated unchanged  -> reuse the whole previous World   (level 0)
     skeleton unchanged  -> reuse rows/seeds/graph/costmat/wp (level 1)
     else                -> recompute downstream              (level 2)
   plus a from-scratch fallback (level 3) when the append-only contract is
   violated (points removed or moved - e.g. a SLAM loop-closure
   re-optimization) or the delta exceeds max_delta_points.

All four levels produce BIT-IDENTICAL results to the from-scratch
prepare_world_full (tests/test_incremental.py pins this): the gates compare
full planes for equality, and the delta ROR computes the same f32 d2 values
as points.ror_counts(method='exact') pairwise ((a-b)^2 == (b-a)^2 in IEEE,
same last-axis reduction order), so every count, mask and grid matches
exactly. There are no approximations to guard.

Contract (mirrors an index-stable SLAM feed): across updates the caller
keeps poly/params/exclusions fixed, and previously-valid buffer slots keep
their coordinates; new points appear in previously-invalid slots. Violations
of EITHER part are DETECTED in-jit and handled by the exact fallback, so the
contract is about speed, not correctness: the carried state stores the
(poly, params, exclusions) it was built with, and any leaf-wise difference
(e.g. an operator adding an exclusion disc mid-survey, a changed clipping
bound) forces the from-scratch branch even when the point delta is empty —
a stale world can never be returned as a reuse level.

ror_method note: the delta cross pass is always exact, so with
ror_method="sorted" an incremental frame equals a from-scratch SORTED pass
only while the sorted sweep's span precondition holds on the new set (the
usual case; when it would fire GUARD_ROR_SPAN, from-scratch is the
approximate side and the incremental counts are strictly better). The
parity tests pin ror_method="exact", where the equivalence is unconditional.

Everything runs inside one jit; the gates are lax.cond, which on the
single-instance replay path executes only the taken branch. Do NOT vmap
perceive_update (a vmapped cond executes both branches - CLAUDE.md); the
Monte-Carlo batch path builds static worlds once and does not need it.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .config import AosParams, Statics
from .geom import active_bounds
from .perceive import points as _points
from .perceive import raster as _raster
from .perceive import skeleton as _skeleton
from .types import PointCloud, Polygon


def _dc(cls):
    return jax.tree_util.register_dataclass(dataclasses.dataclass(frozen=True)(cls))


@_dc
class IncrementalState:
    """Carried across map frames. xyz/valid are the raw point buffer as last
    seen (valid is post-isfinite - the set the stored ROR counts cover);
    cnt/keep are the preprocessing intermediates the delta pass updates;
    inflated is the pre-border dilated grid (the level-0 gate plane)."""

    xyz: Any        # [N,3] f32
    valid: Any      # [N] bool (post-isfinite)
    cnt: Any        # [N] i32 ROR neighbor counts (meaningful where valid)
    keep: Any       # [N] bool final preprocess keep mask
    inflated: Any   # GridWorld (dilated, pre-borders)
    cfg: Any        # (poly, params, exclusions) this state was built with;
    # perceive_update compares leaf-wise and forces the from-scratch branch
    # on ANY difference (the downstream world is a function of all three, so
    # reuse would otherwise return a stale world on a config change)
    pre_guards: Any  # i32 PREPROCESS-era guard bits only (GUARD_ROR_SPAN);
    # kept separate so a level-2 downstream recompute reseeds cluster/graph
    # guards from scratch instead of accumulating stale bits from earlier
    # frames (out.guards == pre_guards | clusters; world.guards adds graph)
    out: Any        # PerceiveOut
    world: Any      # engine.World


# update levels (returned for observability / tests / metrics)
LEVEL_REUSE_WORLD = 0    # inflated plane unchanged: full exact reuse
LEVEL_REUSE_DOWNSTREAM = 1  # skeleton unchanged: graph/plan reuse
LEVEL_DOWNSTREAM = 2     # skeleton changed: recompute clusters..waypoints
LEVEL_FULL = 3           # contract violated / delta overflow: from scratch


def _downstream(skel, inflated, poly, params: AosParams, s: Statics,
                pre_guards, stencil_mesh=None, stencil_axis: str = "space"):
    """The perceive tail + world assembly, by construction identical to
    perceive.pipeline.perceive composed with engine.prepare_world_full
    (both call the same shared helpers)."""
    from .engine import world_from_perceive
    from .perceive.pipeline import perceive_tail

    occupancy = _raster.mark_borders(inflated)
    out = perceive_tail(skel, occupancy, poly, params, s, pre_guards)
    return out, world_from_perceive(out, params, s, stencil_mesh=stencil_mesh,
                                    stencil_axis=stencil_axis)


def _inflate(grid, s: Statics, stencil_mesh, stencil_axis):
    if stencil_mesh is None:
        return _raster.inflate(grid, s)
    from .parallel.spatial import inflate_sharded

    return inflate_sharded(grid, s, stencil_mesh, stencil_axis)


def _skeletonize(inflated, s: Statics, stencil_mesh, stencil_axis):
    if stencil_mesh is None:
        return _skeleton.skeletonize(inflated, s)
    from .parallel.spatial import skeletonize_sharded

    return skeletonize_sharded(inflated, s, stencil_mesh, stencil_axis)


def perceive_init(pc: PointCloud, poly: Polygon, params: AosParams,
                  exclusions, s: Statics, *,
                  ror_method: str = "exact",
                  stencil_mesh=None,
                  stencil_axis: str = "space") -> IncrementalState:
    """Full from-scratch pass, keeping the incremental intermediates.
    stencil_mesh: optional Mesh - row-shard the grid stencils + JFA across
    chips (parallel/spatial.py), bit-identical to single-device; the
    equality gates then compare identical planes, so reuse levels are
    unchanged (tests/test_parallel.py::test_incremental_sharded_stencils)."""
    xy, keep, cnt, valid, bounds, guards = _points.preprocess_full(
        pc, poly, params, exclusions, s, ror_method=ror_method)
    grid = _raster.generate_grid(xy, keep, bounds, s)
    inflated = _inflate(grid, s, stencil_mesh, stencil_axis)
    skel = _skeletonize(inflated, s, stencil_mesh, stencil_axis)
    out, world = _downstream(skel, inflated, poly, params, s, guards,
                             stencil_mesh, stencil_axis)
    return IncrementalState(
        xyz=pc.xyz, valid=valid, cnt=cnt, keep=keep,
        inflated=inflated, cfg=_canon_cfg(poly, params, exclusions),
        pre_guards=guards, out=out, world=world,
    )


def _canon_cfg(poly, params, exclusions):
    """The carried-config tuple, leaves canonicalized to STRONG dtypes (the
    serving._canon trick: astype(own dtype) drops weakness, XLA elides the
    copy). Both the stored and the incoming side pass through this, so the
    lax.cond branches below always unify (a raw-Python-float AosParams would
    otherwise carry weak f32 leaves that mismatch the carried strong ones)."""
    def _strong(x):
        a = jnp.asarray(x)
        return a.astype(a.dtype)

    return jax.tree_util.tree_map(_strong, (poly, params, exclusions))


def _cfg_same(cfg_old, cfg_new):
    """Every leaf of the carried config equals the incoming one.

    Returns the Python literal False on a STATIC mismatch (different pytree
    structure / shapes / dtypes, e.g. a different exclusion-buffer size) —
    the caller must then take the from-scratch path OUTSIDE lax.cond,
    because the two states' structures cannot unify as cond outputs.
    Otherwise returns the traced scalar of leaf-wise equality."""
    old_l, old_t = jax.tree_util.tree_flatten(cfg_old)
    new_l, new_t = jax.tree_util.tree_flatten(cfg_new)
    if old_t != new_t:
        return False
    if any(a.shape != b.shape or a.dtype != b.dtype
           for a, b in zip(old_l, new_l)):
        return False
    same = jnp.bool_(True)
    for a, b in zip(old_l, new_l):
        same &= jnp.all(a == b)
    return same


def _cross_counts(all_pts, all_valid, dpts, dvalid, dcount, r2,
                  block: int = 512, dchunk: int = 1024):
    """Counts of within-radius pairs between the delta set and the full set.

    Returns (cnt_delta [D]: per delta point, matches against ALL valid
    points incl. itself; contrib [N]: per full-buffer point, matches against
    valid delta points). d2 is the same f32 elementwise formula as
    points.ror_counts(method='exact'), so the <= r2 decisions are identical.

    Cost scales with the ACTUAL delta: the outer while_loop visits only
    ceil(dcount/dchunk) delta chunks (a frame with few new points pays for
    one chunk, not all D slots). Invalid rows inside a visited chunk are
    masked; rows in unvisited chunks keep count 0, exactly what the masked
    full pass produced for them. All accumulations are integer, so chunk
    order cannot change any value. Single-instance path only - do NOT vmap
    (module docstring)."""
    N = all_pts.shape[0]
    D = dpts.shape[0]
    block = min(block, N)
    nblk = N // block
    assert nblk * block == N, "max_points must be a multiple of the block"
    dchunk = min(dchunk, D)
    assert D % dchunk == 0, "max_delta_points must be a multiple of dchunk"
    nchunks = (dcount + dchunk - 1) // dchunk

    def chunk_body(state):
        c, cnt_d, contrib = state
        rows = jax.lax.dynamic_slice(dpts, (c * dchunk, 0), (dchunk, 3))
        rmask = jax.lax.dynamic_slice(dvalid, (c * dchunk,), (dchunk,))

        def body(cnt_c, j):
            cols = jax.lax.dynamic_slice(all_pts, (j * block, 0), (block, 3))
            cval = jax.lax.dynamic_slice(all_valid, (j * block,), (block,))
            diff = rows[:, None, :] - cols[None, :, :]
            d2 = jnp.sum(diff * diff, axis=-1)      # [dchunk, block]
            hit = (d2 <= r2) & rmask[:, None] & cval[None, :]
            return (cnt_c + jnp.sum(hit, axis=1),
                    jnp.sum(hit.astype(jnp.int32), axis=0))

        cnt_chunk, contrib_blocks = jax.lax.scan(
            body, jnp.zeros((dchunk,), jnp.int32), jnp.arange(nblk))
        cnt_d = jax.lax.dynamic_update_slice(cnt_d, cnt_chunk, (c * dchunk,))
        return c + 1, cnt_d, contrib + contrib_blocks.reshape(-1)

    _, cnt_delta, contrib = jax.lax.while_loop(
        lambda st: st[0] < nchunks, chunk_body,
        (jnp.int32(0), jnp.zeros((D,), jnp.int32),
         jnp.zeros((N,), jnp.int32)))
    return cnt_delta, contrib


def perceive_update(st: IncrementalState, pc: PointCloud, poly: Polygon,
                    params: AosParams, exclusions, s: Statics, *,
                    ror_method: str = "exact",
                    stencil_mesh=None, stencil_axis: str = "space"):
    """One incremental map frame. Returns (new state, level i32).

    pc is the FULL current snapshot (index-stable buffer, see module
    docstring); the delta is recovered by mask diff against the carried
    state. Results are bit-identical to perceive_init on the same frame at
    every level."""
    N = st.xyz.shape[0]
    D = s.max_delta_points
    xyz_new = pc.xyz
    valid_new = pc.valid & jnp.all(jnp.isfinite(xyz_new), axis=1)

    removed = jnp.any(st.valid & ~valid_new)
    moved = jnp.any(st.valid[:, None] & (xyz_new != st.xyz))
    delta_mask = valid_new & ~st.valid
    dcount = jnp.sum(delta_mask.astype(jnp.int32))
    # the whole downstream world is a function of (poly, params, exclusions):
    # any config change invalidates every reuse level, even with no new points
    cfg_same = _cfg_same(st.cfg, _canon_cfg(poly, params, exclusions))
    if cfg_same is False:
        # static structure/shape change: the rebuilt state's pytree differs,
        # so it cannot be a lax.cond branch output - recompute unconditionally
        return (perceive_init(pc, poly, params, exclusions, s,
                              ror_method=ror_method,
                              stencil_mesh=stencil_mesh,
                              stencil_axis=stencil_axis),
                jnp.int32(LEVEL_FULL))
    needs_full = removed | moved | (dcount > D) | ~cfg_same

    def full_branch(st):
        return perceive_init(pc, poly, params, exclusions, s,
                             ror_method=ror_method, stencil_mesh=stencil_mesh,
                             stencil_axis=stencil_axis), jnp.int32(LEVEL_FULL)

    def empty_branch(st):
        # no additions, nothing removed or moved: the carried state IS the
        # exact result for this frame (keep/grid/world are pure functions of
        # unchanged inputs; xyz at invalid slots is never read)
        return st, jnp.int32(LEVEL_REUSE_WORLD)

    def delta_branch(st):
        # compact the delta into [D] slots (overflow went to full_branch)
        pos = jnp.cumsum(delta_mask.astype(jnp.int32)) - 1
        slot = jnp.where(delta_mask & (pos < D), pos, D)
        dpts = jnp.zeros((D, 3), jnp.float32).at[slot].set(xyz_new, mode="drop")
        dpos = jnp.full((D,), N, jnp.int32).at[slot].set(
            jnp.arange(N, dtype=jnp.int32), mode="drop")
        dvalid = jnp.arange(D) < dcount

        r2 = jnp.asarray(params.ror_radius, jnp.float32) ** 2
        cnt_delta, contrib = _cross_counts(
            xyz_new, valid_new, dpts, dvalid, dcount, r2)
        # old points gain the delta neighbors; delta points get their full
        # count (cnt_delta includes self at d2=0 -> minus 1)
        cnt = st.cnt + contrib
        cnt = cnt.at[dpos].set(cnt_delta - 1, mode="drop")

        bounds = active_bounds(
            poly,
            (params.clipping_minx, params.clipping_maxx,
             params.clipping_miny, params.clipping_maxy),
            params.polygon_margin,
        )
        keep = valid_new & (cnt >= params.ror_min_neighbors)
        keep &= _points.static_keep_mask(xyz_new, params, exclusions, bounds)

        grid = _raster.generate_grid(xyz_new[:, :2], keep, bounds, s)
        inflated = _inflate(grid, s, stencil_mesh, stencil_axis)
        changed = jnp.any(inflated.occ != st.inflated.occ)

        carried = IncrementalState(
            xyz=xyz_new, valid=valid_new, cnt=cnt, keep=keep,
            inflated=inflated, cfg=st.cfg,  # == incoming (gated above)
            pre_guards=st.pre_guards, out=st.out, world=st.world,
        )

        def unchanged_branch(c):
            return c, jnp.int32(LEVEL_REUSE_WORLD)

        def changed_branch(c):
            skel = _skeletonize(inflated, s, stencil_mesh, stencil_axis)
            skel_same = jnp.all(skel.occ == c.out.skeleton.occ)

            def reuse_down(c):
                # skeleton identical: graph/plan unchanged, but the inflated
                # occupancy plane DID change -> refresh it everywhere it rides
                occupancy = _raster.mark_borders(inflated)
                out = dataclasses.replace(c.out, occupancy=occupancy)
                world = dataclasses.replace(c.world, occupancy=occupancy)
                return (
                    dataclasses.replace(c, out=out, world=world),
                    jnp.int32(LEVEL_REUSE_DOWNSTREAM),
                )

            def recompute_down(c):
                # seed with the preprocess-era bits ONLY (the delta pass is
                # exact and adds none): c.out.guards would also carry the
                # PREVIOUS skeleton's cluster-stage bits, which a fresh
                # from-scratch pass on this frame would not set
                out, world = _downstream(skel, inflated, poly, params, s,
                                         c.pre_guards, stencil_mesh,
                                         stencil_axis)
                return (
                    dataclasses.replace(c, out=out, world=world),
                    jnp.int32(LEVEL_DOWNSTREAM),
                )

            return jax.lax.cond(skel_same, reuse_down, recompute_down, c)

        return jax.lax.cond(changed, changed_branch, unchanged_branch, carried)

    def incr_branch(st):
        return jax.lax.cond(dcount == 0, empty_branch, delta_branch, st)

    return jax.lax.cond(needs_full, full_branch, incr_branch, st)


def replay_episode_incremental(
    pc_frames: PointCloud,  # stacked [F, ...] snapshots (growing SLAM map)
    poly: Polygon,
    params: AosParams,
    exclusions,
    s: Statics,
    steps_per_frame: int,
    *,
    ror_method: str = "exact",
    return_inc: bool = False,
):
    """Drop-in replacement for engine.replay_episode that reuses unchanged
    work across frames. Same mission semantics (target restoration across
    rebuilds, aos_path_gen_node.cpp:456-560); per-frame metrics additionally
    carry `inc_level`, the update level taken ([F] i32). return_inc=True
    additionally returns the final IncrementalState, whose .world/.out are
    the last frame's (saves consumers a duplicate from-scratch pass)."""
    from .engine import EngineState, initial_state, step
    from .plan.mission import rebuild_waypoints

    inc0 = perceive_init(
        jax.tree_util.tree_map(lambda x: x[0], pc_frames), poly, params,
        exclusions, s, ror_method=ror_method)
    st0 = initial_state(inc0.world, s)

    def frame_body(carry, pc_f):
        inc, st = carry
        inc, level = perceive_update(inc, pc_f, poly, params, exclusions, s,
                                     ror_method=ror_method)
        mission, wp = rebuild_waypoints(st.mission, st.wp, inc.world.graph,
                                        params, s)
        st = EngineState(
            robot=st.robot, mission=mission, control=st.control, wp=wp,
            plan=st.plan, raw_path=st.raw_path, last_mod=st.last_mod, t=st.t,
        )

        def tick(st, _):
            return step(st, inc.world, params, s)

        st, metrics = jax.lax.scan(tick, st, None, length=steps_per_frame)
        metrics["inc_level"] = level
        return (inc, st), metrics

    (inc, st), metrics = jax.lax.scan(frame_body, (inc0, st0), pc_frames)
    return (st, metrics, inc) if return_inc else (st, metrics)


def serve_frames(
    sv,  # serving.ServeState
    pc_frames: PointCloud,  # stacked [F, ...] snapshots
    poly: Polygon,
    params: AosParams,
    exclusions,
    s: Statics,
    steps_per_frame: int,
    *,
    ror_method: str = "exact",
):
    """One jitted lax.scan of the production serving loop from an existing
    ServeState: per frame, serving.serve_map_frame runs the incremental
    world gates (+ plan-cache rebuild only on level >= 2), then
    steps_per_frame plan-cached control ticks. Returns (ServeState, metrics)
    with metrics["inc_level"] = [F] reuse levels. This is the scan body
    shared by replay_episode_incremental_cached (which prepends serve_init)
    and benchmarks/bench_steady.py (which times the steady-state loop alone).

    Single-instance only (inherits perceive_update's lax.cond structure —
    do NOT vmap; the module docstring's vmapped-cond rule)."""
    from . import serving
    from .plan import plancache

    def frame_body(sv, pc_f):
        sv, level = serving.serve_map_frame(sv, pc_f, poly, params,
                                            exclusions, s,
                                            ror_method=ror_method)

        def tick(st, _):
            return plancache.step_cached(st, sv.lite, sv.cache, params, s)

        st, metrics = jax.lax.scan(tick, sv.st, None,
                                   length=steps_per_frame)
        metrics["inc_level"] = level
        return serving.ServeState(inc=sv.inc, cache=sv.cache, st=st,
                                  lite=sv.lite), metrics

    return jax.lax.scan(frame_body, sv, pc_frames)


def replay_episode_incremental_cached(
    pc_frames: PointCloud,
    poly: Polygon,
    params: AosParams,
    exclusions,
    s: Statics,
    steps_per_frame: int,
    *,
    ror_method: str = "exact",
    return_inc: bool = False,
):
    """replay_episode_incremental with replan-free control ticks: the full
    production serving loop. Per frame, the incremental gates prove world
    reuse (levels 0/1); the plan cache (plan/plancache.py) then makes every
    control tick a row select instead of an A* + linearization. The cache is
    rebuilt only when the graph actually changed (level >= 2), with the
    currently published plan preserved exactly across the rebuild via the
    carry row (keep-last-path, engine.py:193-199; the reference equally
    keeps publishing the last path until the next successful replan,
    aos_path_gen_node.cpp:1036-1043). Steady-state frame cost is therefore
    the level-0 gate (~1.3 ms device) + ticks at microseconds each, while
    every metric stays bit-identical to replay_episode_incremental /
    engine.replay_episode (tests/test_incremental.py).

    This replay is the lax.scan composition of the live streaming API
    (serving.serve_init / serve_map_frame / step_cached) over a recorded
    sequence — one code path, so these parity pins also cover serving.

    Single-instance only (inherits perceive_update's lax.cond structure —
    do NOT vmap; the module docstring's vmapped-cond rule)."""
    from . import serving

    sv0 = serving.serve_init(
        jax.tree_util.tree_map(lambda x: x[0], pc_frames), poly, params,
        exclusions, s, ror_method=ror_method)
    sv, metrics = serve_frames(sv0, pc_frames, poly, params, exclusions, s,
                               steps_per_frame, ror_method=ror_method)
    return (sv.st, metrics, sv.inc) if return_inc else (sv.st, metrics)
