"""Weighted A* over the padded GVD graph (C10 planning core)
(reference: aos_path_gen_node.cpp:800-932).

TPU mapping: the graph is dense-ified into an [N,N] cost matrix (N <= 1024,
4 MB f32 - cheap and HBM-resident), so one A* "pop" is a masked argmin over
f = g + w*h and one relaxation is a full vectorized row update. The
reference's per-neighbor linear scan of the edge list (its actual inner loop,
cpp:863-879) disappears entirely. The k-candidate-start variant vmaps the
whole search.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config import AosParams, Statics
from ..types import GvdGraph

INF = jnp.float32(3.4e38)


def cost_matrix(graph: GvdGraph, s: Statics):
    """[N,N] edge costs (INF where no edge). Duplicate (a,b) edges keep the
    min; the reference keeps the FIRST edge in its list but its edge list is
    already deduped, so min == first."""
    N = s.max_nodes
    a = jnp.where(graph.edge_valid, graph.edges[:, 0], N)
    b = jnp.where(graph.edge_valid, graph.edges[:, 1], N)
    lens = jnp.where(graph.edge_valid, graph.edge_lengths, INF)
    # ONE flat scatter over an [N*N] buffer (both directions concatenated):
    # the 2-D [N+1,N+1] double-scatter + slice materialized the 268 MB
    # (N=8192) matrix four times; this writes it once
    fwd = a * N + b
    bwd = b * N + a
    idx = jnp.concatenate([jnp.where(fwd < N * N, fwd, N * N),
                           jnp.where(bwd < N * N, bwd, N * N)])
    both = jnp.concatenate([lens, lens])
    flat = jnp.full((N * N,), INF).at[idx].min(both, mode="drop")
    return flat.reshape(N, N)


def astar(costmat, nodes, node_valid, start, goal, weight, s: Statics,
          enabled=None):
    """Single-source weighted A* (f = g + w*h, h = euclidean to goal;
    cpp:800-896). Returns (path [max_path] i32 padded with -1, path_len i32,
    found bool). Pops the open node with min f (ties: lowest index).

    enabled (optional traced bool): when False the search is skipped — the
    while_loop starts done, costing ~0 iterations — and (empty, 0, False) is
    returned, exactly what an unreachable search would produce. Used by
    build_plan_cache to make dead cache rows (configs whose A* result is
    provably never read) free under its sequential row scan."""
    N = s.max_nodes
    goal_xy = nodes[goal]
    h = jnp.sqrt(jnp.sum((nodes - goal_xy[None, :]) ** 2, axis=1)) * weight

    g0 = jnp.full((N,), INF).at[start].set(0.0)
    parent0 = jnp.full((N,), -1, jnp.int32)
    open0 = jnp.zeros((N,), bool).at[start].set(True)
    closed0 = jnp.zeros((N,), bool)

    start_ok = node_valid[start] & node_valid[goal]
    # the reference refuses isolated start/goal nodes (cpp:813-821)
    has_nb_start = jnp.any(costmat[start] < INF)
    has_nb_goal = jnp.any(costmat[goal] < INF)
    runnable = start_ok & has_nb_start & has_nb_goal & (start != goal)
    if enabled is not None:
        runnable = runnable & enabled

    def cond(st):
        g, parent, open_, closed, done, it = st
        return (~done) & jnp.any(open_) & (it < N)

    def body(st):
        g, parent, open_, closed, done, it = st
        f = jnp.where(open_, g + h, INF)
        u = jnp.argmin(f).astype(jnp.int32)
        at_goal = u == goal
        closed = closed.at[u].set(True)
        open_ = open_.at[u].set(False)
        costs = costmat[u]
        ng = g[u] + costs
        better = (~closed) & (costs < INF) & (ng < g) & (~at_goal)
        g = jnp.where(better, ng, g)
        parent = jnp.where(better, u, parent)
        open_ = open_ | better
        return g, parent, open_, closed, done | at_goal, it + 1

    g, parent, open_, closed, found, _ = jax.lax.while_loop(
        cond,
        body,
        (g0, parent0, open0, closed0, ~runnable, jnp.int32(0)),
    )
    found = found & runnable & closed[goal]

    # reconstruct (goal -> start), then reverse into a front-aligned buffer
    P = s.max_path

    def rec(i, st):
        node, rev, ln = st
        ok = node >= 0
        rev = rev.at[i].set(jnp.where(ok, node, -1))
        ln = ln + ok.astype(jnp.int32)
        node = jnp.where(ok, parent[jnp.maximum(node, 0)], -1)
        return node, rev, ln

    _, rev, ln = jax.lax.fori_loop(
        0, P, rec, (jnp.where(found, goal, -1), jnp.full((P,), -1, jnp.int32), jnp.int32(0))
    )
    idx = jnp.arange(P)
    path = jnp.where(idx < ln, rev[jnp.clip(ln - 1 - idx, 0, P - 1)], -1)
    # single-node degenerate case start == goal (cpp:808-811)
    trivial = start_ok & (start == goal)
    if enabled is not None:
        trivial = trivial & enabled
    path = jnp.where(trivial, jnp.full((P,), -1, jnp.int32).at[0].set(start), path)
    ln = jnp.where(trivial, 1, jnp.where(found, ln, 0))
    return path, ln, found | trivial


def path_cost(costmat, nodes, path, path_len):
    """calculatePathCost (cpp:935-973): edge lengths, euclidean fallback."""
    P = path.shape[0]
    a = path[:-1]
    b = path[1:]
    ok = (jnp.arange(P - 1) < path_len - 1) & (a >= 0) & (b >= 0)
    c = costmat[jnp.maximum(a, 0), jnp.maximum(b, 0)]
    eu = jnp.sqrt(jnp.sum((nodes[jnp.maximum(b, 0)] - nodes[jnp.maximum(a, 0)]) ** 2, axis=1))
    c = jnp.where(c < INF, c, eu)
    return jnp.sum(jnp.where(ok, c, 0.0))


def k_nearest_nodes(nodes, node_valid, point, k: int):
    """findKNearestNodes (cpp:914-932): k nearest by distance, index ties."""
    d = jnp.sqrt(jnp.sum((nodes - point[None, :]) ** 2, axis=1))
    d = jnp.where(node_valid, d, INF)
    _, idx = jax.lax.top_k(-d, k)
    return idx.astype(jnp.int32)


def plan_between(costmat, nodes, node_valid, start_point, goal_node, params,
                 s: Statics, enabled=None):
    """The k-candidate-start planning core (cpp:1282-1386): try A* from each
    of the 5 nearest nodes to start_point (skipping the goal itself), score =
    dist(start, candidate) + path cost, keep the best.

    Returns (path [max_path] i32, path_len, found). enabled: see astar."""
    cands = k_nearest_nodes(nodes, node_valid, start_point, s.astar_k)

    def one(c):
        path, ln, found = astar(
            costmat, nodes, node_valid, c, goal_node, params.heuristic_weight,
            s, enabled=enabled
        )
        usable = found & (ln > 1) & (c != goal_node)
        cost = path_cost(costmat, nodes, path, ln) + jnp.sqrt(
            jnp.sum((start_point - nodes[c]) ** 2)
        )
        return path, ln, usable, jnp.where(usable, cost, INF)

    if s.astar_serial_candidates:
        # lax.map, not vmap: under an OUTER lane vmap the 2-level nest
        # (lanes x candidates) is MISCOMPILED by the axon TPU toolchain at
        # lane width 256 (clean at 8/64/128 — benchmarks/WIDTH_UNCACHED
        # .json / WIDTH_BISECT.json, 2026-08-20: identical tiled worlds,
        # lanes 205+ get a different A* route from identical inputs; same
        # defect class as the round-3 3-level nest at width >= 16). The
        # map keeps primitives at 1-level batching. Costs ~astar_k
        # sequential lockstep searches — only take it when lanes > 128 are
        # required on the uncached path; results are bit-identical
        # (tests/test_plan.py).
        paths, lens, usable, costs = jax.lax.map(one, cands)
    else:
        paths, lens, usable, costs = jax.vmap(one)(cands)
    best = jnp.argmin(costs)
    found = jnp.any(usable)
    return paths[best], jnp.where(found, lens[best], 0), found
