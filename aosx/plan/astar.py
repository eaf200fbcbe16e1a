"""Weighted A* over the padded GVD graph (C10 planning core)
(reference: aos_path_gen_node.cpp:800-932).

TPU mapping: the graph is held as a padded-CSR adjacency (``CsrCosts``:
[N, D] neighbor ids + costs, D = Statics.max_degree), matching the
reference's O(E) memory semantics — its A* scans the edge list per
neighbor (cpp:863-879) and never materializes an [N, N] structure. Rounds
1-4 used a dense [N, N] cost matrix instead; at the measured grid ceiling
(FLOOR.md §3b) that became the first memory-shaped cap (1 GB at 16384
nodes), so round 5 replaced it with this CSR form: one A* "pop" is still a
masked argmin over f = g + w*h, but a relaxation is now a D-wide
scatter-min instead of a full row update — bit-identical g/parent/pop
evolution (the scatter-min over the popped node's neighbor slots updates
exactly the entries the dense row-where updated, with the same float
values), O(N*D) memory, and node caps can scale to giant maps. The
k-candidate-start variant vmaps the whole search.

GVD corridor graphs are very sparse (measured max degree 3-4 on procedural
orchards: ridge chains are degree-2 with rare junctions; proximity edges
are top-k capped at 8/node in gvd/graph.py), so D = 16 is generous;
overflow is detected (GUARD_DEGREE_CAP) rather than trusted.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..config import AosParams, Statics
from ..types import GvdGraph

INF = jnp.float32(3.4e38)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CsrCosts:
    """Padded-CSR edge costs: slot j of row i holds neighbor ``idx[i, j]``
    at cost ``cost[i, j]`` (pad: idx = N, cost = INF). Slot order within a
    row is arbitrary (every consumer is order-independent: scatter-min
    relaxation, any-neighbor checks, first-match cost lookup on a deduped
    edge list). ``guards`` carries GUARD_DEGREE_CAP when a node exceeded
    max_degree and edges were dropped."""

    idx: Any    # [N, D] i32
    cost: Any   # [N, D] f32
    guards: Any  # i32 scalar guard bitmask


def cost_matrix(graph: GvdGraph, s: Statics) -> CsrCosts:
    """Edge list -> padded-CSR adjacency. Both directions of every valid
    edge are slotted onto their source row (slot = rank among same-source
    entries, via one stable sort + segmented cumulative max — no
    searchsorted, whose log-round gathers are slow on TPU). Duplicate
    (a, b) edges would occupy separate slots and every consumer takes the
    min / relies on graph.py's in-ridge dedupe, so min == first as in the
    dense rounds-1-4 formulation."""
    N, D = s.max_nodes, s.max_degree
    E = graph.edges.shape[0]
    a = jnp.where(graph.edge_valid, graph.edges[:, 0], N).astype(jnp.int32)
    b = jnp.where(graph.edge_valid, graph.edges[:, 1], N).astype(jnp.int32)
    lens = jnp.where(graph.edge_valid, graph.edge_lengths, INF)
    src = jnp.concatenate([a, b])
    dst = jnp.concatenate([b, a])
    c = jnp.concatenate([lens, lens])

    order = jnp.argsort(src, stable=True)
    ss = src[order]
    ds = dst[order]
    cs = c[order]
    pos = jnp.arange(2 * E, dtype=jnp.int32)
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), ss[1:] != ss[:-1]])
    slot = pos - jax.lax.cummax(jnp.where(is_start, pos, 0))

    live = ss < N
    ok = live & (slot < D)
    overflow = jnp.any(live & (slot >= D))
    row = jnp.where(ok, ss, N)                      # N -> dropped
    col = jnp.minimum(slot, D - 1)
    idx = jnp.full((N, D), N, jnp.int32).at[row, col].set(ds, mode="drop")
    cost = jnp.full((N, D), INF, jnp.float32).at[row, col].set(cs, mode="drop")
    from ..guards import GUARD_DEGREE_CAP

    return CsrCosts(
        idx=idx, cost=cost,
        guards=jnp.where(overflow, jnp.int32(GUARD_DEGREE_CAP), jnp.int32(0)),
    )


def astar(costs: CsrCosts, nodes, node_valid, start, goal, weight, s: Statics,
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
    has_nb_start = jnp.any(costs.cost[start] < INF)
    has_nb_goal = jnp.any(costs.cost[goal] < INF)
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
        # D-wide relaxation: neighbor slots of u only. Pad slots carry
        # cost = INF (masked); pad targets (idx = N) are dropped by the
        # scatter. `better` (the nodes whose g improved this pop) recovers
        # the dense formulation's mask exactly: g2 < g iff some valid slot
        # relaxed below the old value.
        t = costs.idx[u]
        c = costs.cost[u]
        tc = jnp.minimum(t, N - 1)
        ng = jnp.where((c < INF) & (~closed[tc]) & (~at_goal), g[u] + c, INF)
        g2 = g.at[t].min(ng, mode="drop")
        better = g2 < g
        parent = jnp.where(better, u, parent)
        open_ = open_ | better
        return g2, parent, open_, closed, done | at_goal, it + 1

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


def path_cost(costs: CsrCosts, nodes, path, path_len):
    """calculatePathCost (cpp:935-973): edge lengths, euclidean fallback.

    Per consecutive pair (a, b): gather a's neighbor-id row ([P-1, D] ints)
    and read the cost of the first slot matching b (the edge list is deduped
    by gvd/graph.py, so first match == only match == the dense min); no
    match -> euclidean fallback, exactly the dense INF case. Values and the
    final sum order are bit-identical to the dense-matrix formulation."""
    P = path.shape[0]
    a = path[:-1]
    b = path[1:]
    ok = (jnp.arange(P - 1) < path_len - 1) & (a >= 0) & (b >= 0)
    ai = jnp.maximum(a, 0)
    bi = jnp.maximum(b, 0)
    rows = costs.idx[ai]                      # [P-1, D]
    match = rows == bi[:, None]
    has = jnp.any(match, axis=1)
    slot = jnp.argmax(match, axis=1)
    c = costs.cost[ai, slot]
    eu = jnp.sqrt(jnp.sum((nodes[bi] - nodes[ai]) ** 2, axis=1))
    c = jnp.where(has, c, eu)
    return jnp.sum(jnp.where(ok, c, 0.0))


def k_nearest_nodes(nodes, node_valid, point, k: int):
    """findKNearestNodes (cpp:914-932): k nearest by distance, index ties."""
    d = jnp.sqrt(jnp.sum((nodes - point[None, :]) ** 2, axis=1))
    d = jnp.where(node_valid, d, INF)
    _, idx = jax.lax.top_k(-d, k)
    return idx.astype(jnp.int32)


def plan_between(costs: CsrCosts, nodes, node_valid, start_point, goal_node,
                 params, s: Statics, enabled=None):
    """The k-candidate-start planning core (cpp:1282-1386): try A* from each
    of the 5 nearest nodes to start_point (skipping the goal itself), score =
    dist(start, candidate) + path cost, keep the best.

    Returns (path [max_path] i32, path_len, found). enabled: see astar."""
    cands = k_nearest_nodes(nodes, node_valid, start_point, s.astar_k)

    def one(c):
        path, ln, found = astar(
            costs, nodes, node_valid, c, goal_node, params.heuristic_weight,
            s, enabled=enabled
        )
        usable = found & (ln > 1) & (c != goal_node)
        cost = path_cost(costs, nodes, path, ln) + jnp.sqrt(
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
        paths, lens, usable, costs_ = jax.lax.map(one, cands)
    else:
        paths, lens, usable, costs_ = jax.vmap(one)(cands)
    best = jnp.argmin(costs_)
    found = jnp.any(usable)
    return paths[best], jnp.where(found, lens[best], 0), found
