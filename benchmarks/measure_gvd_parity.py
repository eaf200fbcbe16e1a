"""Measure GVD decision-parity scores (node coverage + edge correspondence)
across several orchard shapes/seeds, to pin evidence-based thresholds in
tests/test_gvd.py (VERDICT r1 #6). Writes benchmarks/GVD_PARITY.json."""
import json
import os
import sys

RESULTS = []

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from aosx.config import TEST_STATICS as S, AosParams, params_as_f32
from aosx.oracle import perceive as op
from aosx.oracle import gvd as og
from aosx.orchards import OrchardSpec, make_orchard_np
from aosx.gvd import build_gvd_graph
from tests.test_gvd import _mk

CONFIGS = [
    (OrchardSpec(n_rows=3, row_len=12.0), 3),
    (OrchardSpec(n_rows=2, row_len=8.0, origin=(5.0, 4.0)), 7),
    (OrchardSpec(n_rows=4, row_len=14.0, row_spacing=3.0), 11),
    (OrchardSpec(n_rows=3, row_len=10.0, row_spacing=5.0, jitter=0.25), 5),
    (OrchardSpec(n_rows=5, row_len=12.0, row_spacing=2.5, origin=(4.0, 2.0)), 1),
]

params = params_as_f32(AosParams())
fn = jax.jit(lambda se, ro, sk, pr: build_gvd_graph(se, ro, sk, pr, S))

for spec, seed in CONFIGS:
    xyz, poly = make_orchard_np(spec, seed=seed)
    ores = op.perceive(xyz, poly)
    skel, seeds, rows = _mk(ores)
    g = fn(seeds, rows, skel, params)
    ref = og.gvd_graph(ores.seeds, ores.skeleton, ores.rows_sorted)

    n = int(g.num_nodes)
    jn = np.asarray(g.nodes)[:n]
    e = int(g.num_edges)
    jedges = np.asarray(g.edges)[:e]

    # node coverage: nearest jitted node per oracle node
    tol = 3 * 0.05
    d = np.linalg.norm(jn[None, :, :] - np.asarray(ref.nodes)[:, None, :], axis=2)
    nearest = d.argmin(1)
    mind = d.min(1)
    misses = int((mind > tol).sum())

    # edge correspondence on matched nodes: oracle edge (a,b) -> jitted edge
    # (match[a], match[b]) directly, or via one intermediate jitted node
    adj = set()
    nbr = {}
    for a, b in jedges:
        adj.add((min(a, b), max(a, b)))
        nbr.setdefault(int(a), set()).add(int(b))
        nbr.setdefault(int(b), set()).add(int(a))
    direct = via1 = miss = skipped = 0
    for a, b in ref.edges:
        if mind[a] > tol or mind[b] > tol:
            skipped += 1
            continue
        ma, mb = int(nearest[a]), int(nearest[b])
        if ma == mb:
            skipped += 1
            continue
        if (min(ma, mb), max(ma, mb)) in adj:
            direct += 1
        elif nbr.get(ma, set()) & nbr.get(mb, set()):
            via1 += 1
        else:
            miss += 1
    tot = direct + via1 + miss
    print(f"rows={spec.n_rows} len={spec.row_len} seed={seed}: "
          f"ref_nodes={len(ref.nodes)} jit_nodes={n} node_miss={misses} "
          f"({100*misses/len(ref.nodes):.1f}%) | ref_edges={len(ref.edges)} "
          f"matched_pairs={tot} direct={direct} via1={via1} miss={miss} "
          f"(corr={100*(direct+via1)/max(tot,1):.1f}%) guards={int(g.guards)}",
          flush=True)
    RESULTS.append(dict(
        rows=spec.n_rows, row_len=spec.row_len, seed=seed,
        ref_nodes=len(ref.nodes), jit_nodes=n,
        node_miss=misses, node_miss_pct=round(100 * misses / len(ref.nodes), 2),
        ref_edges=len(ref.edges), edge_direct=direct, edge_via1=via1,
        edge_miss=miss,
        edge_corr_pct=round(100 * (direct + via1) / max(tot, 1), 2),
        guards=int(g.guards),
    ))

with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "GVD_PARITY.json"), "w") as f:
    json.dump(dict(
        note="node coverage within 3 cells of the Subdiv2D-oracle nodes; "
             "oracle edges matched directly or via one intermediate jitted "
             "node on the tolerantly matched node pairs",
        configs=RESULTS,
    ), f, indent=1)
print("wrote GVD_PARITY.json")
