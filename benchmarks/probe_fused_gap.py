"""Measure the fused-step gap composition (VERDICT r4 weak #2 / next #3).

FLOOR.md explains the ~15-25 ms between the measured fused device step and
the ~40-50 ms gather arithmetic as dispatch overhead + lockstep max-trips +
scatter inits — but estimated, not measured. This probe measures it by
TELESCOPING PREFIX SUBSTITUTION inside the fused program:

  Variant k feeds the EXACT precomputed outputs of pipeline stages 1..k as
  jit arguments (captured from one full run), so XLA dead-code-eliminates
  exactly those stages' compute while every downstream stage runs on REAL
  data with REAL data-dependent trip counts (a null-stub ablation would
  distort them). Then

      fused_cost(stage k) = T(variant k-1) - T(variant k)

  and the deltas telescope: sum(deltas) + T(last variant) = T(full),
  closing the attribution exactly. Comparing each fused delta against the
  stage-jit numbers (benchmarks/STAGES.json) measures per-stage
  dispatch/fusion overhead directly.

Noise discipline (CLAUDE.md round-2 lessons): the tunnel floor drifts, so
variants are timed INTERLEAVED round-robin (drift decorrelates across
variants, not within), the floor is re-calibrated every round with a
trivial jit, and the artifact reports per-variant IQRs. Deltas below ~3 ms
are below the shared-chip noise bound — the artifact says so per row.

Run: timeout 5400 python benchmarks/probe_fused_gap.py [rounds]
Writes benchmarks/FUSED_GAP.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp

    from aosx import engine
    from aosx.config import BENCH_STATICS as S, AosParams, params_as_f32
    from aosx.gvd.graph import (
        assign_labels, build_edges, extract_vertices, find_labels,
        merge_seeds,
    )
    from aosx.gvd.voronoi import jump_flood
    from aosx.orchards import OrchardSpec, make_orchard
    from aosx.perceive import points as _points
    from aosx.perceive import raster as _raster
    from aosx.perceive import rows as _rows
    from aosx.perceive import seeds as _seeds
    from aosx.perceive import skeleton as _skeleton
    from aosx.plan.astar import cost_matrix
    from aosx.plan.mission import build_waypoints, trim_distance_plane
    from aosx.types import GvdGraph

    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 7

    spec = OrchardSpec(
        n_rows=20, row_len=180.0, row_spacing=9.0, tree_spacing=1.0,
        trunk_pts=24, noise_pts=512, origin=(8.0, 8.0), jitter=0.15,
        polygon_pad=2.0,
    )  # the exact bench.py instance
    params = params_as_f32(AosParams())
    pc, poly = make_orchard(jax.random.PRNGKey(0), spec, S)
    excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)

    def probe(x):
        return jnp.sum(x.astype(jnp.float32).ravel()[:4096])

    # ---- the fused step, with optional per-stage substitution -------------
    # feed maps stage name -> precomputed output pytree; stages are listed
    # upstream-to-downstream and each variant feeds a PREFIX of them. The
    # g_* names telescope INSIDE the graph build (its 22.5 ms was the
    # largest round-5 line, so it gets sub-attributed).
    STAGES = ["preprocess", "raster", "skeletonize", "cluster", "rows",
              "seeds", "g_merged", "g_owner", "g_verts", "g_edges",
              "graph", "worldtail"]

    def fused(pc, poly, params, excl, feed):
        def get(name, compute):
            return feed[name] if name in feed else compute()

        pre = get("preprocess", lambda: _points.preprocess(
            pc, poly, params, excl, S, ror_method="sorted"))
        xy, keep, bounds, guards = pre
        inflated = get("raster", lambda: _raster.inflate(
            _raster.generate_grid(xy, keep, bounds, S), S))
        occupancy = _raster.mark_borders(inflated)
        skel = get("skeletonize", lambda: _skeleton.skeletonize(inflated, S))
        clusters = get("cluster", lambda: _rows.cluster_grid(
            skel, poly, params, S))
        rowpair = get("rows", lambda: (
            lambda r: (r, _rows.sort_rows(r)))(
                _rows.rows_from_clusters(clusters, skel, poly, params, S)))
        rows, rows_sorted = rowpair
        seeds = get("seeds", lambda: _seeds.generate_seeds(
            rows, skel, poly, params, S))
        if "graph" in feed:
            graph = feed["graph"]
        else:
            # build_gvd_graph inlined so its internals can be fed too
            merged = get("g_merged", lambda: merge_seeds(seeds, params, S))
            owner = get("g_owner", lambda: jump_flood(skel, merged, S))
            verts = get("g_verts", lambda: extract_vertices(skel, owner, S))
            pos, owners, node_valid = verts
            e6 = get("g_edges", lambda: build_edges(
                pos, owners, node_valid, skel, merged, params, S))
            ea, eb, ev, lengths, n_edges, edge_guards = e6
            lp, lv, _ = find_labels(pos, node_valid, rows_sorted, skel,
                                    params, S)
            node_labels, label_node = assign_labels(pos, node_valid, lp, lv,
                                                    params, S)
            graph = GvdGraph(
                nodes=pos, node_valid=node_valid, node_labels=node_labels,
                label_node=label_node, edges=jnp.stack([ea, eb], axis=1),
                edge_valid=ev, edge_lengths=lengths,
                edge_clearances=jnp.zeros_like(lengths),
                num_nodes=jnp.sum(node_valid.astype(jnp.int32)),
                num_edges=n_edges, guards=edge_guards,
            )
        wtail = get("worldtail", lambda: (
            cost_matrix(graph, S), build_waypoints(graph, params, S),
            trim_distance_plane(skel, S)))
        cm, wp, trim = wtail
        world = engine.World(
            skeleton=skel, occupancy=occupancy, graph=graph, costmat=cm,
            waypoints=wp, trim_skel=trim,
        )
        st0 = engine.initial_state(world, S)
        st1, metrics = engine.step(st0, world, params, S)
        return (metrics["plan_len"].astype(jnp.float32) + metrics["mod"]
                + probe(wp.xy) + probe(seeds.xy))

    # ---- capture the real intermediates from one full run -----------------
    @jax.jit
    def capture(pc, poly, params, excl):
        pre = _points.preprocess(pc, poly, params, excl, S,
                                 ror_method="sorted")
        xy, keep, bounds, guards = pre
        inflated = _raster.inflate(_raster.generate_grid(xy, keep, bounds, S), S)
        skel = _skeleton.skeletonize(inflated, S)
        clusters = _rows.cluster_grid(skel, poly, params, S)
        rows = _rows.rows_from_clusters(clusters, skel, poly, params, S)
        rows_sorted = _rows.sort_rows(rows)
        seeds = _seeds.generate_seeds(rows, skel, poly, params, S)
        merged = merge_seeds(seeds, params, S)
        owner = jump_flood(skel, merged, S)
        verts = extract_vertices(skel, owner, S)
        pos, owners, node_valid = verts
        e6 = build_edges(pos, owners, node_valid, skel, merged, params, S)
        ea, eb, ev, lengths, n_edges, edge_guards = e6
        lp, lv, _ = find_labels(pos, node_valid, rows_sorted, skel, params, S)
        node_labels, label_node = assign_labels(pos, node_valid, lp, lv,
                                                params, S)
        graph = GvdGraph(
            nodes=pos, node_valid=node_valid, node_labels=node_labels,
            label_node=label_node, edges=jnp.stack([ea, eb], axis=1),
            edge_valid=ev, edge_lengths=lengths,
            edge_clearances=jnp.zeros_like(lengths),
            num_nodes=jnp.sum(node_valid.astype(jnp.int32)),
            num_edges=n_edges, guards=edge_guards,
        )
        wtail = (cost_matrix(graph, S), build_waypoints(graph, params, S),
                 trim_distance_plane(skel, S))
        return dict(preprocess=pre, raster=inflated, skeletonize=skel,
                    cluster=clusters, rows=(rows, rows_sorted), seeds=seeds,
                    g_merged=merged, g_owner=owner, g_verts=verts, g_edges=e6,
                    graph=graph, worldtail=wtail)

    t0 = time.time()
    inter = jax.block_until_ready(capture(pc, poly, params, excl))
    print(f"# intermediates captured ({time.time() - t0:.0f}s)",
          file=sys.stderr, flush=True)

    # ---- build + warm the variants ----------------------------------------
    # the fed intermediates are passed as ARGUMENTS (not jit-closure
    # constants): executables with retained runtime jaxpr consts trip the
    # jax-0.9.0 repeat-dispatch bug on 2nd+ calls (CLAUDE.md / serving.
    # host_jit docstring); host_jit guards the dispatch path as well
    from aosx.serving import host_jit

    fused_fn = host_jit(fused)

    variants = {}
    for k in range(len(STAGES) + 1):
        fed = {n: inter[n] for n in STAGES[:k]}
        name = "full" if k == 0 else f"fed:{STAGES[k - 1]}"
        t0 = time.time()
        float(fused_fn(pc, poly, params, excl, fed))  # compile + warm
        print(f"# variant {name} compiled ({time.time() - t0:.0f}s)",
              file=sys.stderr, flush=True)
        variants[name] = fed

    trivial = host_jit(lambda x: (x * 2).sum())
    xtr = jnp.ones((8, 128))
    float(trivial(xtr))

    # ---- interleaved timing ------------------------------------------------
    times = {n: [] for n in variants}
    floors = []
    for r in range(rounds):
        t0 = time.perf_counter()
        float(trivial(xtr))
        floors.append((time.perf_counter() - t0) * 1e3)
        for n, fed in variants.items():
            t0 = time.perf_counter()
            float(fused_fn(pc, poly, params, excl, fed))
            times[n].append((time.perf_counter() - t0) * 1e3)
        print(f"# round {r + 1}/{rounds} floor={floors[-1]:.1f} ms",
              file=sys.stderr, flush=True)

    med = {n: float(np.median(v)) for n, v in times.items()}
    iqr = {n: [float(np.percentile(v, 25)), float(np.percentile(v, 75))]
           for n, v in times.items()}
    floor = float(np.median(floors))

    # telescoping deltas: stage k's fused cost = T(prefix k-1) - T(prefix k)
    names = ["full"] + [f"fed:{n}" for n in STAGES]
    deltas = {}
    for i, stage in enumerate(STAGES):
        d = med[names[i]] - med[names[i + 1]]
        deltas[stage] = round(d, 2)
    residual_step = med[names[-1]] - floor  # engine.step + residue
    NOISE_MS = 3.0

    art = {
        "metric": "fused_step_gap_attribution",
        "grid": [S.grid_h, S.grid_w],
        "rounds": rounds,
        "floor_ms": round(floor, 2),
        "floor_spread_ms": [round(min(floors), 2), round(max(floors), 2)],
        "full_reported_ms": round(med["full"], 2),
        "full_device_ms_est": round(med["full"] - floor, 2),
        "variant_ms": {n: round(v, 2) for n, v in med.items()},
        "variant_iqr_ms": {n: [round(a, 2), round(b, 2)]
                           for n, (a, b) in iqr.items()},
        "fused_stage_deltas_ms": deltas,
        "engine_step_plus_residue_ms": round(residual_step, 2),
        "telescoping_check_ms": round(
            sum(deltas.values()) + residual_step - (med["full"] - floor), 2),
        "noise_bound_ms": NOISE_MS,
        "below_noise": [k for k, v in deltas.items() if abs(v) < NOISE_MS],
        "note": "variant k feeds the exact precomputed outputs of the "
                "first k stages as jit args (real downstream trip counts); "
                "delta_k = T(k-1) - T(k) is the stage's cost inside the "
                "FUSED program incl. its share of dispatch/fusion overhead. "
                "g_merged/g_owner/g_verts/g_edges are graph-build internals "
                "(seed merge, JFA ownership, vertex extraction, ridge+prox "
                "edges); the 'graph' row is the REMAINING graph compute = "
                "label find/assign. Compare against STAGES.json "
                "(stage-local jits) to read the fusion gap per stage.",
        "measured_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    print(json.dumps(art))
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "FUSED_GAP.json"), "w") as f:
        json.dump(art, f, indent=1)


if __name__ == "__main__":
    main()
