"""Statics.for_grid derivation invariants (VERDICT r4 missing #1): the
large-map cap scaling must respect every structural bound the kernels
assume, at every size the ceiling probe measures."""

import numpy as np

from aosx.config import BENCH_STATICS, Statics


def test_for_grid_invariants():
    for H, W in [(2000, 2048), (4000, 4096), (6000, 6144), (8000, 8192),
                 (3000, 1024), (512, 512)]:
        s = Statics.for_grid(H, W, resolution=0.05)
        # grid dims honored (post-init keeps them 8/128-aligned)
        assert s.grid_h == H and s.grid_w == W
        # i32 sort/dedupe key bounds (gvd/graph.py: a*N+b and lo*(S+1)+hi)
        assert s.max_nodes * s.max_nodes < 2**31
        assert (s.max_seeds + 1) ** 2 < 2**31
        # proximity row-chunking needs N % RC == 0 for RC = min(2048, N)
        rc = min(2048, s.max_nodes)
        assert s.max_nodes % rc == 0
        # cluster band: multiple of 512 (row-chunk divisibility) and covers
        # one full-length skeleton row of the long side
        assert s.cluster_band % 512 == 0
        assert s.cluster_band >= min(max(H, W), s.max_skel_cells)
        # monotone content scaling: caps never shrink below the 2000-scale
        # calibration point (strict compare — an earlier draft wrote the
        # tautology `s.f >= min(b.f, s.f)`, caught in round-5 review)
        b = Statics.for_grid(2000, 2048, resolution=0.05)
        for f in ("max_points", "max_skel_cells", "max_seeds", "max_nodes",
                  "max_edges", "max_path", "max_plan", "max_waypoints",
                  "max_clusters", "max_rows"):
            assert getattr(s, f) >= getattr(b, f), f
        # rows are realizable: each row needs a cluster
        assert s.max_clusters >= s.max_rows


def test_for_grid_calibration_point_covers_bench():
    """At the BENCH grid size, for_grid's caps dominate the hand-tuned
    BENCH_STATICS content caps (same family, >= headroom)."""
    s = Statics.for_grid(2000, 2048, resolution=0.1)
    for f in ("max_points", "max_skel_cells", "max_seeds",
              "max_nodes", "max_edges", "max_path", "max_plan"):
        assert getattr(s, f) >= getattr(BENCH_STATICS, f), f


def test_for_grid_meter_caps_scale_with_resolution():
    """Meter-denominated caps (plan points at fixed 5 cm spacing, path
    nodes, rows) follow PHYSICAL extent = cells * resolution, not cell
    counts (round-5 review: a 0.1 m-res grid describes a 2x bigger field
    than the same cells at 0.05 m and needs 2x the plan buffer)."""
    fine = Statics.for_grid(4000, 4096, resolution=0.05)    # 200 m
    coarse = Statics.for_grid(4000, 4096, resolution=0.1)   # 400 m
    assert coarse.max_plan >= 2 * fine.max_plan
    assert coarse.max_path >= 2 * fine.max_path
    assert coarse.max_rows >= 2 * fine.max_rows
    # cell-denominated caps are resolution-independent
    for f in ("max_skel_cells", "max_nodes", "max_edges", "cluster_band"):
        assert getattr(coarse, f) == getattr(fine, f), f


def test_for_grid_overrides():
    s = Statics.for_grid(4000, 4096, max_nodes=4096, exact_fallbacks=False)
    assert s.max_nodes == 4096
    assert s.exact_fallbacks is False
