"""Configuration for the aosx TPU-native orchard exploration engine.

Mirrors the reference parameter schema (reference: config/aos_planner_params.yaml:1-89
and the per-node ``declare_parameter`` calls, e.g. src/aos_seed_gen_node.cpp:68-100),
plus every magic constant that the reference hard-codes in source:

- hard-coded exploration polygon    (src/aos_seed_gen_node.cpp:192-215)
- exclusion discs                   (src/aos_seed_gen_node.cpp:483-499)
- initial waypoint (8, 0)           (src/aos_path_gen_node.cpp:114-117)
- docking radius 0.7 m              (src/aos_path_gen_node.cpp:249)
- A* heuristic weight 3.0           (src/aos_path_gen_node.cpp:788,824)
- virtual seed interval 1 m / conversion radius 4 m (src/aos_seed_gen_node.cpp:2666-2667)
- seed merge distance 0.5 m         (src/aos_gvd_node.cpp:94)
- ROR radius 0.2 m / min neighbors 2 (src/aos_seed_gen_node.cpp:236-239)

Two kinds of configuration:

``Statics``  — hashable, shape-determining constants (grid caps, buffer caps,
               resolution). These are compile-time for jit/pallas.
``AosParams`` — float/int runtime parameters; a pytree of scalars that can be
               traced (and therefore vmapped / swept without recompiles).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

try:  # pyyaml is available in the image; gate anyway
    import yaml

    _HAVE_YAML = True
except Exception:  # pragma: no cover
    _HAVE_YAML = False

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Static (compile-time) shape configuration
# ---------------------------------------------------------------------------


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@dataclasses.dataclass(frozen=True)
class Statics:
    """Hashable compile-time constants. TPU-friendly: grid dims padded so the
    last dim is a multiple of 128 (lane) and the second-to-last a multiple of 8
    (sublane for f32 / 32 for int8)."""

    # Grid geometry (cells). The *caps*; the live region h_cells x w_cells is
    # dynamic (traced) and always <= these.
    grid_h: int = 576
    grid_w: int = 1664
    resolution: float = 0.05           # m / cell (grid_resolution)
    inflation_radius: float = 0.8      # m (inflation_radius)

    # Fixed-size buffers (padding caps)
    max_points: int = 65536            # point-cloud buffer
    max_poly: int = 8                  # polygon vertices
    max_exclusions: int = 16           # exclusion discs
    max_clusters: int = 64             # skeleton connected components kept
    max_skel_cells: int = 16384        # compacted skeleton-cell buffer
    max_rows: int = 32                 # tree rows kept (post length filter)
    max_seeds_per_row: int = 96        # virtual base seeds per row cap
    max_seeds: int = 1024              # total Voronoi seed buffer
    max_nodes: int = 1024              # GVD graph nodes
    max_edges: int = 4096              # GVD graph edges
    max_labels: int = 256              # (cluster,label)->node assignments cap
    max_waypoints: int = 68            # 2/cluster + tail + origin
    max_path: int = 256                # A* path nodes cap
    max_plan: int = 4096               # densified 5 cm plan cap
    astar_k: int = 5                   # candidate start nodes (k-nearest)
    max_segments: int = 10             # linearization max segments (long dist)
    # Padded-CSR A* adjacency width (plan/astar.CsrCosts): neighbor slots
    # per node. GVD corridor graphs measure max degree 3-4 (ridge chains
    # are degree-2; proximity edges are top-8-capped per node in
    # gvd/graph.py), so 16 is generous; overflow trips GUARD_DEGREE_CAP.
    # Memory is O(max_nodes * max_degree) — the round-4 dense [N, N]
    # matrix (1 GB at 16384 nodes, FLOOR.md §3b) is gone.
    max_degree: int = 16

    # Coarse factor for the packed coarse-to-fine edge-crossing filter
    # (gvd/graph.edge_crossing_packed): every C4-th fine sample is probed in
    # a (C4/4+1)-dilated grid; exact fine windows of 2*C4 lanes open around
    # coarse hits. Cost of the per-slot machinery is proportional to
    # cap/C4; the fine gather grows with C4. Must be a multiple of 4.
    # Decisions are exact at any value (the dilation radius scales with C4).
    crossing_coarse_factor: int = 8

    # Sample cap for LONG ridge candidates in the packed edge-crossing
    # filter (gvd/graph.py two-tier caps: 64 covers edges <= 63*res/2, this
    # tier the rest). Edges longer than (this-1)*res/2 sample coarser than
    # the reference and trip GUARD_EDGE_COARSE. 256 (6.375 m at 0.05 res)
    # suits straight-row fields; curved-row/dropout worlds grow corridor-
    # spanning ridges past it (CLASSIFY_realism.json: 680/4096 lanes) —
    # MC_REALISM_STATICS raises it.
    crossing_nmax_long: int = 256
    # Slot-buffer cap of the packed crossing pass, in units of max_edges
    # (cost of the per-slot machinery is proportional to this cap / the
    # coarse factor). Scale it with crossing_nmax_long so longer samples
    # don't overflow into the dense fallback.
    crossing_cap_edges_factor: int = 32
    # Lower the A* k-candidate axis from vmap to lax.map (plan/astar.py
    # plan_between). REQUIRED for uncached Monte-Carlo batches WIDER than
    # 128 lanes on the axon TPU toolchain: the (lanes x candidates) nest
    # is miscompiled at lane width 256 (deterministic wrong routes on
    # identical tiled worlds - benchmarks/WIDTH_UNCACHED.json /
    # WIDTH_BISECT.json; clean at 8/64/128, where vmap stays the faster
    # lowering). The plan-cached path never hits this (no per-tick A*).
    astar_serial_candidates: bool = False
    # Exact-pairwise-length band for skeleton clusters
    # (perceive/rows.cluster_grid): clusters with more cells than this get
    # UNDER-estimated lengths (GUARD_CLUSTER_LEN). 0 -> min(4096,
    # max_skel_cells), which covers a 204 m skeleton row at 0.05 m res;
    # Statics.for_grid scales it with the grid's long side (the banded
    # pairwise pass costs O(max_skel_cells * 3 * band)).
    cluster_band: int = 0
    # Run/pair buffer size for the run-level union-find CCL
    # (perceive/rows.run_level_labels). 0 -> max(256, max_skel_cells // 8).
    # Dropout-fragmented skeletons have more, shorter runs (11/4096 realism
    # lanes overflowed the default) — MC_REALISM_STATICS raises it.
    max_ccl_runs: int = 0

    # Incremental map update (aosx.incremental): cap on NEW points per frame
    # handled by the O(N*D) delta-ROR cross pass; a larger delta falls back
    # to the exact from-scratch pass inside the same jit.
    max_delta_points: int = 8192

    # Static raycast reach for virtual-seed rays (shape-determining:
    # sets the fori_loop trip count; reference hardcodes 4.0 m,
    # aos_seed_gen_node.cpp:2093)
    seed_raycast_max: float = 4.0

    # Enumeration cap (m) for the path-trim disc offsets (shape-determining:
    # sets the offset count / distance-plane reach). The RUNTIME trim radius
    # is params.trim_safety_distance (traced, sweepable up to this cap;
    # values above it trim as if capped). Default equals the reference's
    # declared trim_safety_distance (aos_path_gen_node.cpp:1575) so the
    # default-config plane costs exactly what the old binary plane did.
    trim_max_distance: float = 0.2

    # Iteration caps for fixpoint loops
    skeleton_max_iters: int = 64       # Zhang-Suen outer iterations cap
    ccl_max_iters: int = 32            # connected-components pointer jumping

    # JFA shift lowering: static unroll is ~4x faster on TPU but slow to
    # compile on CPU; dynamic (fori + roll) is the reverse. Same results.
    jfa_dynamic_shifts: bool = False
    # Exact-fallback lax.conds (dense edge-crossing, cell-level union-find,
    # direct first-K compaction) keep decisions identical when a static
    # buffer overflows. A VMAPPED lax.cond executes BOTH branches, so on
    # the batched Monte-Carlo path every world-build pays the expensive
    # branch even when no lane overflows. False = always take the fast
    # path; overflow is still DETECTED (guard bits: GUARD_CROSS_DENSE,
    # GUARD_CCL_CELL_FALLBACK, GUARD_SKEL_OVERFLOW) but no longer
    # corrected - flagged lanes should be discarded by the consumer.
    # Keep True for parity tests, the latency bench, and replay.
    exact_fallbacks: bool = True
    # Run each JFA pass with step <= 128 as a banded halo-DMA Pallas kernel
    # (one read+write of the carried planes per pass instead of XLA's
    # materialized shifts; TPU only - see gvd/jfa_pass_pallas.py).
    jfa_pass_pallas: bool = False
    # Use the banded halo-DMA Pallas thinning kernel instead of the XLA
    # stencil loop (TPU only; bit-identical - see perceive/skeleton_pallas.py)
    skeleton_pallas: bool = False

    def __post_init__(self):
        object.__setattr__(self, "grid_h", _round_up(self.grid_h, 8))
        object.__setattr__(self, "grid_w", _round_up(self.grid_w, 128))

    @property
    def inflation_cells(self) -> int:
        # reference: int(inflation_radius / grid_resolution), C-truncation
        # (src/aos_seed_gen_node.cpp:936)
        return int(self.inflation_radius / self.resolution)

    @classmethod
    def for_grid(cls, grid_h: int, grid_w: int, resolution: float = 0.05,
                 **overrides) -> "Statics":
        """Content caps derived for an arbitrary (grid_h x grid_w) map —
        the large-map preset VERDICT r4 asked for (missing #1): 300–400 m
        fields run guard-clean out of the box instead of needing the
        hand-tuned cap scaling probe_grid_ceiling applied in round 4.

        Calibration point: the measured BENCH-scale content at 2000x2048
        (FLOOR.md profile: ~36 k skeleton cells, ~4 k seeds, ~7.4 k nodes,
        10 rows) with ~2x headroom. Scaling rules:

        - skeleton / seed / node / edge content is proportional to total
          corridor length, i.e. to grid AREA;
        - per-row structures (cluster band, rows, waypoints, path/plan
          lengths) scale with the grid's LONG SIDE;
        - the cluster band covers one full-length skeleton row (the
          round-4 ceiling's `cluster_length_band_exceeded` flag), at
          O(max_skel_cells * 3 * band) banded-pairwise cost;
        - i32 sort/dedupe keys bound two caps: node-pair keys `a*N+b`
          need N <= 46340 (cap 32768) and seed-pair keys `lo*(S+1)+hi`
          need S <= 46340 (cap 16384) — both in gvd/graph.py.

        The node cap scales freely only because round 5's padded-CSR A*
        costs (plan/astar.CsrCosts) replaced the dense [N, N] matrix,
        which was 1 GB at 16384 nodes (FLOOR.md §3b); the proximity pass
        is row-chunked for the same reason. The Pallas JFA tier is safe to
        leave on: gvd/voronoi.py auto-valves it at >= 4000 grid rows
        (remote Mosaic compile-helper crash, CLAUDE.md round-4 note).
        """
        cells = grid_h * grid_w
        area = max(1, -(-cells // (2000 * 2048)))          # ceil ratio, CELLS
        long_side = max(grid_h, grid_w)
        # CELL-denominated caps (skeleton cells, nodes, edges, the banded
        # cluster length) scale with cell counts; METER-denominated caps
        # (plan points at the fixed 5 cm linearize spacing, A* path nodes
        # at ~0.5 m boundary-point spacing, rows at ~5-9 m spacing) scale
        # with PHYSICAL extent = cells * resolution — at a coarser
        # resolution the same cell grid describes a bigger field and needs
        # proportionally bigger plan buffers (round-5 review finding; the
        # calibration point is 2048 cells * 0.05 m = 102.4 m).
        meters_long = long_side * resolution
        meters_h = grid_h * resolution
        mlinear = max(1, -(-int(meters_long * 10) // 1024))   # ceil /102.4 m
        max_rows = max(32, 16 * max(1, -(-int(meters_h * 10) // 1024)))
        base = dict(
            grid_h=grid_h, grid_w=grid_w, resolution=resolution,
            max_points=min(131072 * area, 1048576),
            max_skel_cells=65536 * area,
            max_rows=max_rows,
            # virtual seeds sit at 1 m intervals along a row: 512 covers
            # rows to 512 m, beyond every field this preset targets
            max_seeds_per_row=512,
            max_seeds=4096 * min(area, 4),
            # clusters: dropout-fragmented skeletons shatter into many
            # components; scale with area (cheap [K] buffers) and guard
            # overflow (GUARD_CLUSTER_CAP)
            max_clusters=min(64 * area, 1024),
            max_nodes=min(8192 * area, 32768),
            max_edges=min(32768 * area, 131072),
            max_labels=8 * max_rows,
            max_waypoints=2 * max_rows + 4,
            max_path=768 * mlinear,
            max_plan=4096 * mlinear,
            cluster_band=min(_round_up(long_side, 512), 65536 * area),
            crossing_nmax_long=512,
            # packed-crossing slot budget = factor * max_edges. Candidate
            # content keeps growing with area after max_edges caps at
            # area 4, so the factor takes over: 48 measured sufficient
            # through area 9 (6000x6144 guard-clean, GRID_CEILING.json);
            # the 8000x8192 run (area 16) overflowed into the exact dense
            # fallback at 48 — double the budget past area 12.
            crossing_cap_edges_factor=48 * max(
                1, -(-cells // (12 * 2000 * 2048))),
            jfa_pass_pallas=True,
        )
        base.update(overrides)
        return cls(**base)


# A small config for fast tests.
TEST_STATICS = Statics(
    grid_h=384,
    grid_w=512,
    resolution=0.05,
    max_points=4096,
    max_clusters=16,
    max_skel_cells=2048,
    max_rows=8,
    max_seeds_per_row=48,
    max_seeds=256,
    max_nodes=256,
    max_edges=1024,
    max_labels=64,
    max_waypoints=20,
    max_path=64,
    max_plan=2048,
    max_delta_points=1024,
    jfa_dynamic_shifts=True,
)

# Tiny config for multi-chip dry runs (compiles in seconds on CPU devices).
DRYRUN_STATICS = Statics(
    grid_h=192,
    grid_w=256,
    resolution=0.05,
    max_points=512,
    max_poly=8,
    max_clusters=8,
    max_skel_cells=512,
    max_rows=4,
    max_seeds_per_row=16,
    max_seeds=128,
    max_nodes=128,
    max_edges=512,
    max_labels=32,
    max_waypoints=12,
    max_path=64,
    max_plan=1024,
    max_delta_points=128,
    skeleton_max_iters=32,
    jfa_dynamic_shifts=True,  # dry runs happen on CPU devices
)

# The Monte-Carlo rollout config (bench_sustained/bench_sweep MC scale):
# TEST_STATICS shapes with the fast-only vmap contract (no exact-fallback
# conds) and the TPU JFA lowering. CPU probes flip jfa_dynamic_shifts=True
# for compile speed (identical results).
MC_STATICS = dataclasses.replace(
    TEST_STATICS, jfa_dynamic_shifts=False, exact_fallbacks=False,
    max_plan=1024)

# Realism-mode MC preset (VERDICT r3 #1a): caps sized from the MEASURED
# curved-row (0.8 m bow) + 15% dropout guard distribution over all 4096
# population keys (benchmarks/CLASSIFY_realism.json, real v5e 2026-08-20):
# 680 lanes tripped GUARD_EDGE_COARSE (corridor-spanning ridge candidates
# longer than 255*res/2 = 6.375 m) and 11 tripped the CCL run-buffer
# overflow; no other capacity bit fired. crossing_nmax_long 512 covers
# ridges to 12.75 m (the orchard diagonal is ~13 m, so nothing valid can
# exceed it), the crossing slot cap scales to match, and the run buffer
# doubles.
MC_REALISM_STATICS = dataclasses.replace(
    MC_STATICS,
    crossing_nmax_long=512,
    crossing_cap_edges_factor=48,
    max_ccl_runs=512,
)

# Benchmark config per BASELINE.md: 200x200 m @ 0.1 m -> 2000x2000 cells.
BENCH_STATICS = Statics(
    grid_h=2000,          # rounded to 2000 (already mult of 8)
    grid_w=2048,
    resolution=0.1,
    max_points=131072,
    max_skel_cells=65536,
    max_rows=32,
    max_seeds_per_row=192,
    max_seeds=4096,
    max_nodes=8192,
    max_edges=32768,
    max_path=768,
    max_plan=4096,
    jfa_pass_pallas=True,  # banded Pallas JFA passes (bit-identical; ~6 ms
    #                        of XLA pass time -> ~0 measured on the v5e)
)


# ---------------------------------------------------------------------------
# Runtime parameters (traced pytree)
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AosParams:
    """Runtime scalar parameters; one-to-one with the reference's ROS params +
    hard-coded constants. All fields are 0-d arrays / python scalars so the
    whole struct is a pytree and can be vmapped."""

    # aos_seed_gen_node (config/aos_planner_params.yaml:55-79)
    clipping_minz: Any = -0.4
    clipping_maxz: Any = 0.5
    clipping_minx: Any = -5.0
    clipping_maxx: Any = 72.0
    clipping_miny: Any = -10.0
    clipping_maxy: Any = 20.0
    cluster_min_length: Any = 2.0
    # ROR (src/aos_seed_gen_node.cpp:236-239)
    ror_radius: Any = 0.2
    ror_min_neighbors: Any = 2
    # polygon margin (src/aos_seed_gen_node.cpp:779,879)
    polygon_margin: Any = 2.5
    # virtual seeds (src/aos_seed_gen_node.cpp:2666-2667,2093)
    virtual_seed_interval: Any = 1.0
    seed_dedupe_dist: Any = 0.5
    seed_raycast_max: Any = 4.0
    seed_raycast_min: Any = 1.0
    # gvd node
    seed_merge_dist: Any = 0.5          # src/aos_gvd_node.cpp:94
    proximity_edge_dist: Any = 0.5      # src/aos_gvd_node.cpp:862
    label_search_min_dist: Any = 0.5    # src/aos_gvd_node.cpp:494
    label_search_radius0: Any = 5.0     # src/aos_gvd_node.cpp:495,721
    label_match_tolerance: Any = 0.1    # src/aos_gvd_node.cpp:918
    # path gen
    initial_waypoint_x: Any = 8.0       # src/aos_path_gen_node.cpp:115
    initial_waypoint_y: Any = 0.0
    initial_arrive_dist: Any = 1.0      # src/aos_path_gen_node.cpp:208
    docking_radius: Any = 0.7           # src/aos_path_gen_node.cpp:249
    heuristic_weight: Any = 3.0         # src/aos_path_gen_node.cpp:824
    min_waypoint_distance: Any = 0.2    # src/aos_path_gen_node.cpp:665
    path_step: Any = 0.2                # src/aos_path_gen_node.cpp:993
    trim_safety_distance: Any = 0.2     # src/aos_path_gen_node.cpp:1575
    # linearization (src/aos_path_linearization_node.cpp)
    linearize_spacing: Any = 0.05
    linearize_max_dev: Any = 0.1
    # state machine (src/aos_state_machine_node.cpp:120-127)
    sm_precise_dist: Any = 0.05
    sm_precise_yaw: Any = 0.0524
    sm_semi_dist: Any = 0.1
    sm_semi_yaw: Any = 0.0873
    sm_approach_dist: Any = 0.5
    sm_skipping_hz: Any = 5
    # gps_to_utm (src/gps_to_utm_node.cpp:59-67)
    utm_zone: Any = 52
    gps_offset_x: Any = -0.65
    gps_offset_y: Any = 0.55


# The reference's hard-coded demo polygon (src/aos_seed_gen_node.cpp:196-199).
HARDCODED_POLYGON = np.array(
    [
        [-1.972916603088379, 7.9420671463012695],
        [-2.0726776123046875, 0.022441387176513672],
        [70.22465515136719, 2.102720260620117],
        [69.48777770996094, 9.786612510681152],
    ],
    dtype=np.float64,
)

# Hard-coded exclusion discs (x, y, radius) (src/aos_seed_gen_node.cpp:487-499).
EXCLUSION_DISCS = np.array(
    [
        [0.646417, 3.83918, 1.0],
        [2.0405, 3.62485, 1.0],
        [65.3711, 2.09755, 1.0],
        [66.9094, 2.07515, 1.0],
        [-1.61309, 5.69933, 1.0],
        [-1.97349, 4.77329, 1.0],
        [-2.11365, 3.74464, 1.0],
        [-2.26381, 2.70848, 1.0],
        [-2.66426, 1.72738, 1.0],
        [68.0229, 2.31687, 1.0],
        [65.4647, 2.18653, 1.0],
    ],
    dtype=np.float64,
)


# Map from YAML keys to AosParams fields (same names where they exist).
_YAML_TO_FIELD = {
    "clipping_minz": "clipping_minz",
    "clipping_maxz": "clipping_maxz",
    "clipping_minx": "clipping_minx",
    "clipping_maxx": "clipping_maxx",
    "clipping_miny": "clipping_miny",
    "clipping_maxy": "clipping_maxy",
    "cluster_min_length": "cluster_min_length",
}
_YAML_TO_STATIC = {
    "grid_resolution": "resolution",
    "inflation_radius": "inflation_radius",
}


def load_yaml(path: str, node: str = "aos_seed_gen_node"):
    """Load the reference's aos_planner_params.yaml schema (global ``/**``
    section plus per-node overrides; reference: config/aos_planner_params.yaml:1-89).

    Returns (params: AosParams, static_overrides: dict) — resolution and
    inflation radius are shape-determining, so they are returned separately
    for the caller to fold into a Statics.
    """
    if not _HAVE_YAML:  # pragma: no cover
        raise RuntimeError("pyyaml unavailable")
    with open(path) as f:
        doc = yaml.safe_load(f)

    merged: dict = {}
    glob = doc.get("/**", {}).get("ros__parameters", {})
    merged.update(glob)
    node_sec = doc.get(f"/{node}", {}).get("ros__parameters", {})
    merged.update(node_sec)

    kwargs = {}
    for yk, fk in _YAML_TO_FIELD.items():
        if yk in merged:
            kwargs[fk] = float(merged[yk])
    statics = {}
    for yk, fk in _YAML_TO_STATIC.items():
        if yk in merged:
            statics[fk] = float(merged[yk])
    return AosParams(**kwargs), statics


def params_as_f32(p: AosParams) -> AosParams:
    """Convert every numeric leaf to a jnp scalar (f32 for floats)."""

    def conv(x):
        if isinstance(x, (int, np.integer)):
            return jnp.int32(x)
        return jnp.float32(x)

    return jax.tree_util.tree_map(conv, p)
