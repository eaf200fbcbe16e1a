"""The full jitted perception pass: one pure function
points -> (occupancy, skeleton, rows, seeds), replacing the reference's
globalMapCallback -> processPointCloud -> clusterAndVisualize -> seed
generation chain (aos_seed_gen_node.cpp:230-2268). The ROS topic graph
collapses into function composition (SURVEY.md C17)."""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..config import AosParams, Statics
from ..types import GridWorld, PointCloud, Polygon, SeedSet, TreeRows
from . import points as _points
from . import raster as _raster
from . import rows as _rows
from . import seeds as _seeds
from . import skeleton as _skeleton


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PerceiveOut:
    occupancy: Any      # GridWorld: inflated + borders (/occupancy_grid)
    skeleton: Any       # GridWorld: skeleton without boundary (raycast source)
    skeleton_pub: Any   # GridWorld: + polygon rectangle (/skeletonized_occupancy_grid)
    rows: Any           # TreeRows, reference (discovery) order
    rows_sorted: Any    # TreeRows, /exploration_tree_rows_info order
    seeds: Any          # SeedSet, /voronoi_seeds order
    guards: Any = dataclasses.field(
        default_factory=lambda: jnp.int32(0))  # aosx.guards bitmask


def perceive(
    pc: PointCloud,
    poly: Polygon,
    params: AosParams,
    exclusions,
    s: Statics,
    *,
    ror_method: str = "sorted",
    stencil_mesh=None,
    stencil_axis: str = "space",
) -> PerceiveOut:
    """stencil_mesh: optional jax.sharding.Mesh - runs the grid stencils
    (disc inflation, morph open + Zhang-Suen) row-sharded across the mesh
    axis with ppermute halo exchange (parallel/spatial.py), bit-identical
    to the single-device path (tested in test_parallel.py and exercised by
    __graft_entry__.dryrun_multichip phase 3). The non-stencil stages are
    replicated; sharding them is out of scope while the largest supported
    grid fits on one chip (spatial.py module docstring)."""
    xy, keep, bounds, guards = _points.preprocess(pc, poly, params, exclusions, s, ror_method=ror_method)
    grid = _raster.generate_grid(xy, keep, bounds, s)
    if stencil_mesh is not None:
        from ..parallel.spatial import inflate_sharded, skeletonize_sharded

        inflated = inflate_sharded(grid, s, stencil_mesh, stencil_axis)
        occupancy = _raster.mark_borders(inflated)
        skel = skeletonize_sharded(inflated, s, stencil_mesh, stencil_axis)
    else:
        inflated = _raster.inflate(grid, s)
        occupancy = _raster.mark_borders(inflated)
        skel = _skeleton.skeletonize(inflated, s)
    return perceive_tail(skel, occupancy, poly, params, s, guards)


def perceive_tail(skel, occupancy, poly: Polygon, params: AosParams,
                  s: Statics, pre_guards) -> PerceiveOut:
    """Everything downstream of the skeleton (clusters -> rows -> seeds ->
    published grids): a pure function of (skeleton, occupancy, polygon,
    params). Shared by perceive() and the incremental path
    (aosx/incremental.py) so their bit-equivalence is structural, not
    copy-maintained. pre_guards = the preprocess-era guard bits to seed
    the output bitmask with."""
    clusters = _rows.cluster_grid(skel, poly, params, s)
    rows = _rows.rows_from_clusters(clusters, skel, poly, params, s)
    rows_sorted = _rows.sort_rows(rows)
    seeds = _seeds.generate_seeds(rows, skel, poly, params, s)
    skeleton_pub = _raster.mark_polygon_rect(skel, poly, params.polygon_margin, s)
    return PerceiveOut(
        occupancy=occupancy,
        skeleton=skel,
        skeleton_pub=skeleton_pub,
        rows=rows,
        rows_sorted=rows_sorted,
        seeds=seeds,
        guards=pre_guards | clusters["guards"],
    )
