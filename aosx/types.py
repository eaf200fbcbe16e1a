"""Core pytree types for the aosx engine.

Every structure is a fixed-shape padded array + validity mask/count, so the
whole perceive -> GVD -> plan -> control pipeline jits once and vmaps over an
orchard batch axis. Field semantics mirror the reference message schemas:

- GridWorld   <- nav_msgs/OccupancyGrid        (values {0,1} here; 0/100 at IO edge)
- SeedSet     <- geometry_msgs/PoseArray       (/voronoi_seeds)
- TreeRows    <- /exploration_tree_rows_info pairs (reference: aos_seed_gen_node.cpp:2546-2582)
- GvdGraph    <- msg/GvdGraph.msg:1-59         (ragged labels densified)
- MissionState / ControlState <- aos_path_gen_node + aos_state_machine_node state
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from .config import Statics


def _dc(cls):
    return jax.tree_util.register_dataclass(dataclasses.dataclass(frozen=True)(cls))


@_dc
class PointCloud:
    """Fixed-size point buffer. xyz: [N,3] f32, valid: [N] bool."""

    xyz: Any
    valid: Any

    @staticmethod
    def zeros(s: Statics) -> "PointCloud":
        return PointCloud(
            xyz=jnp.zeros((s.max_points, 3), jnp.float32),
            valid=jnp.zeros((s.max_points,), bool),
        )


@_dc
class Polygon:
    """Exploration area polygon. pts: [P,2] f32, count: i32 (0 => none)."""

    pts: Any
    count: Any

    @staticmethod
    def from_array(arr, s: Statics) -> "Polygon":
        import numpy as np

        arr = np.asarray(arr, np.float32)
        n = arr.shape[0]
        pts = np.zeros((s.max_poly, 2), np.float32)
        pts[:n] = arr
        return Polygon(pts=jnp.asarray(pts), count=jnp.int32(n))

    def bbox(self):
        """(minx, maxx, miny, maxy) of the valid vertices."""
        idx = jnp.arange(self.pts.shape[0])
        m = idx < self.count
        big = jnp.float32(3.4e38)
        xs, ys = self.pts[:, 0], self.pts[:, 1]
        minx = jnp.min(jnp.where(m, xs, big))
        maxx = jnp.max(jnp.where(m, xs, -big))
        miny = jnp.min(jnp.where(m, ys, big))
        maxy = jnp.max(jnp.where(m, ys, -big))
        return minx, maxx, miny, maxy


@_dc
class GridWorld:
    """Occupancy grid. occ: [H,W] uint8 {0,1}; live region is
    [0:h_cells, 0:w_cells]; world = origin + cell * res (cell corner, like the
    reference's worldToGrid; aos_seed_gen_node.cpp:760-769)."""

    occ: Any
    origin_x: Any
    origin_y: Any
    h_cells: Any
    w_cells: Any

    def world_to_cell(self, x, y, res):
        gx = jnp.floor((x - self.origin_x) / res).astype(jnp.int32)
        gy = jnp.floor((y - self.origin_y) / res).astype(jnp.int32)
        return gx, gy


@_dc
class SeedSet:
    """Voronoi seeds. xy: [S,2] f32, valid: [S] bool, kind: [S] i8
    (0=virtual base, 1=virtual ray, 2=endpoint ray, 3=row endpoint, 4=real)."""

    xy: Any
    valid: Any
    kind: Any


@_dc
class TreeRows:
    """Tree rows (sorted by center y then x; reference aos_seed_gen_node.cpp:2552-2560).
    ep1/ep2 follow the GVD node's convention: ep1 = smaller x = "TOP"
    (aos_gvd_node.cpp:134-145)."""

    center: Any   # [R,2]
    ep1: Any      # [R,2]
    ep2: Any      # [R,2]
    length: Any   # [R]
    valid: Any    # [R] bool


@_dc
class GvdGraph:
    """Padded GvdGraph (reference msg/GvdGraph.msg:1-59).

    nodes:[N,2] f32; node_valid:[N]; node_labels:[N] i32 bitmask (1=TL,2=TR,
    4=BL,8=BR); per-(cluster,label) assignment table:
      label_node:[C,4] i32   node index for (cluster c, label t in TL,TR,BL,BR)
                              (-1 if none) — the dense equivalent of
                              node_label_clusters/types/counts.
    edges:[E,2] i32; edge_valid:[E]; edge_lengths:[E] f32;
    edge_clearances:[E] f32 (always 0 in the reference; aos_gvd_node.cpp:856).
    """

    nodes: Any
    node_valid: Any
    node_labels: Any
    label_node: Any
    edges: Any
    edge_valid: Any
    edge_lengths: Any
    edge_clearances: Any
    num_nodes: Any
    num_edges: Any
    # i32 bitmask of tripped approximation guards (aosx.guards); not part of
    # the reference message schema, defaults to 0 for hand-built graphs
    guards: Any = dataclasses.field(default_factory=lambda: jnp.int32(0))


@_dc
class Waypoints:
    """Boustrophedon waypoint tour. xy:[W,2], node_idx:[W] i32 (-1 = off-graph,
    e.g. origin), count: i32."""

    xy: Any
    node_idx: Any
    count: Any


@_dc
class Path:
    """Planned path, fixed buffer. xy:[P,2], yaw:[P], count:i32."""

    xy: Any
    yaw: Any
    count: Any


@_dc
class MissionState:
    """Mission planner state (reference aos_path_gen_node.cpp:151-160 flags).

    status codes (/aos/path_planning_status strings):
      0 = Success, 1 = Failed, 2 = Returning..., 3 = Exploration Complete
    """

    target_wp: Any                 # current_target_waypoint_index_
    prev_wp: Any                   # previous_waypoint_index_
    initial_reached: Any           # initial_waypoint_reached_
    exploration_completed: Any
    waiting_for_docking: Any
    status: Any
    origin_appended: Any           # whether origin was appended to the tour

    @staticmethod
    def initial():
        return MissionState(
            target_wp=jnp.int32(-1),
            prev_wp=jnp.int32(-1),
            initial_reached=jnp.bool_(False),
            exploration_completed=jnp.bool_(False),
            waiting_for_docking=jnp.bool_(False),
            status=jnp.int32(1),
            origin_appended=jnp.bool_(False),
        )


@_dc
class ControlState:
    """State-machine node state (reference aos_state_machine_node.cpp:46-56)."""

    mode: Any              # current_mode_ (0 follow, 1 precise, 2 semi, 3 stop)
    is_path_received: Any
    goal_initialized: Any
    odom_cnt: Any
    goal_xy: Any           # [2]
    goal_yaw: Any

    @staticmethod
    def initial():
        return ControlState(
            mode=jnp.int32(0),
            is_path_received=jnp.bool_(False),
            goal_initialized=jnp.bool_(False),
            odom_cnt=jnp.int32(0),
            goal_xy=jnp.zeros((2,), jnp.float32),
            goal_yaw=jnp.float32(0.0),
        )


STATUS_STRINGS = {0: "Success", 1: "Failed", 2: "Returning...", 3: "Exploration Complete"}
