"""aosx — TPU-native orchard exploration engine.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
sangbeom0321/Active-orchard-slam (ROS2 C++): the perceive -> GVD -> plan ->
control loop as a single jitted, vmappable `step(state, obs) -> (state, cmd)`
over fixed-shape padded arrays, batched across orchards with shard_map over a
TPU mesh. See SURVEY.md for the reference layer map and parity contract.
"""

from .config import AosParams, Statics, TEST_STATICS, BENCH_STATICS
from .types import (
    ControlState,
    GridWorld,
    GvdGraph,
    MissionState,
    Path,
    PointCloud,
    Polygon,
    SeedSet,
    TreeRows,
    Waypoints,
)

__version__ = "0.1.0"
