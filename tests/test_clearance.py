"""Edge clearances (extension beyond the reference, which always publishes
0.0; aos_gvd_node.cpp:856): JFA obstacle distance field is exact vs scipy's
EDT, and edge clearances are the min field value along each edge."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aosx.config import TEST_STATICS as S
from aosx.gvd.clearance import edge_clearances, obstacle_distance_field
from aosx.types import GridWorld


def _grid(occ):
    return GridWorld(
        occ=jnp.asarray(occ), origin_x=jnp.float32(0), origin_y=jnp.float32(0),
        h_cells=jnp.int32(occ.shape[0]), w_cells=jnp.int32(occ.shape[1]),
    )


def test_distance_field_matches_scipy():
    ndi = pytest.importorskip("scipy.ndimage")
    rng = np.random.default_rng(0)
    occ = np.zeros((S.grid_h, S.grid_w), np.uint8)
    occ[40:300, 40:460] = rng.random((260, 420)) < 0.003
    d = np.asarray(jax.jit(lambda g: obstacle_distance_field(g, S))(_grid(occ)))
    ref = ndi.distance_transform_edt(~occ.astype(bool)) * S.resolution
    assert np.abs(d - ref).max() < 1e-5


def test_edge_clearance_values():
    occ = np.zeros((S.grid_h, S.grid_w), np.uint8)
    occ[100, 200] = 1  # single obstacle at (10.0, 5.0) m
    g = _grid(occ)
    dist = jax.jit(lambda g: obstacle_distance_field(g, S))(g)
    # an edge passing 1 m below the obstacle: clearance == 1 m (at closest)
    pos = jnp.asarray(np.array([[5.0, 4.0], [15.0, 4.0]], np.float32))
    edges = jnp.asarray(np.array([[0, 1]], np.int32))
    c = np.asarray(
        jax.jit(lambda d, g, p, e: edge_clearances(
            d, g, p, e, jnp.array([True]), S))(dist, g, pos, edges)
    )
    assert abs(c[0] - 1.0) < 0.08  # within ~1 cell of the true 1 m
