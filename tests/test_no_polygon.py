"""No-polygon operating mode (the reference falls back to the clipping
params for bounds and grid-border boundaries; aos_seed_gen_node.cpp:884-889,
799-801): bit-parity against the oracle without an exploration area."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aosx.config import TEST_STATICS as S, AosParams, params_as_f32
from aosx.oracle import perceive as op
from aosx.orchards import OrchardSpec, make_orchard_np
from aosx.perceive import perceive
from aosx.types import PointCloud, Polygon


@pytest.fixture(scope="module")
def both():
    xyz, _ = make_orchard_np(OrchardSpec(n_rows=2, row_len=8.0, origin=(3.0, 3.0)), seed=7)
    ores = op.perceive(xyz, None, clip_xy=(0.0, 14.0, 0.0, 10.0))
    buf = np.zeros((S.max_points, 3), np.float32)
    buf[: len(xyz)] = xyz
    valid = np.zeros(S.max_points, bool)
    valid[: len(xyz)] = True
    pc = PointCloud(xyz=jnp.asarray(buf), valid=jnp.asarray(valid))
    poly = Polygon.from_array(np.zeros((0, 2), np.float32), S)
    params = params_as_f32(
        AosParams(clipping_minx=0.0, clipping_maxx=14.0, clipping_miny=0.0, clipping_maxy=10.0)
    )
    excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)
    jres = jax.jit(lambda *a: perceive(*a, S, ror_method="exact"))(pc, poly, params, excl)
    return ores, jres


def test_grids_no_polygon(both):
    ores, jres = both
    h, w = int(jres.occupancy.h_cells), int(jres.occupancy.w_cells)
    assert (h, w) == ores.occupancy.data.shape
    assert (np.asarray(jres.occupancy.occ)[:h, :w] == (ores.occupancy.data == 100)).all()
    # no polygon -> published skeleton uses grid-border fallback
    assert (np.asarray(jres.skeleton_pub.occ)[:h, :w] == (ores.skeleton_pub.data == 100)).all()


def test_rows_and_seeds_no_polygon(both):
    ores, jres = both
    assert int(np.asarray(jres.rows.valid).sum()) == len(ores.rows_all)
    n = int(np.asarray(jres.seeds.valid).sum())
    assert n == len(ores.seeds)
    assert np.abs(np.asarray(jres.seeds.xy)[:n] - ores.seeds).max() < 1e-3
