"""Parity of the full jitted perceive() (incl. seed generation) vs the oracle."""

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
    xyz, poly = make_orchard_np(OrchardSpec(n_rows=3, row_len=12.0), seed=3)
    ores = op.perceive(xyz, poly)

    n = len(xyz)
    buf = np.zeros((S.max_points, 3), np.float32)
    buf[:n] = xyz
    valid = np.zeros(S.max_points, bool)
    valid[:n] = True
    pc = PointCloud(xyz=jnp.asarray(buf), valid=jnp.asarray(valid))
    poly_j = Polygon.from_array(poly.astype(np.float32), S)
    params = params_as_f32(AosParams())
    excl = np.zeros((S.max_exclusions, 3), np.float32)

    fn = jax.jit(lambda pc, poly, params, excl: perceive(
        pc, poly, params, excl, S, ror_method="exact"))
    jres = fn(pc, poly_j, params, excl)
    return ores, jres


def test_seed_count(both):
    ores, jres = both
    n = int(np.asarray(jres.seeds.valid).sum())
    assert n == len(ores.seeds), (n, len(ores.seeds))


def test_seed_positions_and_order(both):
    ores, jres = both
    n = int(np.asarray(jres.seeds.valid).sum())
    got = np.asarray(jres.seeds.xy)[:n]
    ref = ores.seeds
    err = np.abs(got - ref).max()
    assert err < 1e-3, f"max seed position error {err}"


def test_seed_kinds(both):
    ores, jres = both
    n = int(np.asarray(jres.seeds.valid).sum())
    kinds = np.asarray(jres.seeds.kind)[:n]
    nv, nr, ne = (len(ores.virtual_seeds), len(ores.ray_seeds), len(ores.endpoint_seeds))
    assert (kinds[:nv] == 0).all()
    assert (kinds[nv : nv + nr] == 2).all()
    assert (kinds[nv + nr :] == 3).all()


def test_rows_in_pipeline(both):
    ores, jres = both
    nv = int(np.asarray(jres.rows.valid).sum())
    assert nv == len(ores.rows_all)
