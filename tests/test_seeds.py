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


def _dense_raycast(grid, start, direction, active, max_dist, min_dist, s):
    """Loop-faithful dense reference for raycast_bounded (the pre-coarse
    formulation): one [N, n_steps] lookup, first hit by argmax."""
    from aosx.perceive.raster import edge_replicated

    res = np.float32(s.resolution)
    step = s.resolution * 0.5
    n_steps = int(max_dist / step)
    occ_ext = np.asarray(edge_replicated(grid))
    H, W = occ_ext.shape
    k = np.arange(1, n_steps + 1, dtype=np.float32)[None, :]
    px = start[:, 0:1] + direction[:, 0:1] * (k * step)
    py = start[:, 1:2] + direction[:, 1:2] * (k * step)
    d = k * step * np.sqrt(np.sum(direction * direction, axis=1))[:, None]
    gx = np.clip(np.floor((px - float(grid.origin_x)) / res).astype(np.int32), 0, W - 1)
    gy = np.clip(np.floor((py - float(grid.origin_y)) / res).astype(np.int32), 0, H - 1)
    occ = occ_ext.reshape(-1)[gy * W + gx] == 1
    cand = occ & (d >= min_dist) & active[:, None]
    hit = np.any(cand, axis=1)
    first = np.argmax(cand, axis=1)
    rows = np.arange(start.shape[0])
    hit_xy = np.stack([px[rows, first], py[rows, first]], axis=1)
    hit_xy = np.where(hit[:, None], hit_xy, 0.0)
    return hit, hit_xy


def test_raycast_coarse_to_fine_matches_dense():
    """The coarse-to-fine raycast must reproduce the dense first-hit
    semantics exactly: random occupancy speckle, random unit directions,
    rays starting inside and outside the grid (clamped lookups)."""
    from aosx.perceive.seeds import raycast_bounded
    from aosx.types import GridWorld

    rng = np.random.default_rng(7)
    h, w = S.grid_h, S.grid_w
    occ = (rng.random((h, w)) < 0.01).astype(np.int8)
    grid = GridWorld(
        occ=jnp.asarray(occ),
        origin_x=jnp.float32(0.0), origin_y=jnp.float32(0.0),
        h_cells=jnp.int32(h), w_cells=jnp.int32(w),
    )
    N = 512
    start = rng.uniform([-1.0, -1.0], [w * S.resolution + 1.0, h * S.resolution + 1.0],
                        (N, 2)).astype(np.float32)
    ang = rng.uniform(0, 2 * np.pi, N)
    direction = np.stack([np.cos(ang), np.sin(ang)], 1).astype(np.float32)
    active = rng.random(N) < 0.9

    hit_d, xy_d = _dense_raycast(grid, start, direction, active, 4.0, 1.0, S)
    hit_c, xy_c = jax.jit(
        lambda g, st, di, ac: raycast_bounded(g, st, di, ac, 4.0, 1.0, S)
    )(grid, jnp.asarray(start), jnp.asarray(direction), jnp.asarray(active))
    hit_c = np.asarray(hit_c)
    xy_c = np.asarray(xy_c)
    assert (hit_c == hit_d).all()
    assert np.abs(xy_c - xy_d).max() < 1e-4
