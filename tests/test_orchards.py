"""Procedural orchard generator: realism knobs (curved rows, tree dropout).

The classic rectangular generator is covered implicitly by every episode /
rollout test (seed-pinned, so a default-stream change would fail the suite).
These tests pin the knobs: fixed shapes under dropout (vmappable), gaps that
actually remove trees, and the full perceive -> GVD -> plan world build
coping with bowed, gap-ridden rows — the degradations real orchards have
(dead trees, terrain-contoured planting) that the reference's continuous
demo-field rows never exercise."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from aosx import engine
from aosx.config import TEST_STATICS as S, AosParams, params_as_f32
from aosx.orchards import OrchardSpec, make_orchard, make_orchard_np

BASE = OrchardSpec(n_rows=3, row_len=12.0, row_spacing=3.5, tree_spacing=1.0,
                   trunk_pts=16, noise_pts=32, origin=(5.0, 4.0))


def test_dropout_fixed_shapes_and_gaps():
    """Dropout flips validity in place: same buffer shapes (vmappable), fewer
    valid points, holes aligned to whole trunks (trunk_pts-sized groups)."""
    key = jax.random.PRNGKey(3)
    pc0, _ = make_orchard(key, BASE, S)
    spec = dataclasses.replace(BASE, dropout=0.3)
    pc1, _ = make_orchard(key, spec, S)

    assert pc0.xyz.shape == pc1.xyz.shape and pc0.valid.shape == pc1.valid.shape
    n0, n1 = int(pc0.valid.sum()), int(pc1.valid.sum())
    assert n1 < n0, (n0, n1)
    # invalidated slots come in whole-trunk groups within the trunk section
    n_trees = int(spec.row_len / spec.tree_spacing) + 1
    n_trunk = spec.n_rows * n_trees * spec.trunk_pts
    tv = np.asarray(pc1.valid)[:n_trunk].reshape(-1, spec.trunk_pts)
    assert ((tv.all(axis=1)) | (~tv.any(axis=1))).all()
    assert (n0 - n1) % spec.trunk_pts == 0

    # vmap over keys: static shapes by construction
    keys = jax.random.split(jax.random.PRNGKey(0), 4)
    pcs, _ = jax.vmap(lambda k: make_orchard(k, spec, S))(keys)
    counts = np.asarray(pcs.valid.sum(axis=1))
    assert (counts <= n0).all() and len(set(counts.tolist())) > 1


def test_np_knobs_drop_trees_and_bow_rows():
    xyz0, poly0 = make_orchard_np(BASE, seed=7)
    spec = dataclasses.replace(BASE, dropout=0.3, row_curve=1.0)
    xyz1, poly1 = make_orchard_np(spec, seed=7)
    assert len(xyz1) < len(xyz0)
    # polygon grows with the bow so curved rows stay inside it
    assert poly1[2, 1] > poly0[2, 1]
    # every trunk point is inside the padded polygon bbox
    trunk = xyz1[:-spec.noise_pts]
    assert (trunk[:, 1] <= poly1[2, 1]).all() and (trunk[:, 1] >= poly1[0, 1]).all()


def test_degraded_orchard_builds_world():
    """Curved rows with gaps still produce a navigable world: clusters found,
    graph nodes + waypoints present, nothing nonfinite. Gaps may split rows
    into MORE clusters than n_rows — the machinery must cope, not crash."""
    spec = dataclasses.replace(BASE, dropout=0.15, row_curve=0.8)
    params = params_as_f32(AosParams())
    excl = jnp.zeros((S.max_exclusions, 3), jnp.float32)

    def build(key):
        pc, poly = make_orchard(key, spec, S)
        return engine.prepare_world(pc, poly, params, excl, S,
                                    ror_method="exact")

    world = jax.jit(build)(jax.random.PRNGKey(11))
    assert int(world.graph.num_nodes) > 0
    nwp = int(world.waypoints.count)
    assert nwp >= 2
    wp_xy = np.asarray(world.waypoints.xy)[:nwp]
    assert np.isfinite(wp_xy).all()
    # the tour remains drivable end-to-end on the degraded world: the robot
    # moves, every pose stays finite, and no per-tick output goes nonfinite
    final, metrics = jax.jit(
        lambda w: engine.episode(w, params, S, 900))(world)
    xy = np.asarray(metrics["xy"])
    assert np.isfinite(xy).all()
    travel = np.sqrt(((xy[1:] - xy[:-1]) ** 2).sum(1)).sum()
    assert travel > 1.0, travel
    assert int(np.asarray(metrics["nonfinite"]).max()) == 0


def test_realism_preset_clears_capacity_flags():
    """MC_REALISM_STATICS (VERDICT r3 #1a): caps sized from the MEASURED
    curved-row/dropout guard distribution (benchmarks/CLASSIFY_realism.json:
    680/4096 GUARD_EDGE_COARSE + 11 CCL run overflows at MC_STATICS). Keys
    that flag at the default MC caps must build CLEAN (guards == 0) at the
    realism preset — the preset exists precisely so those 690 lanes stop
    being invalidated."""
    from aosx.config import MC_REALISM_STATICS, MC_STATICS

    S0 = dataclasses.replace(MC_STATICS, jfa_dynamic_shifts=True)
    S1 = dataclasses.replace(MC_REALISM_STATICS, jfa_dynamic_shifts=True)
    spec = OrchardSpec(
        n_rows=4, row_len=12.0, row_spacing=3.5, tree_spacing=1.0,
        trunk_pts=16, noise_pts=64, origin=(4.0, 3.0), polygon_pad=1.5,
        row_curve=0.8, dropout=0.15,
    )
    params = params_as_f32(AosParams())
    keys = jax.random.split(jax.random.PRNGKey(0), 4096)

    def build(statics):
        excl = jnp.zeros((statics.max_exclusions, 3), jnp.float32)
        return jax.jit(lambda k: engine.prepare_world(
            *make_orchard(k, spec, statics), params, excl, statics,
            ror_method="sorted").guards)

    b0, b1 = build(S0), build(S1)
    # ids 2 and 7 are flagged_ids[0:2] of CLASSIFY_realism.json
    for kid in (2, 7):
        g0 = int(np.asarray(b0(keys[kid])))
        g1 = int(np.asarray(b1(keys[kid])))
        assert g0 != 0, f"key {kid} no longer flags at MC_STATICS " \
            "(population drifted? re-run probe_classify_keys)"
        assert g1 == 0, f"key {kid} still flags at MC_REALISM_STATICS: {g1}"
