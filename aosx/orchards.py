"""Procedural orchard generator for Monte-Carlo planner evaluation.

The reference consumes a LIO-SAM global map of a real orchard
(launch/run.launch.py feeds /lio_sam/mapping/global_map). For batched
evaluation we synthesize orchard point clouds with the same structure the
perception stack expects: parallel tree rows (trunk point clusters), ground
noise, and an exploration polygon around the rows.

Two implementations:
- ``make_orchard_np``  : NumPy, for oracle tests.
- ``make_orchard``     : pure-JAX (PRNG-key driven, fixed shapes), vmappable,
                         for on-device Monte-Carlo rollouts.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .config import Statics
from .types import PointCloud, Polygon


@dataclasses.dataclass(frozen=True)
class OrchardSpec:
    n_rows: int = 4                  # number of tree rows
    row_len: float = 18.0            # row length (m)
    row_spacing: float = 4.0         # spacing between rows (m)
    tree_spacing: float = 1.0        # trunk spacing along a row (m)
    trunk_pts: int = 24              # points per trunk
    trunk_radius: float = 0.15       # trunk point scatter (m)
    noise_pts: int = 64              # stray noise points (mostly ROR-removed)
    origin: Tuple[float, float] = (4.0, 3.0)  # first row start (world m)
    jitter: float = 0.15             # per-tree position jitter (m)
    polygon_pad: float = 1.5         # polygon margin around the row bbox
    # --- realism knobs (default 0.0 = the classic rectangular orchard; the
    # generators are BIT-IDENTICAL to their pre-knob outputs at defaults:
    # both knobs gate their PRNG draws / adds behind static Python branches)
    row_curve: float = 0.0           # max lateral bow of a row (m): rows
    # follow a sin arc like terrain-contoured plantings; stresses endpoint
    # extraction + linearization (more regression segments per path)
    dropout: float = 0.0             # per-tree missing probability: dead or
    # removed trees leave gaps that can split a skeleton row into several
    # clusters - the cluster/waypoint machinery must cope (real orchards do
    # this; the reference's demo field relies on continuous rows)


def make_orchard_np(spec: OrchardSpec, seed: int = 0):
    """Returns (xyz [N,3] float64, polygon [4,2] float64)."""
    rng = np.random.default_rng(seed)
    pts = []
    ox, oy = spec.origin
    n_trees = int(spec.row_len / spec.tree_spacing) + 1
    for r in range(spec.n_rows):
        y = oy + r * spec.row_spacing
        for t in range(n_trees):
            x = ox + t * spec.tree_spacing
            cx = x + rng.normal(0, spec.jitter)
            cy = y + rng.normal(0, spec.jitter)
            if spec.row_curve != 0.0:
                cy += spec.row_curve * np.sin(np.pi * t / max(n_trees - 1, 1))
            ang = rng.uniform(0, 2 * np.pi, spec.trunk_pts)
            rad = rng.uniform(0, spec.trunk_radius, spec.trunk_pts)
            z = rng.uniform(-0.2, 0.4, spec.trunk_pts)
            if spec.dropout > 0.0 and rng.uniform() < spec.dropout:
                continue  # dead / removed tree: a gap in the row
            pts.append(
                np.stack([cx + rad * np.cos(ang), cy + rad * np.sin(ang), z], 1)
            )
    # stray noise (isolated points -> removed by ROR)
    minx, maxx = ox - 2, ox + spec.row_len + 2
    miny, maxy = oy - 2, oy + (spec.n_rows - 1) * spec.row_spacing + 2
    noise = np.stack(
        [
            rng.uniform(minx, maxx, spec.noise_pts),
            rng.uniform(miny, maxy, spec.noise_pts),
            rng.uniform(-0.3, 0.4, spec.noise_pts),
        ],
        1,
    )
    xyz = np.concatenate(pts + [noise], 0)
    ytop = oy + (spec.n_rows - 1) * spec.row_spacing
    if spec.row_curve > 0.0:
        ytop += spec.row_curve  # bowed rows reach row_curve past the grid
    poly = np.array(
        [
            [ox - spec.polygon_pad, oy - spec.polygon_pad],
            [ox + spec.row_len + spec.polygon_pad, oy - spec.polygon_pad],
            [ox + spec.row_len + spec.polygon_pad, ytop + spec.polygon_pad],
            [ox - spec.polygon_pad, ytop + spec.polygon_pad],
        ]
    )
    return xyz, poly


def make_orchard(key: jax.Array, spec: OrchardSpec, s: Statics):
    """Pure-JAX orchard generator (fixed shapes, vmappable over keys).

    Returns (PointCloud, Polygon). Uses the same structure as make_orchard_np
    but with JAX PRNG; not bit-identical to the NumPy version.
    """
    n_trees = int(spec.row_len / spec.tree_spacing) + 1
    n_trunk = spec.n_rows * n_trees * spec.trunk_pts
    n_total = n_trunk + spec.noise_pts
    assert n_total <= s.max_points, (n_total, s.max_points)

    if spec.dropout > 0.0:
        k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
    else:
        k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    ox, oy = spec.origin

    rr = jnp.arange(spec.n_rows)
    tt = jnp.arange(n_trees)
    cy0 = oy + rr[:, None] * spec.row_spacing           # [R,1]
    cx0 = ox + tt[None, :] * spec.tree_spacing          # [1,T]
    jit_x = spec.jitter * jax.random.normal(k1, (spec.n_rows, n_trees))
    jit_y = spec.jitter * jax.random.normal(k2, (spec.n_rows, n_trees))
    if spec.row_curve != 0.0:  # static gate keeps defaults bit-identical
        jit_y = jit_y + spec.row_curve * jnp.sin(
            jnp.pi * tt / max(n_trees - 1, 1))[None, :]
    cx = (cx0 + jit_x)[..., None]                        # [R,T,1]
    cy = (cy0 + jit_y)[..., None]

    ang = jax.random.uniform(k3, (spec.n_rows, n_trees, spec.trunk_pts), maxval=2 * jnp.pi)
    rad = jax.random.uniform(k4, (spec.n_rows, n_trees, spec.trunk_pts), maxval=spec.trunk_radius)
    z = jax.random.uniform(k5, (spec.n_rows, n_trees, spec.trunk_pts), minval=-0.2, maxval=0.4)
    trunk = jnp.stack(
        [cx + rad * jnp.cos(ang), cy + rad * jnp.sin(ang), z], -1
    ).reshape(n_trunk, 3)

    minx, maxx = ox - 2, ox + spec.row_len + 2
    miny, maxy = oy - 2, oy + (spec.n_rows - 1) * spec.row_spacing + 2
    noise = jax.random.uniform(
        k6,
        (spec.noise_pts, 3),
        minval=jnp.array([minx, miny, -0.3]),
        maxval=jnp.array([maxx, maxy, 0.4]),
    )
    xyz = jnp.zeros((s.max_points, 3), jnp.float32)
    xyz = xyz.at[:n_trunk].set(trunk.astype(jnp.float32))
    xyz = xyz.at[n_trunk : n_trunk + spec.noise_pts].set(noise.astype(jnp.float32))
    valid = jnp.arange(s.max_points) < n_total
    if spec.dropout > 0.0:
        # fixed shapes: dropped trees keep their buffer slots, only their
        # validity flips (the preprocess mask path handles arbitrary valid)
        keep_tree = jax.random.uniform(k7, (spec.n_rows, n_trees)) >= spec.dropout
        trunk_valid = jnp.repeat(
            keep_tree.reshape(-1), spec.trunk_pts, total_repeat_length=n_trunk)
        valid = valid & jnp.concatenate(
            [trunk_valid,
             jnp.ones((s.max_points - n_trunk,), bool)])

    ytop = oy + (spec.n_rows - 1) * spec.row_spacing
    if spec.row_curve > 0.0:
        ytop += spec.row_curve
    poly_np = np.array(
        [
            [ox - spec.polygon_pad, oy - spec.polygon_pad],
            [ox + spec.row_len + spec.polygon_pad, oy - spec.polygon_pad],
            [ox + spec.row_len + spec.polygon_pad, ytop + spec.polygon_pad],
            [ox - spec.polygon_pad, ytop + spec.polygon_pad],
        ],
        np.float32,
    )
    return PointCloud(xyz=xyz, valid=valid), Polygon.from_array(poly_np, s)
