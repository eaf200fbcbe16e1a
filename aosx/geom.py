"""Vectorized geometry helpers shared across the jitted pipeline."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .types import Polygon


def point_in_polygon(px, py, poly: Polygon):
    """Ray-casting point-in-polygon, faithful to the reference
    (aos_seed_gen_node.cpp:1231-1255): crossing counted only when |dy| > 1e-9.

    px/py: arbitrary (broadcastable) f32 arrays. Returns bool array.
    Polygons with count < 3 return False.
    """
    P = poly.pts.shape[0]
    idx = jnp.arange(P)
    valid = idx < poly.count
    # pj = previous vertex (wrapping within the first `count` vertices)
    jdx = jnp.where(idx == 0, poly.count - 1, idx - 1)
    pi = poly.pts                      # [P,2]
    pj = poly.pts[jnp.clip(jdx, 0, P - 1)]

    px = jnp.asarray(px, jnp.float32)[..., None]   # [..., P]
    py = jnp.asarray(py, jnp.float32)[..., None]

    xi, yi = pi[:, 0], pi[:, 1]
    xj, yj = pj[:, 0], pj[:, 1]
    dy = yj - yi
    safe_dy = jnp.where(jnp.abs(dy) > 1e-9, dy, 1.0)
    crosses = (
        (jnp.abs(dy) > 1e-9)
        & ((yi > py) != (yj > py))
        & (px < (xj - xi) * (py - yi) / safe_dy + xi)
        & valid
    )
    inside = jnp.sum(crosses.astype(jnp.int32), axis=-1) % 2 == 1
    return inside & (poly.count >= 3)


def active_bounds(poly: Polygon, clip_xy, margin):
    """getActiveBounds (aos_seed_gen_node.cpp:873-890)."""
    minx, maxx, miny, maxy = poly.bbox()
    has_poly = poly.count > 0
    return (
        jnp.where(has_poly, minx - margin, clip_xy[0]),
        jnp.where(has_poly, maxx + margin, clip_xy[1]),
        jnp.where(has_poly, miny - margin, clip_xy[2]),
        jnp.where(has_poly, maxy + margin, clip_xy[3]),
    )


def normalized_angle(a):
    """aos_state_machine_node.cpp:196-204 (single-wrap, like the reference).

    A single conditional wrap only normalizes |a| <= 3*pi (a = 3.5*pi would
    map to 1.5*pi, still out of range). The contract actually relied on is
    narrower: a must be a DIFFERENCE of two angles that each satisfy the
    quaternion-yaw invariant (-pi, pi], so |a| < 2*pi. Use wrap_angle at
    any boundary where that invariant is not guaranteed."""
    a = jnp.where(a > jnp.pi, a - 2 * jnp.pi, a)
    a = jnp.where(a < -jnp.pi, a + 2 * jnp.pi, a)
    return a


def wrap_angle(a):
    """Full wrap to [-pi, pi] for arbitrarily large inputs. Bitwise no-op
    for |a| <= pi (round-half-to-even keeps +-pi fixed), so applying it
    defensively at an API boundary cannot perturb already-wrapped poses.
    The reference never needs this - its yaws come out of tf2 quaternion
    conversion, which cannot represent a multi-wrap angle."""
    two_pi = jnp.float32(2 * jnp.pi)
    return a - two_pi * jnp.round(a / two_pi)
