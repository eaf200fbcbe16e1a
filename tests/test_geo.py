"""Geo math validation: Krueger-series UTM against an independent meridian-
arc integration, plus the 2-point alignment protocol."""

import json
import math

import numpy as np
import pytest

from aosx import geo


def test_central_meridian_easting():
    # exactly on the central meridian of zone 52 (129 E)
    x, y, zone = geo.utm_forward(36.0, 129.0, 52)
    assert abs(float(x) - 500000.0) < 1e-6
    assert zone == 52


def test_northing_equals_scaled_meridian_arc():
    from scipy.integrate import quad

    a, f = 6378137.0, 1 / 298.257223563
    e2 = f * (2 - f)

    def M(phi):
        return a * (1 - e2) / (1 - e2 * math.sin(phi) ** 2) ** 1.5

    for lat in (10.0, 36.111, 52.0):
        arc, _ = quad(M, 0.0, math.radians(lat), epsabs=1e-6)
        _, y, _ = geo.utm_forward(lat, 129.0, 52)
        assert abs(float(y) - 0.9996 * arc) < 1e-3, lat


def test_small_offset_scale():
    # near the central meridian, easting ~ k0 * nu * cos(phi) * dlambda
    lat = 36.0
    dlon = 0.01
    x0, y0, _ = geo.utm_forward(lat, 129.0, 52)
    x1, y1, _ = geo.utm_forward(lat, 129.0 + dlon, 52)
    a, f = 6378137.0, 1 / 298.257223563
    e2 = f * (2 - f)
    nu = a / math.sqrt(1 - e2 * math.sin(math.radians(lat)) ** 2)
    expect = 0.9996 * nu * math.cos(math.radians(lat)) * math.radians(dlon)
    assert abs((float(x1) - float(x0)) - expect) < 0.05


def test_zone_selection():
    assert geo.utm_zone_of(128.64) == 52
    assert geo.utm_zone_of(-73.5) == 18


def test_two_point_alignment_roundtrip():
    rng = np.random.default_rng(0)
    theta = 0.7
    tx, ty = 123.4, -56.7
    ref = geo.Transform2D(tx, ty, theta)
    utm0 = (450000.0, 3990000.0)
    utm1 = (450007.0, 3990003.0)
    base0 = ref.apply(*utm0)
    base1 = ref.apply(*utm1)
    t = geo.compute_initial_transform(base0, utm0, base1, utm1)
    for p in [(450002.0, 3990001.0), (449990.0, 3990010.0)]:
        gx, gy = t.apply(*p)
        ex, ey = ref.apply(*p)
        assert abs(gx - ex) < 1e-6 and abs(gy - ey) < 1e-6


def test_aligner_protocol(tmp_path):
    """Full bring-up: GPS fixes + odometry -> transform after 5 m travel ->
    polygon conversion (the reference's gps_polygon.json schema)."""
    zone = 52
    # ground truth: base = R(theta) * utm + t
    truth = geo.Transform2D(-445000.0, -3990000.0, 0.0)
    al = geo.GpsAligner(zone=zone, gps_offset=(0.0, 0.0))

    lat0, lon0 = 36.1115, 128.6421
    x0, y0, _ = geo.utm_forward(lat0, lon0, zone)
    # robot drives east ~6 m in UTM; fabricate consistent GPS + odometry
    for i, t in enumerate(np.linspace(0, 10, 11)):
        # GPS at a slightly offset lon to move in UTM x
        dlon = i * 6.5e-6 * 10  # ~ 6 m over the run
        lat, lon = lat0, lon0 + dlon
        al.on_gps(lat, lon, t)
        x, y, _ = geo.utm_forward(lat, lon, zone)
        bx, by = truth.apply(float(x), float(y))
        aligned = al.on_odom(bx, by, (0, 0, 0, 1), t)
    assert aligned
    # recovered transform reproduces base coords
    gx, gy = al.transform.apply(float(x0), float(y0))
    ex, ey = truth.apply(float(x0), float(y0))
    assert abs(gx - ex) < 0.05 and abs(gy - ey) < 0.05

    # polygon conversion through the real JSON schema
    doc = {
        "points": [
            {"latitude": lat0, "longitude": lon0},
            {"latitude": lat0 + 4e-5, "longitude": lon0},
            {"latitude": lat0 + 4e-5, "longitude": lon0 + 6e-5},
        ]
    }
    p = tmp_path / "gps_polygon.json"
    p.write_text(json.dumps(doc))
    poly = geo.convert_gps_polygon(str(p), al)
    assert poly.shape == (3, 2)
    # ~4.4 m in latitude between pts 0 and 1
    d01 = np.linalg.norm(poly[1] - poly[0])
    assert 4.0 < d01 < 5.0
