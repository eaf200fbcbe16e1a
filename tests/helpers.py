"""Shared test helpers (imported by test modules via pytest's test-dir
sys.path insertion). Keeping these in one place matters for the parity
story: the serving, incremental, and plan-cache suites must generate the
EXACT same growing-frame schedules and use the same bitwise-equality
notion, or cross-file "bit-identical" claims silently weaken."""

import numpy as np
import jax.numpy as jnp

from aosx.orchards import OrchardSpec, make_orchard_np
from aosx.types import PointCloud


def frames_growing(fracs, statics, seed=5, spec=None):
    """Growing-SLAM-map frame buffers: one shuffled orchard cloud revealed
    in increasing fractions. Returns (bufs [F,N,3] f32, valids [F,N] bool,
    polygon [4,2] f64)."""
    spec = spec or OrchardSpec(n_rows=3, row_len=12.0, origin=(6.0, 4.0))
    xyz, poly = make_orchard_np(spec, seed=seed)
    rng = np.random.default_rng(0)
    xyz = xyz[rng.permutation(len(xyz))]
    bufs = np.zeros((len(fracs), statics.max_points, 3), np.float32)
    valids = np.zeros((len(fracs), statics.max_points), bool)
    for f, frac in enumerate(fracs):
        n = int(len(xyz) * frac)
        bufs[f, :n] = xyz[:n]
        valids[f, :n] = True
    return bufs, valids, poly


def pc_frame(bufs, valids, f):
    return PointCloud(xyz=jnp.asarray(bufs[f]), valid=jnp.asarray(valids[f]))


def bits(a):
    """f32 -> u32 bit view (NaN payloads and -0.0 compare exactly)."""
    a = np.asarray(a)
    return a.view(np.uint32) if a.dtype == np.float32 else a


def eq_bits(a, b):
    return np.array_equal(bits(a), bits(b))
