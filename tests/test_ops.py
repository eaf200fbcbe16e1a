"""compact_true_hier must equal compact_true on any mask (incl. the
window-overflow fallback regime)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from aosx.ops import compact_true, compact_true_hier


@pytest.mark.parametrize("seed,density,k,kw", [
    (0, 0.005, 256, 64),    # sparse, hier path
    (1, 0.02, 512, 32),     # windows overflow -> direct fallback
    (2, 0.3, 1024, 128),    # dense
    (3, 0.0, 128, 32),      # empty
    (4, 1.0, 256, 64),      # full (count > k, windows > kw)
])
def test_hier_matches_direct(seed, density, k, kw):
    rng = np.random.default_rng(seed)
    n = 8192
    mask = jnp.asarray(rng.random(n) < density)

    @jax.jit
    def both(mask):
        a, ca = compact_true(mask, k)
        b, cb = compact_true_hier(mask, k, kw=kw)
        return a, ca, b, cb

    a, ca, b, cb = both(mask)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(ca) == int(cb)


def test_hier_run_shaped():
    # contiguous runs (skeleton-like): windows are dense, hier path taken
    mask = np.zeros(4096, bool)
    mask[100:400] = True
    mask[1000:1010] = True
    mask[4000:4096] = True

    @jax.jit
    def both(mask):
        a, ca = compact_true(mask, 512)
        b, cb = compact_true_hier(mask, 512, kw=64)
        return a, ca, b, cb

    a, ca, b, cb = both(jnp.asarray(mask))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(ca) == int(cb)
