"""Shared TPU-friendly array ops.

compact_true: order-preserving compaction of a boolean mask into the flat
indices of its first K true elements. Implemented with lax.top_k rather than
the cumsum+scatter idiom: scatters whose UPDATE count equals the (huge)
input length serialize badly on TPU (measured seconds for 20M-element
scatters), while top_k over the same input is tens of ms.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compact_true(mask_flat, k: int):
    """First-K true positions of mask_flat in index order.

    Returns (indices [k] i32, -1 padded; count i32).
    """
    n = mask_flat.shape[0]
    k = min(k, n)
    prio = jnp.where(mask_flat, jnp.arange(n, dtype=jnp.int32), jnp.int32(n))
    neg_vals, _ = jax.lax.top_k(-prio, k)   # descending -> prio ascending
    sel = -neg_vals
    ok = sel < n
    count = jnp.sum(ok.astype(jnp.int32))
    return jnp.where(ok, sel, -1), count


def compact_take(vals, indices, fill):
    """Gather vals at compacted indices (-1 padded) with a fill value."""
    safe = jnp.maximum(indices, 0)
    out = vals[safe]
    mask = indices >= 0
    if out.ndim > mask.ndim:
        mask = mask.reshape(mask.shape + (1,) * (out.ndim - mask.ndim))
    return jnp.where(mask, out, fill)
