"""Tracing / profiling harness (SURVEY.md section 5: the reference has none;
the TPU build provides jax.profiler traces + a per-stage wall-clock harness
for the <1 ms step target)."""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict

import jax


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/aosx_trace"):
    """Capture a jax.profiler trace (viewable in XProf/TensorBoard)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_stages(stages: Dict[str, Callable[[], object]], reps: int = 5) -> Dict[str, float]:
    """Wall-clock each jitted thunk (compile excluded via one warmup).
    Returns median ms per stage."""
    import numpy as np

    out = {}
    for name, thunk in stages.items():
        jax.block_until_ready(thunk())  # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            jax.block_until_ready(thunk())
            ts.append((time.perf_counter() - t0) * 1e3)
        out[name] = float(np.median(ts))
    return out


def nan_guard(x, name: str = "value"):
    """checkify-lite NaN guard matching the reference's scattered isfinite
    checks (e.g. voronoi_diagram.cpp:28-30)."""
    import jax.numpy as jnp

    return jax.lax.cond(
        jnp.all(jnp.isfinite(x)),
        lambda v: v,
        lambda v: jax.debug.print("NaN/Inf detected in {n}", n=name) or v,
        x,
    )
