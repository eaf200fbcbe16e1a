"""Chip/tunnel liveness probe: dispatch + fetch one trivial op, print the
round-trip time. The axon backend intermittently degrades (documented
CLAUDE.md): minutes-long FAILED_PRECONDITION / INVALID_ARGUMENT windows and
(2026-08-17 evening) a multi-hour hang where even `jnp.ones((8,128))*2`
never completed. Run this BEFORE debugging your own code when a bench
stalls; pair with `timeout`:

    timeout 120 python benchmarks/probe_liveness.py && echo CHIP-OK
"""

import time

import numpy as np


def main():
    t0 = time.time()
    import jax
    import jax.numpy as jnp

    print(f"# jax import: {time.time() - t0:.1f}s", flush=True)
    t1 = time.time()
    x = jnp.ones((8, 128)) * 2
    got = float(np.asarray(x).sum())
    dt = time.time() - t1
    dev = x.devices()
    assert got == 2048.0, got
    print(f"CHIP-ALIVE {dev} round-trip {dt * 1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
