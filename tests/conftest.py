import os

# Make an 8-virtual-device CPU platform available for multi-chip sharding
# tests. NOTE: under the axon TPU plugin, JAX_PLATFORMS=cpu is ignored (the
# tunnel backend stays default), so we pin the default device to CPU instead.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# Persistent compile cache: DISABLED for the CPU suite. After a host
# migration (2026-08-18) the XLA:CPU AOT loader warns on every load of an
# entry written even by THIS host ("machine type doesn't match ... could
# lead to SIGILL") — feature-string mismatch between compile and host
# introspection. Not worth the risk for a ~10 min suite; see CLAUDE.md.
# bench.py keeps its own cache config for TPU executables (tunnel-compiled).

if not os.environ.get("AOSX_TEST_ON_TPU"):
    _cpu = jax.devices("cpu")
    jax.config.update("jax_default_device", _cpu[0])


def cpu_mesh(n: int = 8, axis: str = "data"):
    import numpy as np
    from jax.sharding import Mesh

    devs = np.array(jax.devices("cpu")[:n])
    return Mesh(devs, (axis,))

