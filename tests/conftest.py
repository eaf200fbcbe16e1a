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

# Persistent compile cache: the suite is compile-bound on this 1-core box
# (48 min cold vs ~11 min warm). After a HOST MIGRATION the cache must be
# purged (`rm -rf /root/repo/.jax_cache`): old-host XLA:CPU AOT entries
# fail to load with misleading errors. Same-host write->load round-trips
# were verified clean post-migration (test_plan twice on a fresh dir: 3x
# faster, identical results, no loader warnings); occasional
# "machine type doesn't match" warnings from cpu_aot_loader are
# introspection noise for same-host entries — but if the suite ever fails
# weirdly right after an outage/migration, purge the cache FIRST (CLAUDE.md).
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

if not os.environ.get("AOSX_TEST_ON_TPU"):
    _cpu = jax.devices("cpu")
    jax.config.update("jax_default_device", _cpu[0])


def cpu_mesh(n: int = 8, axis: str = "data"):
    import numpy as np
    from jax.sharding import Mesh

    devs = np.array(jax.devices("cpu")[:n])
    return Mesh(devs, (axis,))

