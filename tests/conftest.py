"""Test configuration: force an 8-virtual-device CPU platform.

Multi-chip sharding paths are tested against a fake 8-device CPU mesh
(SURVEY.md §4.5).  This environment's jaxlib pins ``jax_platforms`` to
``axon,cpu`` regardless of the JAX_PLATFORMS env var, so we must call
``jax.config.update`` before any backend is initialized.  Set
``RUN_TPU_TESTS=1`` to run the suite on the real chip instead.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if not os.environ.get("RUN_TPU_TESTS"):
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    # on-chip runs pay minutes of remote compile per executable — reuse the
    # repo's persistent compile cache (same one bench.py warms)
    import jax
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
