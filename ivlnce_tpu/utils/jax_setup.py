"""JAX runtime setup: persistent compilation cache + platform hygiene.

TPU compiles of the mapper/policy steps take minutes through the axon
tunnel; the persistent cache makes them once-per-machine instead of
once-per-process.
"""

import os


def setup_jax(cache_dir: str = None) -> None:
    import jax

    # IVLNCE_PLATFORM=cpu forces the backend even when a site hook has
    # already overridden jax_platforms (env JAX_PLATFORMS alone loses to
    # sitecustomize on axon images); must run before first backend use
    platform = os.environ.get("IVLNCE_PLATFORM")
    if platform:
        jax.config.update("jax_platforms", platform)

    cache_dir = cache_dir or os.environ.get(
        "IVLNCE_JAX_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "ivlnce_tpu", "jax"
        ),
    )
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update(
        "jax_persistent_cache_min_entry_size_bytes", -1
    )
