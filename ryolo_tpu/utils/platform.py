"""Platform selection that honors the JAX_PLATFORMS env var.

This deployment's sitecustomize registers the remote ``axon`` TPU plugin
and pins the platform at interpreter start, which silently overrides a
user's ``JAX_PLATFORMS=cpu``.  CLIs call :func:`apply_env_platform` right
after importing jax so the env var behaves as documented.
"""

import os


def enable_compilation_cache(path: str = "/root/.cache/jax_comp"):
    """Persistent XLA compilation cache (compiles here are minutes-long
    through the remote-compile tunnel; cache them across processes)."""
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception:
        pass


def apply_env_platform():
    enable_compilation_cache()
    want = os.environ.get("JAX_PLATFORMS_OVERRIDE") or os.environ.get(
        "JAX_PLATFORMS"
    )
    if not want or want == "axon":
        return
    import jax

    try:
        jax.config.update("jax_platforms", want)
    except Exception:
        pass
