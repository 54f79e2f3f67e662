"""Platform selection that honors the JAX_PLATFORMS env var.

This deployment's sitecustomize registers the remote ``axon`` TPU plugin
and pins the platform at interpreter start, which silently overrides a
user's ``JAX_PLATFORMS=cpu``.  CLIs call :func:`apply_env_platform` right
after importing jax so the env var behaves as documented.
"""

import os


def apply_env_platform():
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
