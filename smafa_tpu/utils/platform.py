"""Platform selection helpers.

Some deployment images register a TPU PJRT plugin through a sitecustomize
hook that force-sets jax's ``jax_platforms`` config AFTER environment
parsing, which silently overrides a user's explicit ``JAX_PLATFORMS=cpu``.
``apply_platform_env()`` re-asserts the user's env choice (it must run
before any jax backend initializes). The CLI calls it on startup.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    plat = os.environ.get("SMAFA_TPU_PLATFORM") or os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    import jax

    try:
        if jax.config.jax_platforms != plat:
            jax.config.update("jax_platforms", plat)
    except RuntimeError:
        # backends already initialized — too late to switch; leave as-is
        pass
