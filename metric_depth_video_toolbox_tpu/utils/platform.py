"""Backend selection for CLI entry points.

``MDVT_PLATFORM=cpu|tpu|axon`` forces the JAX backend before first use —
needed because environment-set JAX_PLATFORMS (e.g. a TPU plugin) wins
over JAX_PLATFORM_NAME, and a failed plugin registration otherwise makes
CPU-only runs impossible.
"""

from __future__ import annotations

import os


def apply_platform_env():
    plat = os.environ.get("MDVT_PLATFORM")
    if not plat:
        return
    import jax
    jax.config.update("jax_platforms", plat)
