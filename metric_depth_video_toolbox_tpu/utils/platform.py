"""Backend selection for CLI entry points.

``MDVT_PLATFORM=cpu|tpu|axon`` forces the JAX backend before first use —
needed because environment-set JAX_PLATFORMS (e.g. a TPU plugin) wins
over JAX_PLATFORM_NAME, and a failed plugin registration otherwise makes
CPU-only runs impossible.

``ensure_backend`` additionally survives *transient* plugin failures:
on shared-tunnel TPU deployments a device held by another process can
make backend registration fail outright for new processes. CLI runs
retry the probe with backoff and, as a last resort, fall back to CPU
with a loud warning instead of dying.
"""

from __future__ import annotations

import os
import time


def apply_platform_env(probe=True):
    plat = os.environ.get("MDVT_PLATFORM")
    if plat:
        import jax
        jax.config.update("jax_platforms", plat)
    if probe and not plat:
        # shared-tunnel TPU plugins can transiently fail registration
        # when device processes start back-to-back; retry before the
        # first real compute hits the broken cached backend
        ensure_backend()


def _retry_plugin_registration():
    """Re-run the deployment's PJRT plugin registration when the
    interpreter-startup hook swallowed a transient failure (relay busy).
    Entirely env-gated: a no-op outside such deployments."""
    if os.environ.get("JAX_PLATFORMS") != "axon":
        return
    try:
        import uuid

        try:
            from axon.register import register
        except ImportError:
            # the deployment's site dir can be shadowed when callers
            # override PYTHONPATH; fall back to its default location
            import sys
            if "/root/.axon_site" not in sys.path:
                sys.path.append("/root/.axon_site")
            from axon.register import register
        gen = os.environ.get("PALLAS_AXON_TPU_GEN", "v5e")
        register(
            None, f"{gen}:1x1x1",
            so_path=os.environ.get("PJRT_LIBRARY_PATH",
                                   "/opt/axon/libaxon_pjrt.so"),
            session_id=str(uuid.uuid4()),
            remote_compile=os.environ.get(
                "PALLAS_AXON_REMOTE_COMPILE") == "1",
        )
    except Exception as e:
        print(f"[platform] plugin re-registration failed: {e}",
              flush=True)


def ensure_backend(retries=4, wait_s=20.0, fallback_cpu=True):
    """Probe device initialization with retries; optionally fall back to
    CPU when the configured accelerator plugin cannot register.

    Returns the list of devices actually available.
    """
    import jax

    last_err = None
    for attempt in range(retries):
        try:
            return jax.devices()
        except RuntimeError as e:  # plugin not registered / tunnel busy
            last_err = e
            try:
                from jax._src import xla_bridge
                # drop the cached failure AND the one-shot plugin
                # registration flag so the next probe re-registers
                xla_bridge._clear_backends()
                xla_bridge._plugins_registered = False
            except Exception:
                pass
            _retry_plugin_registration()
            if attempt < retries - 1:
                print(f"[platform] backend init failed "
                      f"({str(e).splitlines()[0][:100]}); retrying in "
                      f"{wait_s:.0f}s ({attempt + 1}/{retries - 1})",
                      flush=True)
                time.sleep(wait_s)
    if fallback_cpu:
        print("[platform] WARNING: accelerator backend unavailable; "
              "falling back to CPU (slow). Set MDVT_PLATFORM to force a "
              "backend.", flush=True)
        try:
            import jax
            jax.config.update("jax_platforms", "cpu")
            return jax.devices()
        except Exception:
            pass
    raise last_err
