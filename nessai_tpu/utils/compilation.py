"""Persistent XLA compilation cache.

Remote TPU compiles cost seconds to minutes each and dominate cold-start
wall time; JAX's persistent compilation cache makes them one-time per
machine. NB: the cache must be enabled through ``jax.config`` (the
``JAX_COMPILATION_CACHE_DIR`` env var alone does not activate it under
the axon backend).

Disable with ``NESSAI_TPU_NO_COMPILE_CACHE=1``.
"""

import logging
import os

logger = logging.getLogger(__name__)

__all__ = ["enable_compilation_cache"]

_enabled = False


def enable_compilation_cache(cache_dir=None) -> bool:
    """Enable the persistent compilation cache (idempotent)."""
    global _enabled
    if _enabled:
        return True
    if os.environ.get("NESSAI_TPU_NO_COMPILE_CACHE"):
        return False
    if cache_dir is None:
        cache_dir = os.environ.get(
            "NESSAI_TPU_COMPILE_CACHE_DIR",
            os.path.join(
                os.path.expanduser("~"), ".cache", "nessai_tpu", "xla"
            ),
        )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Only cache expensive programs: caching the many tiny host-CPU
        # programs stores server-compiled executables whose CPU features
        # mismatch the local host (XLA:CPU AOT load failures + fallback
        # churn). The big TPU programs are the ones worth persisting.
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 3.0)
        _enabled = True
        logger.debug("Persistent compilation cache at %s", cache_dir)
        return True
    except Exception as e:  # pragma: no cover - best effort
        logger.debug("Could not enable compilation cache: %s", e)
        return False
