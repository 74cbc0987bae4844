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
        # Threshold by backend. On TPU persist (almost) everything: the
        # flagship cold run compiles ~21 substantive device programs of
        # 0.2-4 s each (~22 s total) and with the old 3 s threshold only
        # ONE of them was ever written — a fresh process re-paid the
        # full compile bill (round-3 warmup regression). 0.2 s still
        # excludes the ~20 trivial sub-0.1 s programs. On host CPU keep
        # the high threshold: caching tiny host programs stores
        # server-compiled executables whose CPU features mismatch the
        # local host (XLA:CPU AOT load failures + fallback churn).
        try:
            on_tpu = jax.default_backend() not in ("cpu",)
        except Exception:  # pragma: no cover - backend init failure
            on_tpu = False
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            0.2 if on_tpu else 3.0,
        )
        _enabled = True
        logger.debug("Persistent compilation cache at %s", cache_dir)
        return True
    except Exception as e:  # pragma: no cover - best effort
        logger.debug("Could not enable compilation cache: %s", e)
        return False
