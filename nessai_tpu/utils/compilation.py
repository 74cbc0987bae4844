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

        # Key the cache directory by backend: XLA's cache key does NOT
        # include host machine features, so executables compiled for
        # one platform must never be visible to another session type.
        # Observed failure: a CPU-only session loaded XLA:CPU AOT
        # results written (pre-filter) by a remote-compile TPU session
        # — feature-mismatch errors with SIGILL risk. Backend subdirs
        # also strand any stale poisoned entries at the old root path.
        try:
            backend = jax.default_backend()
        except Exception:  # pragma: no cover - backend init failure
            backend = "unknown"
        cache_dir = os.path.join(cache_dir, backend)
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
        on_tpu = backend not in ("cpu", "unknown")
        low_threshold = on_tpu and _exclude_cpu_programs_from_cache()
        # Without the CPU filter, a low threshold would persist cheap
        # server-compiled CPU programs (the AOT feature-mismatch /
        # SIGILL hazard above) — keep the conservative 3 s threshold.
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs",
            0.2 if low_threshold else 3.0,
        )
        _enabled = True
        logger.debug("Persistent compilation cache at %s", cache_dir)
        return True
    except Exception as e:  # pragma: no cover - best effort
        logger.debug("Could not enable compilation cache: %s", e)
        return False


def _exclude_cpu_programs_from_cache() -> bool:
    """Keep host-CPU programs out of the persistent cache on TPU
    sessions. Returns True when the filter is (already) installed.

    Under the remote-compile backend even ``cpu``-platform programs are
    compiled server-side, so persisted CPU executables carry the
    *server's* machine features; loading them on the local host logs
    XLA:CPU AOT feature-mismatch errors and risks SIGILL. There is no
    public per-platform cache filter, so wrap the (private) read/write
    hooks to no-op for ``backend.platform == "cpu"``; TPU programs — the
    expensive ones — are unaffected. Best effort: if the private API
    moved, the cache simply behaves as stock JAX.
    """
    try:
        import inspect

        from jax._src import compiler as _jc

        if getattr(_jc, "_nessai_tpu_cpu_cache_filter", False):
            return True
        orig_read, orig_write = _jc._cache_read, _jc._cache_write

        # The wrappers assume ``backend`` is the 4th positional
        # parameter of both private hooks. If a JAX upgrade renames or
        # reorders it, installing them would silently disable (or
        # mis-apply) the filter — verify the signatures first and fall
        # back to a write threshold that keeps the cheap CPU programs
        # out instead.
        for fn, pos in ((orig_read, 3), (orig_write, 3)):
            names = list(inspect.signature(fn).parameters)
            if len(names) <= pos or names[pos] != "backend":
                raise RuntimeError(
                    f"unexpected {fn.__name__} signature: {names}"
                )

        def read(module_name, cache_key, compile_options, backend, *a, **k):
            if getattr(backend, "platform", None) == "cpu":
                return None, None
            return orig_read(
                module_name, cache_key, compile_options, backend, *a, **k
            )

        def write(cache_key, compile_time_secs, module_name, backend, *a, **k):
            if getattr(backend, "platform", None) == "cpu":
                return
            return orig_write(
                cache_key, compile_time_secs, module_name, backend, *a, **k
            )

        _jc._cache_read = read
        _jc._cache_write = write
        _jc._nessai_tpu_cpu_cache_filter = True
        return True
    except Exception as e:  # pragma: no cover - best effort
        logger.debug("Could not install CPU cache filter: %s", e)
        return False
