"""Persistent XLA compilation cache.

Serving warmup compiles every batch bucket (~50 s for the flagship DiT on
v5e, PERF.md); with a persistent cache a process restart reloads those
executables from disk in seconds instead of recompiling.  Thin wrapper over
jax's compilation-cache config so callers (the serve CLI, long-lived
training drivers) enable it with one call.

The reference has no notion of this — torch eager mode has no compile step
to cache.  For jitted TPU serving it is the difference between a rolling
restart taking seconds vs minutes.
"""

from __future__ import annotations

import logging
import os


def enable_compilation_cache(cache_dir: str | None = None) -> str:
    """Turn on jax's persistent compilation cache, creating ``cache_dir``.

    Defaults to ``$CROWDMOD_COMPILE_CACHE`` or ``~/.cache/crowdmod_tpu/xla``.
    Safe to call more than once; returns the directory in use.
    """
    import jax

    cache_dir = (
        cache_dir
        or os.environ.get("CROWDMOD_COMPILE_CACHE")
        or os.path.join(
            os.path.expanduser("~"), ".cache", "crowdmod_tpu", "xla"
        )
    )
    os.makedirs(cache_dir, exist_ok=True)
    # jax initializes its persistent-cache object at most once per process
    # (jax._src.compilation_cache._get_cache); if anything compiled before
    # this call (warmup, sitecustomize, an earlier cache dir), a plain
    # config update is silently ignored.  Reset so the next compile
    # re-initializes at the requested directory.
    try:
        from jax._src import compilation_cache as _cc

        _cc.reset_cache()
    except Exception:  # noqa: BLE001 - private API; best-effort on new jax
        logging.warning("could not reset jax compilation cache state")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # Cache every program we actually wait on (default thresholds skip
    # sub-second compiles, which covers most of the warmup set).
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    logging.info("persistent XLA compilation cache at %s", cache_dir)
    return cache_dir
