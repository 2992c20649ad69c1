"""Persistent XLA compilation cache for the production entry points.

The reference pays no compile cost (C++ AOT); here the first dispatch of
each (scene shape, pass shape) pair costs 19-54 s of XLA/Mosaic compile
(BENCHMATRIX first_s).  Wiring the persistent cache into the session/CLI
means the SECOND run of the same .dae skips compilation entirely — the
requirement of VERDICT r2 item 9.
"""
from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(os.path.expanduser('~'), '.cache', 'jax_comp')
_enabled = False


def enable(cache_dir: str | None = None) -> str:
    """Idempotently turn on the persistent compilation cache.  Safe to
    call before or after jax initialization.

    Respects a cache dir that is already configured (explicit arg >
    existing jax config > env var > default): a host process (e.g. the
    test suite) that pointed jax at its own cache must not have it
    switched out from under it mid-process — that turns every
    subsequent compile into a miss against the old cache."""
    global _enabled
    configured = None
    try:
        import jax
        configured = jax.config.jax_compilation_cache_dir
    except Exception:
        pass
    path = (cache_dir or configured
            or os.environ.get('JAX_COMPILATION_CACHE_DIR')
            or _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    os.environ.setdefault('JAX_COMPILATION_CACHE_DIR', path)
    try:
        import jax
        jax.config.update('jax_compilation_cache_dir', path)
        # cache every compile that took noticeable time (the default
        # 1 s floor skips mid-size kernels that still cost seconds on
        # a tunneled backend)
        jax.config.update('jax_persistent_cache_min_compile_time_secs',
                          0.2)
        jax.config.update('jax_persistent_cache_min_entry_size_bytes', -1)
    except Exception:
        pass    # cache is an optimization; never fail an entry point
    _enabled = True
    return path
