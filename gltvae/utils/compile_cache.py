"""Persistent XLA compilation cache.

The reference pays nothing here (TF eager retraces cheaply); for a
jit-compiled TPU framework the first compile of the train step is the
dominant cold-start cost (3-5 min for the full scanned step through the
axon tunnel on this host). JAX's persistent compilation cache keys the
serialized executable by HLO + compiler version + platform, so every
process after the first loads the binary instead of recompiling —
measured 9.9 s -> 1.1 s for the bs-32 supervised step on the v5e tunnel
(and minutes -> seconds for the full CLI).

Enabled by default in train.py / bench.py / tools; disable with
--no-compilation-cache (e.g. when benchmarking compile time itself).
"""

from __future__ import annotations

import os
from typing import Optional

DEFAULT_DIR = os.path.join(os.path.expanduser('~'), '.cache', 'gltvae',
                           'xla')


def enable_persistent_compilation_cache(
        cache_dir: Optional[str] = None,
        min_compile_time_secs: float = 0.5) -> str:
    """Point jax at an on-disk executable cache. Safe to call before or
    after backend init; affects all subsequent compiles in the process."""
    import jax
    cache_dir = cache_dir or DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs',
                      min_compile_time_secs)
    # the cache backend is a lazily-created singleton: if it was already
    # initialized (for a different dir, or before the dir was set), the
    # config update alone does not retarget it
    try:
        from jax._src import compilation_cache as _cc
        _cc.reset_cache()
    except Exception:
        pass
    return cache_dir
