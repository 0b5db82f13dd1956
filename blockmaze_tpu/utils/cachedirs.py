"""Compilation-cache directory setup, keyed by host fingerprint.

XLA's persistent-cache key does NOT include the compile machine's CPU
features; an XLA:CPU executable cached on one machine and loaded on another
with different features aborts or HANGS at dispatch ("Target machine feature
+prefer-no-scatter is not supported on the host machine ... could lead to
execution errors such as SIGILL" — observed as a permanent hang in
Array.__array__ on this project's CI hosts, which change between rounds).
Partitioning the cache directory by a host fingerprint makes stale
cross-machine entries unreachable instead of fatal.
"""

from __future__ import annotations

import hashlib
import os
import platform

BASE = os.environ.get("BMTPU_XLA_CACHE", "/root/.cache/bmtpu_xla")


def host_fingerprint() -> str:
    h = hashlib.sha256(platform.machine().encode())
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    h.update(line.encode())
                    break
    except OSError:
        pass
    return h.hexdigest()[:10]


def setup_caches(min_compile_secs: float = 0.5) -> str:
    """Point jax at the host-keyed persistent compilation cache; idempotent.
    Returns the directory used."""
    import jax
    d = os.path.join(BASE, host_fingerprint())
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return d
