"""Compilation-cache directory setup, partitioned by backend + host.

XLA's persistent-cache key does NOT include the compile machine's CPU
target config; an XLA:CPU executable cached on one machine and loaded on
another aborts, HANGS at dispatch, or is loaded-and-rejected per entry
("Target machine feature +prefer-no-scatter is not supported on the host
machine ... could lead to execution errors such as SIGILL",
cpu_aot_loader.cc:210) — round 4 measured minutes of reject+recompile spam
in dryrun_multichip from exactly this. Partitioning the cache directory
makes stale cross-machine entries unreachable instead of fatal.

Two lessons folded in:

1. Only XLA:CPU executables embed host CPU features — TPU-targeted programs
   are host-independent. So the TPU cache lives in one shared per-platform
   directory (migrated from the legacy host-keyed dir so the existing
   multi-GB program cache survives), and only the CPU cache is host-keyed.
2. /proc/cpuinfo's `flags` line alone is NOT a sufficient host key: XLA's
   target config also carries model-derived tuning features
   (+prefer-no-gather/+prefer-no-scatter are chosen per CPU *model*), so two
   hosts with identical flag lines can still produce incompatible
   executables. The CPU fingerprint therefore also hashes the model identity
   lines (vendor/family/model/stepping/model name).
"""

from __future__ import annotations

import hashlib
import os
import platform

BASE = os.environ.get("BMTPU_XLA_CACHE", "/root/.cache/bmtpu_xla")

_ID_KEYS = ("vendor_id", "cpu family", "model", "model name", "stepping",
            "CPU implementer", "CPU part", "CPU variant", "CPU revision")


def host_fingerprint() -> str:
    """Strong host key: machine arch + CPU model identity + feature flags."""
    h = hashlib.sha256(platform.machine().encode())
    seen = set()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in seen:
                    continue  # one logical CPU is enough; they are uniform
                if key in _ID_KEYS or key in ("flags", "Features"):
                    seen.add(key)
                    h.update(line.encode())
    except OSError:
        pass
    return h.hexdigest()[:10]


def _legacy_fingerprint() -> str:
    """The round-3/4 key (arch + first flags line): used once to migrate the
    existing TPU program cache into the per-platform directory."""
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


def cache_dir(plat: str) -> str:
    if plat == "cpu":
        return os.path.join(BASE, "cpu-" + host_fingerprint())
    if plat == "axon":
        plat = "tpu"  # the tunnel plugin IS the tpu backend (one program
        #               cache, whether selected as "axon" or auto-detected)
    d = os.path.join(BASE, plat)
    if not os.path.isdir(d):
        legacy = os.path.join(BASE, _legacy_fingerprint())
        if os.path.isdir(legacy) and not os.path.islink(legacy):
            try:  # stray CPU entries inside are unreachable, not harmful:
                os.rename(legacy, d)  # cpu processes use cpu-<fp> dirs now
            except OSError:
                pass
    return d


def setup_caches(min_compile_secs: float = 0.5) -> str:
    """Point jax at the partitioned persistent compilation cache; idempotent.
    Returns the directory used. Callers set the platform (JAX_PLATFORMS /
    jax.config) BEFORE calling; auto-detection falls back to the initialized
    backend."""
    import jax
    plat = (jax.config.jax_platforms or "").split(",")[0].strip()
    if not plat:
        plat = jax.default_backend()
    d = cache_dir(plat)
    os.makedirs(d, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return d
