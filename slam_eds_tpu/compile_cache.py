"""Persistent-compile-cache setup, fingerprinted by host CPU.

JAX's XLA:CPU cache entries embed AOT machine code compiled for the exact
CPU feature set of the compiling host. The cache key does NOT include those
features, so a cache directory carried to a machine with a different CPU
(observed between build rounds in this repo) gets *loaded and executed*,
producing "machine type doesn't match" warnings and real SIGILL/segfault
crashes mid-test. Scoping the cache directory by a hash of the host's CPU
flags makes a moved cache simply miss instead of poisoning the process.
"""
from __future__ import annotations

import hashlib
import os


def machine_fingerprint() -> str:
    """Short stable hash of the host CPU's feature flags."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    src = line
                    break
            else:
                src = ""
    except OSError:
        import platform
        src = platform.processor() + platform.machine()
    return hashlib.sha1(src.encode()).hexdigest()[:12]


def setup_cache(base_dir: str | None = None,
                min_compile_secs: float = 1.0) -> str:
    """Point jax at <base>/.jax_cache/<cpu-fingerprint> and return it."""
    import jax
    if base_dir is None:
        base_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(base_dir, ".jax_cache", machine_fingerprint())
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
