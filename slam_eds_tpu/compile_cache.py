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
    """Short stable hash of the host CPU's feature flags AND model name.

    The flags line alone is not enough: XLA derives per-microarchitecture
    tuning features (e.g. ``prefer-no-scatter``) from the CPU *model*, so
    two hosts with identical ISA flags can produce mutually-incompatible
    AOT entries (observed between rounds: 'Machine type used for XLA:CPU
    compilation doesn't match' loader errors)."""
    src = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features", "model name")):
                    src += line
                    if src.count("\n") >= 2:
                        break
    except OSError:
        pass
    if not src:
        import platform
        src = platform.processor() + platform.machine()
    return hashlib.sha1(src.encode()).hexdigest()[:12]


def setup_cache(base_dir: str | None = None,
                min_compile_secs: float = 1.0) -> str:
    """Point jax at <base>/.jax_cache/<cpu-fingerprint>-<platform> and
    return it.

    The platform tag keeps TPU-session processes and pure-CPU processes in
    separate directories: a TPU-platform plugin can set different XLA:CPU
    compile preferences (observed: ``prefer-no-scatter``/``prefer-no-gather``
    target features under the tunnel plugin), and its CPU AOT entries then
    fail feature validation when a CPU-only process loads them."""
    import jax
    if base_dir is None:
        base_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    platform = (getattr(jax.config, "jax_platforms", None) or "default")
    tag = machine_fingerprint() + "-" + str(platform).replace(",", "_")
    path = os.path.join(base_dir, ".jax_cache", tag)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    return path
