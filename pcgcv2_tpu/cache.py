"""Machine-keyed persistent compilation cache helpers.

XLA:CPU serializes AOT results specialized to the compiling machine's CPU
features; loading them on a different host emits feature-mismatch errors and
can stall or SIGILL (observed: a cache written on an AMX-capable builder
poisoned the driver's dryrun).  Keying the cache directory by a fingerprint
of the local CPU makes a foreign cache invisible instead of poisonous.
"""

from __future__ import annotations

import hashlib
import os
import platform


def machine_fingerprint() -> str:
    """Short stable hash of the CPU identity (flags + model + arch) plus the
    jaxlib build.  The jaxlib component matters: XLA:CPU AOT entries encode
    tuning pseudo-features (+prefer-no-scatter, ...) that other jaxlib
    builds reject with machine-feature-mismatch errors (and can SIGILL), so
    two builds must never share a directory even on identical CPUs."""
    bits = [platform.machine(), platform.processor()]
    try:
        import jaxlib

        bits.append(getattr(jaxlib, "__version__", "?"))
    except ImportError:
        pass
    try:
        with open("/proc/cpuinfo") as f:
            seen = set()
            for line in f:
                key = line.split(":", 1)[0].strip()
                if key in ("flags", "model name") and key not in seen:
                    seen.add(key)
                    bits.append(line.strip())
                if len(seen) == 2:
                    break
    except OSError:
        pass
    return hashlib.sha1("|".join(bits).encode()).hexdigest()[:12]


def cache_dir(root: str = "/root/repo/.jax_cache") -> str:
    root = os.environ.get("PCGC_CACHE_ROOT", root)
    d = os.path.join(root, machine_fingerprint())
    os.makedirs(d, exist_ok=True)
    return d


def enable_persistent_cache(jax_module, root: str = "/root/repo/.jax_cache",
                            min_compile_secs: float = 2.0) -> None:
    jax_module.config.update("jax_compilation_cache_dir", cache_dir(root))
    jax_module.config.update(
        "jax_persistent_cache_min_compile_time_secs", min_compile_secs
    )
