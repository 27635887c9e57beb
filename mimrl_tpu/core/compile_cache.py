"""Persistent XLA compilation cache.

Compiles dominate wall clock on tunneled/remote TPU backends: measured
on this chip, a trivial 2048x2048 matmul compile costs ~12 s of tunnel
round-trips and Solver init (the whole-model flax init program + the
first scanned-epoch programs) costs ~9 minutes COLD. JAX's persistent
compilation cache removes all of it on every run after the first —
same flags, same shapes -> the serialized executable is loaded from
disk instead of recompiled. The cache key covers backend, topology,
HLO, and compile options, so enabling it is semantics-free.

OPT-IN (`MIMRL_COMPILE_CACHE=<dir>`), measured reality on this image:
both non-standard backends here fail on the cache's RELOAD path —
the tunneled 'axon' TPU plugin hangs deserializing a cached executable
(verified 2026-08: write path works, second process never returns from
the first jit), and the CPU backend hard-crashes the interpreter
reloading persisted executables (see tests/conftest.py note). On a
standard Cloud TPU runtime this is the single biggest wall-clock win
for short runs (Solver init + first-epoch compiles are minutes), so the
hook stays wired in every entry point — set the env var to use it:

  MIMRL_COMPILE_CACHE=<dir>  enable, cache at <dir>
  (unset or 0: disabled)
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_compilation_cache() -> bool:
    """Idempotently point JAX at the on-disk compilation cache.

    Returns True when the cache is active. Must run before (or after —
    jax.config is live) the first jit compilation; entry points call it
    at import/startup time.
    """
    global _ENABLED
    knob = os.environ.get("MIMRL_COMPILE_CACHE", "")
    if knob in ("", "0"):
        return False
    if _ENABLED:
        return True
    cache_dir = knob
    try:
        os.makedirs(cache_dir, exist_ok=True)
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # default threshold (1s) would skip small-but-latency-expensive
        # programs: on a tunneled backend even trivial compiles cost
        # seconds of round-trips, so cache everything non-instant
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          0.2)
        _ENABLED = True
        return True
    except Exception:  # pragma: no cover - best-effort: never fatal
        return False
