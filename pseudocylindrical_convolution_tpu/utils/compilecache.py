"""Persistent XLA compilation cache.

Every entry point calls :func:`enable_persistent_cache` before its first
``jit`` compile. On this environment it is load-bearing: the TPU tunnel
compiles cold scan-codec programs extremely slowly (a full wavefront
program measured >1 h on a fresh machine), and each CLI/tool/training
invocation is a separate process, so without an on-disk cache every
process pays the full compile again. With it, a program compiles once per
machine and every later process (including the benchmark runner) loads
the serialized executable in seconds.

Failure here must never break a run (e.g. a backend whose executables do
not serialize just logs a JAX warning and compiles normally), so errors
are swallowed.
"""

import os

DEFAULT_CACHE_DIR = os.environ.get("PCONV_COMPILE_CACHE",
                                   os.path.expanduser("~/jax_cache"))


def enable_persistent_cache(path: str = "") -> None:
    # Forced-CPU runs (tests, the multichip dryrun, quick verify drives,
    # the multi-process gloo workers) skip the cache: CPU AOT entries
    # RELOAD WRONG -- XLA flags tuning preferences (prefer-no-scatter/
    # gather) as missing host machine features and a reloaded executable
    # can miscompute or SIGILL (observed: the 2-process multihost test
    # failed only on its second run, loading entries the first run
    # wrote). CPU is forced either via the env var or via
    # jax.config.update BEFORE this package is imported, so check both.
    # The TPU tunnel is the backend that needs the cache.
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return
    try:
        import jax
        if (jax.config.jax_platforms or "").strip().lower() == "cpu":
            return
    except Exception:
        pass
    path = path or DEFAULT_CACHE_DIR
    try:
        import jax
        # respect a cache dir the embedding application configured before
        # importing this package (library import must not clobber caller
        # configuration; PCONV_COMPILE_CACHE remains the env override)
        if jax.config.jax_compilation_cache_dir:
            return
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # the scan-step programs recompile per geometry; cache even the
        # quick ones so multi-process tool chains stay warm
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # pragma: no cover - never break the caller
        pass
