"""Persistent XLA compilation cache.

Compiles of the full train-step program take minutes through a remote-compile
TPU attachment (measured 30-300 s with high variance); the persistent cache
makes every run after the first start in seconds. Stored inside the repo so
it survives across processes and CI/bench invocations on the same machine.
"""

import os

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compile_cache(path: str | None = None) -> str:
    """Idempotently point JAX at a persistent compilation cache directory.

    Respects an explicit user setting (JAX_COMPILATION_CACHE_DIR or a
    previously configured jax.config value).

    Also the choke point every entry script passes through right after
    `import jax`, so it enforces the caller's JAX_PLATFORMS request
    (utils/platform.py) before any backend initializes — a CPU-intended
    tool run must never land on the tunneled chip and contend with an
    unattended bench holding it."""
    import jax

    from .platform import respect_platform_env
    respect_platform_env()

    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    target = path or os.environ.get("JAX_COMPILATION_CACHE_DIR") or _DEFAULT_DIR
    os.makedirs(target, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", target)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return target
