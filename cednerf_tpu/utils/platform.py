"""Make `JAX_PLATFORMS=cpu` actually stick in this container.

The container's sitecustomize registers the tunneled TPU ('axon') PJRT
plugin at interpreter start and re-exports JAX_PLATFORMS=axon, so a
caller's `JAX_PLATFORMS=cpu python tools/...` silently runs on the one
real chip — contending with whatever unattended bench/queue run holds it
(measured: a stray CPU-intended validate run degraded a concurrent bench
arm ~25%). `jax.config.update("jax_platforms", ...)` beats the
registration (tests/conftest.py relies on the same); calling this right
after `import jax` honors the caller's intent.
"""

import os


def respect_platform_env() -> None:
    """If the caller asked for a specific platform via JAX_PLATFORMS,
    force it through jax.config (the sitecustomize override loses)."""
    want = os.environ.get("JAX_PLATFORMS", "")
    if want and want.lower() != "axon":
        import jax

        jax.config.update("jax_platforms", want.lower())
