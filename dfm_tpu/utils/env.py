"""Environment helpers.

`setup_platform` honors DFM_PLATFORM (cpu/tpu) — needed because this
image's axon TPU plugin rewrites JAX_PLATFORMS at import time, so the
standard env var silently has no effect; only
`jax.config.update('jax_platforms', ...)` before first backend use works.
"""

import os

__all__ = ['setup_platform']


def setup_platform(default=None):
    plat = os.environ.get('DFM_PLATFORM', default)
    if plat:
        import jax
        jax.config.update('jax_platforms', plat)
    import jax
    return jax.default_backend()
