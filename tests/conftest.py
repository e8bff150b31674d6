"""Test env: force a REAL 8-device virtual CPU mesh.

Note: the axon TPU plugin in this image rewrites JAX_PLATFORMS at import
time (env vars are NOT honored); the only reliable override is
`jax.config.update('jax_platforms', 'cpu')` before first backend use.
"""

import os
import sys

# must be set before the backend initializes for the 8 virtual devices
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
assert jax.default_backend() == 'cpu', jax.default_backend()
