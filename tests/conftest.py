"""Test configuration: force an 8-virtual-device CPU JAX for all tests.

The container's `sitecustomize` registers the axon TPU backend at interpreter
start (JAX_PLATFORMS=axon). Tests run on a fake 8-device CPU mesh instead —
including the multi-chip sharding tests — which we select in-process before
any backend is initialized: XLA_FLAGS is read at backend-creation time and
`jax_platforms` can still be updated as long as no jax computation ran yet.
"""

import os
import sys

_repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _repo_root not in sys.path:
    sys.path.insert(0, _repo_root)

flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

assert jax.default_backend() == 'cpu', jax.default_backend()
assert jax.device_count() == 8, jax.devices()
