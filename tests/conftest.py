"""Test config: run everything on a virtual 8-device CPU mesh.

The container's sitecustomize registers the TPU ('axon') backend at
interpreter start, so env vars alone are too late — but backend *selection*
is lazy, so jax.config still wins if we update it before any jax op runs.
"""
import os

os.environ.setdefault('MUJOCO_GL', 'egl')  # before any mujoco/GL import

_flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in _flags:
    os.environ['XLA_FLAGS'] = (_flags + ' --xla_force_host_platform_device_count=8').strip()

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')
