"""Test configuration: force CPU with 8 virtual devices for sharding tests.

This environment's ``sitecustomize`` registers a TPU ("axon") PJRT backend in
every interpreter and sets ``jax_platforms=axon,cpu`` via ``jax.config`` —
which overrides the ``JAX_PLATFORMS`` env var. Tests must run on the virtual
8-device CPU mesh, so we set the XLA flag before the first jax import and
then force the platform back to cpu through ``jax.config``.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Make the repo root importable regardless of pytest invocation directory.
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)
