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


def small_encoder_config(**overrides):
    """The canonical tiny conv encoder for fast tests — ONE home for the
    literal that several suites used to copy (a change to EncoderConfig or
    to the canonical small-test shape now edits once)."""
    from multimodal_mtrssm_tpu.nn.conv import EncoderConfig

    kw = dict(channels=(4, 8), kernel_sizes=(3, 3), strides=(2, 2),
              paddings=(1, 1), num_residual_blocks=0, coord_conv=False,
              linear_sizes=(64,))
    kw.update(overrides)
    return EncoderConfig(**kw)
