"""Test env: force CPU with 8 virtual devices so sharding tests run anywhere.

The session boots with the axon TPU backend pre-registered by a
sitecustomize that imports jax at interpreter start, so env vars alone are
too late — use jax.config.update after import instead.  Unit tests need
fp32 golden-value numerics (TPU matmuls default to bf16 internally) and an
8-device mesh (SURVEY.md §4: xla_force_host_platform_device_count).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
