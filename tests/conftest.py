"""Test configuration: force CPU with 8 virtual devices so kernel and
sharding tests run deterministically without TPU hardware.

The axon sitecustomize pins jax_platforms="axon,cpu" at import time, so the
JAX_PLATFORMS env var alone is not enough — we must update jax.config after
import.
"""
import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
