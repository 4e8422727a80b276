"""Test configuration: force JAX onto CPU with 8 virtual devices.

Real-TPU execution is exercised by bench.py / __graft_entry__.py; the test
suite validates numerics and multi-chip sharding on a virtual CPU mesh so it
runs anywhere (and doesn't contend for the single tunneled TPU chip).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# The axon TPU plugin ignores the JAX_PLATFORMS env var; force CPU through
# the config API so tests never tunnel to the real chip.
import jax

jax.config.update("jax_platforms", "cpu")

# AOT precompilation (parallel/precompile.py) is a TPU cold-start
# optimization; on XLA-CPU the extra plan compiles cost minutes per test.
# test_precompile.py validates the plan's coverage without it.
os.environ.setdefault("LUMINAIR_PRECOMPILE", "0")
