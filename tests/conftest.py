"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding correctness is tested without TPUs by forcing the host
platform to expose 8 devices (SURVEY.md §4). Must run before jax imports.
"""

import os
import sys

# Force (not setdefault): this machine exports JAX_PLATFORMS=axon (a
# tunneled single TPU); unit tests must run on the local virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
