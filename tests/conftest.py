"""Test configuration: force JAX onto a virtual 8-device CPU mesh.

Mirrors the reference's test philosophy (SURVEY.md §4): HuggingFace is the
numeric oracle; parallelism configs must agree with each other. Tests run on
CPU so they are hermetic and exercise the same XLA sharding paths as TPU.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS to the single real
# TPU chip (axon tunnel); tests must not contend for it. The site hook imports
# jax at interpreter startup, so the env var alone is too late — update the
# config explicitly too.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

assert jax.default_backend() == "cpu", jax.default_backend()
