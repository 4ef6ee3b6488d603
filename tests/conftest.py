"""Test configuration: force CPU with a virtual 8-device mesh.

Real TPU hardware is a single chip in this environment; multi-chip sharding
is validated on a virtual CPU mesh (the driver separately dry-runs the
multichip path). CPU also gives deterministic numerics for torch-parity
tests.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault(
    "XLA_FLAGS",
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8",
)

import jax  # noqa: E402

# Torch-parity tests compare fp32 numerics; disable bf16 matmul/conv paths.
jax.config.update("jax_default_matmul_precision", "highest")
