"""Test configuration: force CPU with a virtual 8-device mesh.

Real TPU hardware is a single chip in this environment; multi-chip sharding
is validated on a virtual CPU mesh (the driver separately dry-runs the
multichip path). CPU also gives deterministic numerics for torch-parity
tests.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# the axon sitecustomize pins jax_platforms to "axon,cpu" regardless of the
# JAX_PLATFORMS env var — override via config to actually run tests on CPU
jax.config.update("jax_platforms", "cpu")

# Torch-parity tests compare fp32 numerics; disable bf16 matmul/conv paths.
jax.config.update("jax_default_matmul_precision", "highest")
