"""Test configuration: force CPU with a virtual 8-device mesh.

Real TPU hardware is a single chip in this environment; multi-chip sharding
is validated on a virtual CPU mesh (the driver separately dry-runs the
multichip path). CPU also gives deterministic numerics for torch-parity
tests.
"""

import os

# Compile time dominates on the (1-core) test hosts: drop the XLA codegen
# optimization level (numerics are unchanged) and keep a persistent
# compilation cache so repeat runs are cheap.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
    + " --xla_backend_optimization_level=0 --xla_llvm_disable_expensive_passes"
)

import jax  # noqa: E402

# the axon sitecustomize pins jax_platforms to "axon,cpu" regardless of the
# JAX_PLATFORMS env var — override via config to actually run tests on CPU
jax.config.update("jax_platforms", "cpu")

# Torch-parity tests compare fp32 numerics; disable bf16 matmul/conv paths.
jax.config.update("jax_default_matmul_precision", "highest")

_cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
