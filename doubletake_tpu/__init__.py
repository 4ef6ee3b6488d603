"""doubletake_tpu: TPU-native multi-view-stereo depth estimation with geometry hints.

A from-scratch JAX/Flax/Pallas reimplementation of the capabilities of
nianticlabs/doubletake (ECCV 2024): plane-sweep metadata cost volumes, a
U-Net++ depth regressor, TSDF fusion, and the mesh-hint feedback loop —
designed for TPU (static shapes, NHWC layouts, XLA-friendly control flow,
Pallas kernels on the hot path).
"""

__version__ = "0.1.0"
