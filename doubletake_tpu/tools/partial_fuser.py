"""Partial fuser: incremental TSDF over cached depths for hint renders.

Parity with reference tools/partial_fuser.py: fuses cached (first-pass)
depth predictions frame by frame so training-data hint renders can be
generated from the *partial* reconstruction as it stood at each frame,
with optional multiplicative depth noise as augmentation (:59-64).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from doubletake_tpu.tools.tsdf import TSDF, FusionConfig, integrate_depth, raycast


class PartialFuser:
    """Fuse cached depths sequentially; render hints from the running state."""

    def __init__(self, tsdf: TSDF, config: Optional[FusionConfig] = None,
                 depth_noise: float = 0.0, seed: int = 0):
        self.tsdf = tsdf
        self.config = config or FusionConfig(min_depth=0.5, max_depth=3.0)
        self.depth_noise = depth_noise
        self._rng = np.random.RandomState(seed)
        cfg = self.config
        self._fuse = jax.jit(
            lambda vol, d, c, k: integrate_depth(vol, d, c, k, cfg),
            donate_argnums=0,
        )

    def fuse_frame(self, depth_hw1, cam_T_world_44, K_44):
        depth = np.asarray(depth_hw1, np.float32)
        if self.depth_noise > 0:
            noise = 1.0 + self._rng.randn(*depth.shape).astype(np.float32) * self.depth_noise
            depth = depth * noise
        self.tsdf = self._fuse(
            self.tsdf, jnp.asarray(depth), jnp.asarray(cam_T_world_44),
            jnp.asarray(K_44),
        )

    def render_hint(self, world_T_cam_44, invK_44, height, width,
                    max_depth: Optional[float] = None, num_samples: int = 256):
        """(depth_hw NaN-coded, weights_hw, valid_hw) from the running TSDF."""
        return raycast(
            self.tsdf, jnp.asarray(world_T_cam_44), jnp.asarray(invK_44),
            height, width,
            min_depth=self.config.min_depth,
            max_depth=max_depth or self.config.max_depth,
            num_samples=num_samples,
        )
