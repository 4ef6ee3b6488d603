"""Visibility (occupancy) volumes for mesh-eval occlusion masking.

Parity with reference utils/volume_utils.py (SimpleVolume +
VisibilityAggregator): a dense 0/1 volume over the scene where voxels in
front of the rendered GT depth plus a 0.3 m buffer are marked visible
(:253-314); sampling uses align_corners=True trilinear semantics
(:185-237). Integration runs on device (same masked full-volume pattern as
TSDF fusion).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from doubletake_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d

VISIBILITY_BUFFER_M = 0.3  # volume_utils.py behavior: surface + 0.3 m


@struct.dataclass
class SimpleVolume:
    values: jnp.ndarray  # (X, Y, Z) occupancy in [0, 1]
    origin: jnp.ndarray
    voxel_size: float = struct.field(pytree_node=False)

    @classmethod
    def from_bounds(cls, bounds: dict, voxel_size: float):
        dims = []
        for axis in ("x", "y", "z"):
            extent = bounds[f"{axis}max"] - bounds[f"{axis}min"]
            dims.append(max(1, int(np.ceil(extent / voxel_size))))
        origin = jnp.asarray(
            [bounds["xmin"], bounds["ymin"], bounds["zmin"]], jnp.float32
        )
        return cls(
            values=jnp.zeros(tuple(dims), jnp.float32),
            origin=origin,
            voxel_size=voxel_size,
        )

    def sample(self, world_points_n3, method="bilinear"):
        vox = (world_points_n3 - self.origin) / self.voxel_size
        dims = jnp.asarray(self.values.shape, jnp.float32)
        pts = (vox / (dims - 1.0)) * 2.0 - 1.0
        return grid_sample_3d(self.values[..., None], pts, mode=method)[:, 0]

    def save(self, path):
        np.savez_compressed(
            path,
            values=np.asarray(self.values, np.float16),
            origin=np.asarray(self.origin, np.float32),
            voxel_size=self.voxel_size,
        )

    @classmethod
    def load(cls, path):
        data = np.load(path)
        return cls(
            values=jnp.asarray(data["values"], jnp.float32),
            origin=jnp.asarray(data["origin"], jnp.float32),
            voxel_size=float(data["voxel_size"]),
        )


def integrate_visibility(volume: SimpleVolume, depth_hw1, cam_T_world_44, K_44,
                         buffer_m: float = VISIBILITY_BUFFER_M):
    """Mark voxels visible in this frame: inside the image frustum, in front
    of the camera, and closer than the GT depth + buffer."""
    h, w = depth_hw1.shape[:2]
    dims = volume.values.shape
    grids = jnp.meshgrid(*[jnp.arange(d, dtype=jnp.float32) for d in dims], indexing="ij")
    coords = (
        volume.origin + jnp.stack(grids, -1).reshape(-1, 3) * volume.voxel_size
    )
    P = jnp.matmul(K_44, cam_T_world_44, precision=jax.lax.Precision.HIGHEST)[:3]
    cam = jnp.einsum("ij,nj->ni", P[:, :3], coords) + P[:, 3]
    z = cam[:, 2]
    px = cam[:, :2] / jnp.where(jnp.abs(z[:, None]) > 1e-8, z[:, None], 1e-8)

    gx = 2.0 * px[:, 0] / w - 1.0
    gy = 2.0 * px[:, 1] / h - 1.0
    grid = jnp.stack([gx, gy], -1)[None, :, None]
    depth_clean = jnp.where(jnp.isfinite(depth_hw1), depth_hw1, 0.0)
    sampled = grid_sample_2d(depth_clean[None], grid, mode="nearest")[0, :, 0, 0]

    inb = (gx > -1) & (gx < 1) & (gy > -1) & (gy < 1)
    visible = inb & (z > 0) & (sampled > 0) & (z < sampled + buffer_m)
    new_vals = jnp.maximum(volume.values.reshape(-1), visible.astype(jnp.float32))
    return volume.replace(values=new_vals.reshape(dims))
