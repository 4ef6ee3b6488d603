"""Camera geometry core: pure jnp functions, no state, fully jittable.

Mirrors the semantics of the reference geometry stack
(reference: src/doubletake/utils/geometry_utils.py) while being shaped for
TPU: everything is a pure function over statically-shaped arrays, pixel
grids are built inline (XLA constant-folds them), and there are no modules
or cached buffers.

Conventions (identical to the reference — these decide checkpoint parity):
  * pixel centers at integer + 0.5 (geometry_utils.py:34-39);
  * homogeneous points as (..., 4, N) column stacks;
  * ``cam_T_world`` maps world -> camera ("extrinsics"); ``world_T_cam`` is
    the pose;
  * projection divides by (z + eps) with a |z| > eps guard
    (geometry_utils.py:86-91).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# Geometry matmuls are tiny (4x4 against point lists) but parity-critical:
# run them at full fp32 on the MXU instead of the bf16 default.
_PREC = jax.lax.Precision.HIGHEST


def pixel_grid_homogeneous(height: int, width: int, dtype=jnp.float32):
    """(3, H*W) homogeneous pixel coords with +0.5 center offset, x-major rows.

    Row 0 is x (width index), row 1 is y (height index), row 2 ones.
    Flattening order matches a (H, W) raster scan.
    """
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=dtype), jnp.arange(width, dtype=dtype), indexing="ij"
    )
    ones = jnp.ones((height, width), dtype)
    return jnp.stack([xs + 0.5, ys + 0.5, ones], axis=0).reshape(3, height * width)


def backproject_depth(depth_b1n, invK_b44, height: int, width: int):
    """Backproject per-pixel depths to homogeneous camera-space points.

    Args:
        depth_b1n: (B, 1, H*W) depths (or (B, 1, H, W), will be flattened).
        invK_b44: (B, 4, 4) inverse intrinsics.
    Returns:
        (B, 4, H*W) homogeneous points.
    """
    if depth_b1n.ndim == 4:
        depth_b1n = depth_b1n.reshape(depth_b1n.shape[0], 1, -1)
    pix = pixel_grid_homogeneous(height, width, depth_b1n.dtype)
    cam_b3n = jnp.einsum("bij,jn->bin", invK_b44[:, :3, :3], pix, precision=_PREC)
    cam_b3n = depth_b1n * cam_b3n
    ones = jnp.ones_like(cam_b3n[:, :1])
    return jnp.concatenate([cam_b3n, ones], axis=1)


def project_points(points_b4n, K_b44, cam_T_world_b44, eps: float = 1e-8):
    """Project homogeneous world points into a camera.

    Returns (B, 3, N): pixel x, pixel y, and depth (z + eps). The perspective
    divide is guarded exactly like the reference (scale = 1/(z+eps) when
    |z| > eps, else 1), so behind-camera points keep their sign.
    """
    P_b44 = jnp.matmul(K_b44, cam_T_world_b44, precision=_PREC)
    cam_b3n = jnp.einsum("bij,bjn->bin", P_b44[:, :3], points_b4n, precision=_PREC)
    z_b1n = cam_b3n[:, 2:3] + eps
    mask = jnp.abs(cam_b3n[:, 2:3]) > eps
    scale = jnp.where(mask, 1.0 / z_b1n, jnp.ones_like(z_b1n))
    xy_b2n = cam_b3n[:, :2] * scale
    return jnp.concatenate([xy_b2n, z_b1n], axis=1)


def pose_distance(pose_b44):
    """DVMVS combined pose-distance measure (geometry_utils.py:187-199).

    Returns (combined, R_measure, t_measure), each (B,).
    """
    R_trace = jnp.trace(pose_b44[:, :3, :3], axis1=-2, axis2=-1)
    # clamp at 0: for identity rotations the argument is exactly 0 and XLA
    # reassociation can push it to -eps, turning sqrt into NaN under jit
    R_measure = jnp.sqrt(jnp.maximum(2.0 * (1.0 - jnp.minimum(3.0, R_trace) / 3.0), 0.0))
    t_measure = jnp.linalg.norm(pose_b44[:, :3, 3], axis=-1)
    combined = jnp.sqrt(t_measure**2 + R_measure**2)
    return combined, R_measure, t_measure


def normalize_vectors(v, axis, eps: float = 1e-12):
    """torch F.normalize parity: v / max(||v||, eps)."""
    norm = jnp.linalg.norm(v, axis=axis, keepdims=True)
    return v / jnp.maximum(norm, eps)


def gaussian_kernel_1d(kernel_size: int, sigma: float):
    """kornia get_gaussian_kernel1d parity (normalized to sum 1)."""
    x = np.arange(kernel_size, dtype=np.float64) - (kernel_size - 1) / 2.0
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    return jnp.asarray(g / g.sum(), dtype=jnp.float32)


def gaussian_blur(x_nhwc, kernel_size: int = 5, sigma: float = 2.0):
    """kornia gaussian_blur2d parity: separable blur with reflect padding."""
    k = gaussian_kernel_1d(kernel_size, sigma).astype(x_nhwc.dtype)
    pad = kernel_size // 2
    c = x_nhwc.shape[-1]
    xp = jnp.pad(x_nhwc, ((0, 0), (pad, pad), (0, 0), (0, 0)), mode="reflect")
    kh = jnp.broadcast_to(k[:, None, None, None], (kernel_size, 1, 1, c))
    x1 = jax.lax.conv_general_dilated(
        xp, kh, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )
    xp = jnp.pad(x1, ((0, 0), (0, 0), (pad, pad), (0, 0)), mode="reflect")
    kw = jnp.broadcast_to(k[None, :, None, None], (1, kernel_size, 1, c))
    return jax.lax.conv_general_dilated(
        xp, kw, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


_SOBEL_X = np.array([[-1.0, 0.0, 1.0], [-2.0, 0.0, 2.0], [-1.0, 0.0, 1.0]]) / 8.0
_SOBEL_Y = _SOBEL_X.T


def spatial_gradient(x_nhwc):
    """kornia spatial_gradient parity (sobel, order 1, normalized=True).

    Replicate padding, normalized sobel kernels. Returns (dx, dy), each NHWC.
    """
    c = x_nhwc.shape[-1]
    xp = jnp.pad(x_nhwc, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")

    def dw_conv(kernel):
        k = jnp.broadcast_to(
            jnp.asarray(kernel, x_nhwc.dtype)[:, :, None, None], (3, 3, 1, c)
        )
        return jax.lax.conv_general_dilated(
            xp, k, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )

    return dw_conv(_SOBEL_X), dw_conv(_SOBEL_Y)


def normals_from_depth(depth_bhw1, invK_b44, kernel_size: int = 5, sigma: float = 2.0):
    """Estimate normals from a depth map (geometry_utils.py:96-142 parity).

    Gaussian-smooth depth, backproject, take spatial gradients of the 3D
    points, cross product, normalize. Returns (B, H, W, 3).
    """
    b, h, w, _ = depth_bhw1.shape
    smooth = gaussian_blur(depth_bhw1, kernel_size, sigma)
    pts_b4n = backproject_depth(smooth.reshape(b, 1, -1), invK_b44, h, w)
    pts_bhw3 = pts_b4n[:, :3].reshape(b, 3, h, w).transpose(0, 2, 3, 1)
    gx, gy = spatial_gradient(pts_bhw3)
    n = jnp.cross(gx, gy, axis=-1)
    return normalize_vectors(n, axis=-1)


def get_camera_rays(world_T_cam_b44, world_points_b3n):
    """Unit rays from camera centers to world points (world frame).

    Parity with geometry_utils.get_camera_rays(in_camera_frame=False).
    """
    centers = world_T_cam_b44[:, :3, 3][:, :, None]
    return normalize_vectors(world_points_b3n - centers, axis=1)


def to_homogeneous_points(points_b3n):
    ones = jnp.ones_like(points_b3n[:, :1])
    return jnp.concatenate([points_b3n, ones], axis=1)


def frustum_bounds(invK_44, world_T_cam_44, min_depth, max_depth, img_h: int, img_w: int):
    """Axis-aligned world-space bounds of a camera frustum (tsdf.py:15-50).

    Returns (min_3, max_3).
    """
    corners_u4 = jnp.array(
        [
            [0.0, 0.0, 1.0, 1.0],
            [img_w, 0.0, 1.0, 1.0],
            [0.0, img_h, 1.0, 1.0],
            [img_w, img_h, 1.0, 1.0],
        ],
        dtype=invK_44.dtype,
    ).T  # (4, 4) columns are corners
    rays_44 = jnp.matmul(invK_44, corners_u4, precision=_PREC)
    near = rays_44.at[:3].multiply(min_depth)
    far = rays_44.at[:3].multiply(max_depth)
    pts_48 = jnp.matmul(world_T_cam_44, jnp.concatenate([near, far], axis=1), precision=_PREC)
    return pts_48[:3].min(axis=1), pts_48[:3].max(axis=1)


def rotx(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])


def roty(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])


def rotz(t):
    c, s = np.cos(t), np.sin(t)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def qvec2rotmat(q):
    """COLMAP-convention quaternion (w, x, y, z) to rotation matrix."""
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * y**2 - 2 * z**2, 2 * x * y - 2 * w * z, 2 * z * x + 2 * w * y],
            [2 * x * y + 2 * w * z, 1 - 2 * x**2 - 2 * z**2, 2 * y * z - 2 * w * x],
            [2 * z * x - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x**2 - 2 * y**2],
        ]
    )
