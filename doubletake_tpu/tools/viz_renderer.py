"""Scene-visualization renderer: shaded TSDF views, birdseye camera, markers.

TPU-native redesign of the reference's pyrender/EGL mesh renderer
(reference: src/doubletake/tools/mesh_renderer.py:31-467). Instead of
rasterizing an extracted triangle mesh with OpenGL, views are rendered by
raycasting the live TSDF volume on device (tools/tsdf.py raycast): depth
comes from the first zero crossing, normals from the TSDF gradient, and
albedo from the fused color volume when present. This renders the *same
scene state* the pipeline maintains, with no mesh extraction, EGL context,
or host geometry in the loop.

Also provides the trajectory-visualization helpers the reference renderer
ships: SmoothBirdsEyeCamera (:161-252 behavior), lookat pose construction,
and camera frustum markers (drawn by projecting the wireframe, :282-467).
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from doubletake_tpu.tools.tsdf import TSDF, raycast, sample_tsdf


def render_tsdf_view(
    tsdf: TSDF,
    world_T_cam_44,
    invK_44,
    height: int,
    width: int,
    min_depth: float = 0.05,
    max_depth: float = 30.0,
    num_samples: int = 384,
    light_dir=None,
    background: float = 1.0,
):
    """Render (rgb_hw3 in [0,1], depth_hw) of the TSDF from any camera.

    Lambert shading of TSDF-gradient normals with a headlight (plus an
    optional fixed light), modulated by fused voxel colors when the volume
    carries them.
    """
    depth, _, valid = raycast(
        tsdf, jnp.asarray(world_T_cam_44, jnp.float32),
        jnp.asarray(invK_44, jnp.float32), height, width,
        min_depth=min_depth, max_depth=max_depth, num_samples=num_samples,
    )

    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32),
        jnp.arange(width, dtype=jnp.float32), indexing="ij",
    )
    pix = jnp.stack([xs + 0.5, ys + 0.5, jnp.ones_like(xs)], 0).reshape(3, -1)
    rays_cam = jnp.asarray(invK_44, jnp.float32)[:3, :3] @ pix
    R = jnp.asarray(world_T_cam_44, jnp.float32)[:3, :3]
    t = jnp.asarray(world_T_cam_44, jnp.float32)[:3, 3]
    rays_w = (R @ rays_cam).T                                    # (N, 3)

    d = jnp.where(valid, depth, max_depth).reshape(-1, 1)
    pts = t + rays_w * d                                         # (N, 3)

    # normals from the TSDF gradient (central differences, half a voxel)
    eps = 0.5 * tsdf.voxel_size
    grads = []
    for ax in range(3):
        off = jnp.zeros((1, 3)).at[0, ax].set(eps)
        g = sample_tsdf(tsdf, pts + off) - sample_tsdf(tsdf, pts - off)
        grads.append(g)
    n = jnp.stack(grads, -1)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)

    view = rays_w / jnp.maximum(jnp.linalg.norm(rays_w, axis=-1, keepdims=True), 1e-9)
    shade = 0.25 + 0.75 * jnp.clip(-(n * view).sum(-1), 0.0, 1.0)
    if light_dir is not None:
        ld = jnp.asarray(light_dir, jnp.float32)
        ld = ld / jnp.linalg.norm(ld)
        shade = 0.5 * shade + 0.5 * jnp.clip(-(n * ld).sum(-1), 0.0, 1.0)

    if tsdf.colors is not None:
        albedo = jnp.clip(sample_tsdf(tsdf, pts, what="colors"), 0.0, 1.0)
    else:
        albedo = jnp.full((pts.shape[0], 3), 0.85)

    rgb = albedo * shade[:, None]
    rgb = jnp.where(valid.reshape(-1, 1), rgb, background)
    return (
        np.asarray(rgb.reshape(height, width, 3)),
        np.asarray(jnp.where(valid, depth, np.nan)),
    )


def get_cam_pose_from_lookat_and_loc(cam_location, look_at_vec,
                                     up=(0.0, 0.0, 1.0)):
    """world_T_cam from location + lookat direction (renderer :470-500
    behavior; ScanNet convention, z up)."""
    z = np.asarray(look_at_vec, np.float64)
    z = z / np.linalg.norm(z)
    up = np.asarray(up, np.float64)
    x = np.cross(z, up)
    if np.linalg.norm(x) < 1e-6:
        x = np.array([1.0, 0.0, 0.0])
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    T = np.eye(4, dtype=np.float32)
    T[:3, 0], T[:3, 1], T[:3, 2] = x, y, z
    T[:3, 3] = cam_location
    return T


class SmoothBirdsEyeCamera:
    """Smoothed birdseye camera following the live camera + scene centroid
    (reference mesh_renderer.py:161-252; ScanNet convention, z up)."""

    def __init__(self, look_at_moving_alpha=0.9,
                 mean_mesh_moving_alpha=(0.8, 0.8, 0.8)):
        self.current_mean_loc = None
        self.fpv_cam_look_at = None
        self.look_at_moving_alpha = look_at_moving_alpha
        self.mean_mesh_moving_alpha = np.asarray(mean_mesh_moving_alpha)

    def get_bird_eye_trans(self, scene_points=None, fpv_pose=None,
                           z_offset=6.0, backwards_offset=7.0):
        """scene_points: (N, 3) sample of scene geometry (e.g. observed
        voxel centers or mesh vertices); fpv_pose: world_T_cam 4x4."""
        if scene_points is not None and len(scene_points):
            mean_loc = np.asarray(scene_points).mean(0)
            mean_loc = (mean_loc + fpv_pose[:3, 3] * 5) / 6.0
        else:
            mean_loc = fpv_pose[:3, 3].copy()

        if self.current_mean_loc is None:
            self.current_mean_loc = mean_loc
        else:
            self.current_mean_loc = (
                self.mean_mesh_moving_alpha * self.current_mean_loc
                + (1 - self.mean_mesh_moving_alpha) * mean_loc
            )

        # fpv look direction (ScanNet: camera -y is "forward" in world z-up)
        fpv_rot_inv = np.linalg.inv(fpv_pose[:3, :3])
        current_look = fpv_rot_inv @ np.array([0.0, -1.0, 0.0])
        if self.fpv_cam_look_at is None:
            self.fpv_cam_look_at = current_look
        else:
            self.fpv_cam_look_at = 0.05 * current_look + 0.95 * self.fpv_cam_look_at
            self.fpv_cam_look_at /= np.linalg.norm(self.fpv_cam_look_at)

        offset_vec = self.fpv_cam_look_at / np.linalg.norm(self.fpv_cam_look_at[:2])
        loc = self.current_mean_loc - offset_vec * backwards_offset
        loc[2] = self.current_mean_loc[2] + z_offset

        look_at = self.current_mean_loc - loc
        look_at /= np.linalg.norm(look_at)
        return get_cam_pose_from_lookat_and_loc(loc, look_at)


def observed_voxel_points(tsdf: TSDF, threshold: float = 0.01,
                          max_points: int = 20000):
    """World positions of observed voxels — the scene-centroid source for
    the birdseye camera (replaces mesh vertices)."""
    w = np.asarray(tsdf.weights)
    idx = np.argwhere(w > threshold)
    if len(idx) == 0:
        return np.zeros((0, 3), np.float32)
    if len(idx) > max_points:
        idx = idx[:: len(idx) // max_points + 1]
    return np.asarray(tsdf.origin)[None] + idx * tsdf.voxel_size


def _draw_line(img, p0, p1, color):
    h, w = img.shape[:2]
    n = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1]), 1)) + 1
    xs = np.linspace(p0[0], p1[0], n)
    ys = np.linspace(p0[1], p1[1], n)
    ok = (xs >= 0) & (xs < w - 1) & (ys >= 0) & (ys < h - 1)
    xi, yi = xs[ok].astype(int), ys[ok].astype(int)
    img[yi, xi] = color
    img[yi + 1, xi] = color
    img[yi, xi + 1] = color


def draw_camera_marker(img_hw3, marker_world_T_cam, view_cam_T_world, K_44,
                       scale: float = 0.3, color=(0.9, 0.1, 0.1)):
    """Draw a camera frustum wireframe into a rendered view (the reference's
    pyrender camera_marker geometry, :282-467, projected and line-drawn)."""
    s = scale
    pts_cam = np.array([
        [0, 0, 0], [-s, -0.75 * s, s], [s, -0.75 * s, s],
        [s, 0.75 * s, s], [-s, 0.75 * s, s],
    ])
    pts_w = (marker_world_T_cam[:3, :3] @ pts_cam.T).T + marker_world_T_cam[:3, 3]
    cam = (view_cam_T_world[:3, :3] @ pts_w.T).T + view_cam_T_world[:3, 3]
    z = cam[:, 2]
    if (z <= 0.05).any():
        return img_hw3
    px = (K_44[:2, :2] @ (cam[:, :2] / z[:, None]).T).T + K_44[:2, 2]
    edges = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]
    for a, b in edges:
        _draw_line(img_hw3, px[a], px[b], np.asarray(color))
    return img_hw3
