"""Parity tests for the geometry core against torch-based reference math.

The torch expressions here are built from the documented behavior of the
reference (pixel centers at +0.5, eps-guarded projective divide, DVMVS pose
distance) — small independent fixtures, not imports of reference code.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from doubletake_tpu.utils import geometry as geo


def random_pose(rng):
    # random rotation via QR
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    T = np.eye(4)
    T[:3, :3] = q
    T[:3, 3] = rng.randn(3) * 0.5
    return T.astype(np.float32)


def make_K(fx, fy, cx, cy):
    K = np.eye(4, dtype=np.float32)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = fx, fy, cx, cy
    return K


def test_backproject_project_roundtrip():
    rng = np.random.RandomState(0)
    h, w = 12, 16
    K = make_K(20.0, 21.0, w / 2, h / 2)
    invK = np.linalg.inv(K)
    depth = (rng.rand(1, 1, h, w).astype(np.float32) + 0.5) * 3.0

    pts = geo.backproject_depth(jnp.asarray(depth), jnp.asarray(invK)[None], h, w)
    # project back with identity extrinsics: recover the +0.5 pixel grid
    proj = geo.project_points(pts, jnp.asarray(K)[None], jnp.asarray(np.eye(4, dtype=np.float32))[None])
    proj = np.asarray(proj).reshape(3, h, w)

    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    # fp32 K @ invK roundtrip keeps ~0.05 px; the reference has the same noise
    np.testing.assert_allclose(proj[0], xs + 0.5, atol=0.05)
    np.testing.assert_allclose(proj[1], ys + 0.5, atol=0.05)
    np.testing.assert_allclose(proj[2], depth[0, 0], atol=1e-3)


def test_project_behind_camera_sign():
    # a point behind the camera must keep negative depth and not blow up
    pts = jnp.asarray(np.array([[[0.5], [0.2], [-2.0], [1.0]]], dtype=np.float32))
    K = jnp.asarray(make_K(10, 10, 5, 5))[None]
    out = np.asarray(geo.project_points(pts, K, jnp.eye(4)[None]))
    assert out[0, 2, 0] < 0


def test_pose_distance_matches_numpy():
    rng = np.random.RandomState(3)
    poses = np.stack([random_pose(rng) for _ in range(8)])
    comb, r, t = geo.pose_distance(jnp.asarray(poses))
    for i in range(8):
        R = poses[i, :3, :3]
        tr = np.trace(R)
        r_ref = np.sqrt(2 * (1 - min(3.0, tr) / 3))
        t_ref = np.linalg.norm(poses[i, :3, 3])
        np.testing.assert_allclose(float(r[i]), r_ref, rtol=1e-5)
        np.testing.assert_allclose(float(t[i]), t_ref, rtol=1e-5)
        np.testing.assert_allclose(float(comb[i]), np.sqrt(t_ref**2 + r_ref**2), rtol=1e-5)


def test_gaussian_blur_matches_torch_conv():
    rng = np.random.RandomState(4)
    x = rng.randn(2, 10, 14, 3).astype(np.float32)
    out = np.asarray(geo.gaussian_blur(jnp.asarray(x), 5, 2.0))

    # independent torch construction of the same separable blur
    k1 = np.exp(-((np.arange(5) - 2.0) ** 2) / (2 * 4.0))
    k1 = (k1 / k1.sum()).astype(np.float32)
    k2 = np.outer(k1, k1)
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    tp = F.pad(t, (2, 2, 2, 2), mode="reflect")
    kernel = torch.from_numpy(k2)[None, None].repeat(3, 1, 1, 1)
    ref = F.conv2d(tp, kernel, groups=3).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_spatial_gradient_matches_torch_sobel():
    rng = np.random.RandomState(5)
    x = rng.randn(1, 8, 9, 2).astype(np.float32)
    gx, gy = geo.spatial_gradient(jnp.asarray(x))

    sobel_x = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float32) / 8.0
    t = torch.from_numpy(x).permute(0, 3, 1, 2)
    tp = F.pad(t, (1, 1, 1, 1), mode="replicate")
    kx = torch.from_numpy(sobel_x)[None, None].repeat(2, 1, 1, 1)
    ky = torch.from_numpy(sobel_x.T.copy())[None, None].repeat(2, 1, 1, 1)
    ref_x = F.conv2d(tp, kx, groups=2).permute(0, 2, 3, 1).numpy()
    ref_y = F.conv2d(tp, ky, groups=2).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(gx), ref_x, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gy), ref_y, rtol=1e-4, atol=1e-5)


def test_normals_unit_length_and_orientation():
    # a fronto-parallel constant-depth plane has normals along -z or +z
    h, w = 16, 20
    depth = np.full((1, h, w, 1), 2.0, dtype=np.float32)
    K = make_K(25.0, 25.0, w / 2, h / 2)
    invK = jnp.asarray(np.linalg.inv(K))[None]
    n = np.asarray(geo.normals_from_depth(jnp.asarray(depth), invK))
    norms = np.linalg.norm(n, axis=-1)
    interior = norms[0, 4:-4, 4:-4]
    np.testing.assert_allclose(interior, 1.0, atol=1e-4)
    assert np.all(np.abs(n[0, 4:-4, 4:-4, 2]) > 0.99)


def test_frustum_bounds_contains_projected_points():
    rng = np.random.RandomState(6)
    h, w = 48, 64
    K = make_K(50.0, 50.0, w / 2, h / 2)
    invK = np.linalg.inv(K).astype(np.float32)
    pose = random_pose(rng)
    mn, mx = geo.frustum_bounds(
        jnp.asarray(invK), jnp.asarray(pose), 0.1, 5.0, h, w
    )
    mn, mx = np.asarray(mn), np.asarray(mx)

    # random points inside the frustum must be inside the AABB
    for _ in range(100):
        d = rng.uniform(0.1, 5.0)
        u = rng.uniform(0, w)
        v = rng.uniform(0, h)
        pt_cam = invK[:3, :3] @ np.array([u, v, 1.0]) * d
        pt_world = pose[:3, :3] @ pt_cam + pose[:3, 3]
        assert np.all(pt_world >= mn - 1e-4) and np.all(pt_world <= mx + 1e-4)
