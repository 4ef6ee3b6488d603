"""Tests: native marching tetrahedra, PLY IO, mesh metrics, visibility."""

import numpy as np

import jax.numpy as jnp

from doubletake_tpu.eval.mesh_eval import (
    compute_mesh_metrics,
    evaluate_mesh,
    sample_mesh_points,
)
from doubletake_tpu.eval.visibility import SimpleVolume, integrate_visibility
from doubletake_tpu.tools.marching_cubes import (
    extract_mesh,
    load_ply,
    save_ply,
    tsdf_to_mesh,
)


def sphere_sdf(n=48, radius=0.35):
    """SDF of a sphere in a unit cube, normalized like a TSDF."""
    g = (np.arange(n) + 0.5) / n
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    d = np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2)
    return np.clip((radius - d) / 0.1, -1, 1).astype(np.float32) * -1.0
    # negative inside? TSDF convention: positive in front (outside), negative
    # behind (inside) — flip so outside is positive


def test_marching_sphere_accuracy():
    n = 48
    vol = sphere_sdf(n)
    verts, faces = extract_mesh(vol, isolevel=0.0)
    assert len(verts) > 500 and len(faces) > 500
    # vertices lie on the sphere of radius 0.35*n voxels around center
    center = np.full(3, 0.5 * n - 0.5)
    r = np.linalg.norm(verts - center, axis=1) / n
    np.testing.assert_allclose(r.mean(), 0.35, atol=0.02)
    assert np.abs(r - 0.35).max() < 0.05

    # faces index valid vertices; surface is edge-shared (each vertex used)
    assert faces.max() < len(verts)
    assert faces.min() >= 0
    used = np.zeros(len(verts), bool)
    used[faces.reshape(-1)] = True
    assert used.all()


def test_marching_respects_observedness():
    n = 32
    vol = sphere_sdf(n)
    weights = np.zeros_like(vol)
    weights[: n // 2] = 1.0  # only half the volume observed
    verts, faces = extract_mesh(vol, weights=weights)
    assert len(verts) > 0
    assert verts[:, 0].max() <= n / 2 + 1  # no geometry in unobserved half


def test_ply_roundtrip(tmp_path):
    vol = sphere_sdf(24)
    verts, faces = extract_mesh(vol)
    path = str(tmp_path / "m.ply")
    save_ply(path, verts, faces)
    v2, f2 = load_ply(path)
    np.testing.assert_allclose(v2, verts, rtol=1e-6)
    np.testing.assert_array_equal(f2, faces)


def test_tsdf_to_mesh_world_coords():
    from doubletake_tpu.tools.tsdf import TSDF, FusionConfig, integrate_depth

    vol = TSDF.from_bounds(
        dict(xmin=-1, xmax=1, ymin=-1, ymax=1, zmin=0, zmax=3), 0.08
    )
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 40.0
    K[0, 2], K[1, 2] = 32, 24
    depth = np.full((48, 64, 1), 2.0, np.float32)
    cfg = FusionConfig(min_depth=0.5, max_depth=3.5)
    for _ in range(5):  # several fusions to build weight
        vol = integrate_depth(vol, jnp.asarray(depth), jnp.eye(4), jnp.asarray(K), cfg)

    verts, faces = tsdf_to_mesh(vol)
    assert len(verts) > 50
    # the wall is at z=2.0 in world coords
    np.testing.assert_allclose(verts[:, 2].mean(), 2.0, atol=0.08)
    assert np.abs(verts[:, 2] - 2.0).max() < 0.15


def test_mesh_metrics_identical_and_shifted():
    vol = sphere_sdf(32)
    verts, faces = extract_mesh(vol)
    verts = verts / 32.0  # to meters

    m = evaluate_mesh(verts, faces, verts, faces, num_samples=20000)
    assert m["chamfer"] < 0.6  # cm (20k-point sampling noise floor)
    assert m["fscore"] > 0.99

    shifted = verts + np.array([0.02, 0.0, 0.0], np.float32)
    m2 = evaluate_mesh(shifted, faces, verts, faces, num_samples=20000)
    assert 0.5 < m2["chamfer"] < 3.0  # ~1-2 cm
    assert m2["fscore"] > 0.9  # 2cm shift < 5cm threshold

    far = verts + np.array([0.2, 0.0, 0.0], np.float32)
    m3 = evaluate_mesh(far, faces, verts, faces, num_samples=20000)
    assert m3["fscore"] < 0.5


def test_point_sampling_on_surface():
    tri_verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    tri_faces = np.array([[0, 1, 2]], np.int32)
    pts = sample_mesh_points(tri_verts, tri_faces, 1000)
    assert pts.shape == (1000, 3)
    assert np.allclose(pts[:, 2], 0)
    assert (pts[:, 0] + pts[:, 1] <= 1.0 + 1e-5).all()
    assert (pts >= -1e-6).all()


def test_visibility_volume():
    volume = SimpleVolume.from_bounds(
        dict(xmin=-1, xmax=1, ymin=-1, ymax=1, zmin=0, zmax=3), 0.1
    )
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 40.0
    K[0, 2], K[1, 2] = 32, 24
    depth = np.full((48, 64, 1), 2.0, np.float32)
    volume = integrate_visibility(volume, jnp.asarray(depth), jnp.eye(4), jnp.asarray(K))

    # in front of the wall: visible; behind the wall (beyond +0.3): not
    front = float(volume.sample(jnp.asarray([[0.0, 0.0, 1.0]]), "nearest")[0])
    behind = float(volume.sample(jnp.asarray([[0.0, 0.0, 2.6]]), "nearest")[0])
    outside = float(volume.sample(jnp.asarray([[5.0, 5.0, 1.0]]), "nearest")[0])
    assert front == 1.0
    assert behind == 0.0
    assert outside == 0.0

    # masking in evaluate_mesh drops occluded pred points
    pts_vis = np.array([[0.0, 0.0, 1.0]], np.float32)
    pts_occ = np.array([[0.0, 0.0, 2.6]], np.float32)
    gt = np.random.RandomState(0).rand(100, 3).astype(np.float32)
    vis = np.asarray(volume.sample(jnp.asarray(np.vstack([pts_vis, pts_occ])), "nearest")) > 0.5
    assert vis.tolist() == [True, False]


def test_viz_renderer_shaded_view():
    """TSDF raycast renderer (viz_renderer): fused wall renders with valid
    depth ~2 m, shaded pixels, and a camera marker drawn in-bounds."""
    import numpy as np
    import jax.numpy as jnp
    from doubletake_tpu.tools.tsdf import TSDF, FusionConfig, integrate_depth
    from doubletake_tpu.tools.viz_renderer import (
        SmoothBirdsEyeCamera, draw_camera_marker, observed_voxel_points,
        render_tsdf_view,
    )

    H, W = 48, 64
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 40.0
    K[0, 2], K[1, 2] = W / 2, H / 2
    bounds = dict(xmin=-1.0, xmax=1.0, ymin=-1.0, ymax=1.0, zmin=0.0, zmax=3.0)
    vol = TSDF.from_bounds(bounds, voxel_size=0.08, with_color=True)
    depth = np.full((H, W, 1), 2.0, np.float32)
    img = np.full((H, W, 3), 0.5, np.float32)
    vol = integrate_depth(vol, jnp.asarray(depth), jnp.eye(4), jnp.asarray(K),
                          FusionConfig(min_depth=0.5, max_depth=3.5),
                          image_hw3=jnp.asarray(img))

    rgb, d = render_tsdf_view(vol, np.eye(4), np.linalg.inv(K), H, W,
                              min_depth=0.5, max_depth=3.0)
    center_d = d[H // 3: -H // 3, W // 3: -W // 3]
    assert np.isfinite(center_d).all()
    np.testing.assert_allclose(center_d, 2.0, atol=0.1)
    assert rgb.shape == (H, W, 3) and np.isfinite(rgb).all()
    # wall faces the camera head-on: headlight shading ~1, albedo ~0.5
    assert abs(rgb[H // 2, W // 2].mean() - 0.5) < 0.15

    # birdseye pose generation is finite and orthonormal
    be = SmoothBirdsEyeCamera()
    pose = be.get_bird_eye_trans(observed_voxel_points(vol),
                                 fpv_pose=np.eye(4))
    assert np.isfinite(pose).all()
    RtR = pose[:3, :3].T @ pose[:3, :3]
    np.testing.assert_allclose(RtR, np.eye(3), atol=1e-5)

    marker_pose = np.eye(4)
    marker_pose[2, 3] = 1.5  # marker in front of the viewing camera
    marked = draw_camera_marker(rgb.copy(), marker_pose, np.eye(4), K, scale=0.2)
    assert (marked != rgb).any()
