"""Tests for the synthetic dataset, generic MVS assembly, and loader."""

import numpy as np

from doubletake_tpu.data.loader import DataLoader, collate
from doubletake_tpu.datasets.synthetic import SyntheticDataset, SyntheticScene, synthetic_trajectory


def test_synthetic_multiview_consistency():
    """Depth maps from two poses must agree via reprojection (no noise)."""
    scene = SyntheticScene(seed=0)
    poses = synthetic_trajectory(40, seed=0)  # realistic inter-frame baseline
    H, W = 48, 64
    K = np.array([[37.0, 0, W / 2, 0], [0, 37.0, H / 2, 0], [0, 0, 1, 0], [0, 0, 0, 1]])

    _, d0 = scene.render(poses[0], K, H, W)
    _, d1 = scene.render(poses[1], K, H, W)

    # backproject frame 0, project into frame 1, compare against d1
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pix = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)], -1).reshape(-1, 3)
    invK = np.linalg.inv(K)
    cam_pts = (pix @ invK[:3, :3].T) * d0.reshape(-1, 1)
    world = cam_pts @ poses[0][:3, :3].T + poses[0][:3, 3]
    cam1_T_world = np.linalg.inv(poses[1])
    cam1 = world @ cam1_T_world[:3, :3].T + cam1_T_world[:3, 3]
    px = (cam1 @ K[:3, :3].T)
    px = px[:, :2] / px[:, 2:3]
    z = cam1[:, 2]

    u = np.round(px[:, 0] - 0.5).astype(int)
    v = np.round(px[:, 1] - 0.5).astype(int)
    inb = (u >= 0) & (u < W) & (v >= 0) & (v < H) & (z > 0)
    sampled = d1[v[inb], u[inb]]
    diff = np.abs(sampled - z[inb])
    # most points agree (occlusion/edges excluded)
    assert (diff < 0.05).mean() > 0.7


def test_synthetic_dataset_item_structure():
    ds = SyntheticDataset(
        split="test", num_frames=12, tuple_size=4, image_height=64, image_width=96
    )
    assert len(ds) == 12 - 3
    cur, src = ds[0]
    assert cur["image_bhw3"].shape == (64, 96, 3)
    assert cur["depth_bhw1"].shape == (32, 48, 1)
    assert cur["K_s0_b44"].shape == (4, 4)
    assert src["image_bhw3"].shape == (3, 64, 96, 3)
    assert src["world_T_cam_b44"].shape == (3, 4, 4)
    # K_s1 is half of K_s0
    np.testing.assert_allclose(cur["K_s1_b44"][0, 0], cur["K_s0_b44"][0, 0] / 2)

    # source frames must be sorted by pose penalty (ascending)
    cur_cam_T_world = cur["cam_T_world_b44"]
    pens = []
    for i in range(3):
        rel = cur_cam_T_world @ src["world_T_cam_b44"][i]
        tr = np.trace(rel[:3, :3])
        r_m = np.sqrt(max(2 * (1 - min(3.0, tr) / 3), 0))
        pens.append(np.sqrt(r_m**2 + np.linalg.norm(rel[:3, 3]) ** 2))
    assert pens == sorted(pens)


def test_loader_batches_and_renames():
    ds = SyntheticDataset(
        split="test", num_frames=10, tuple_size=4, image_height=64, image_width=96
    )
    loader = DataLoader(ds, batch_size=2, num_workers=2)
    batches = list(loader)
    assert len(batches) == (len(ds) + 1) // 2
    cur, src = batches[0]
    assert cur["image_bhw3"].shape == (2, 64, 96, 3)
    assert src["image_bkhw3"].shape == (2, 3, 64, 96, 3)
    assert src["K_s1_bk44"].shape == (2, 3, 4, 4)
    assert src["depth_bkhw1"].shape == (2, 3, 32, 48, 1)
    assert "mask_b_bkhw1" in src


def test_depth_nan_coding():
    ds = SyntheticDataset(
        split="test", num_frames=6, tuple_size=2, image_height=64, image_width=96
    )
    cur, _ = ds[0]
    d = cur["depth_bhw1"]
    m = cur["mask_b_bhw1"]
    assert np.isfinite(d[m]).all()
    assert (d[m] > 0).all()
