"""End-to-end numeric gates (VERDICT r1 item 7).

Two fast CI gates that catch numeric regressions across the whole chain:

1. geometry chain quality — dataset -> loader -> TSDF fusion of GT depths
   -> raycast hint from a held-out pose, compared against that pose's GT
   depth. No network: this isolates the geometry/fusion/raycast stack and
   asserts real accuracy (error ~ voxel size), not a frozen fixture.
2. incremental runner — the full flagship loop (hint raycast -> model ->
   fuse -> metrics) on a tiny deterministic model; asserts the metric
   pipeline produces finite, sane values and that hints engage over time.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from doubletake_tpu.datasets.synthetic import SyntheticDataset
from doubletake_tpu.options import Options
from doubletake_tpu.tools.tsdf import TSDF, FusionConfig, integrate_depth, raycast


def test_geometry_chain_quality():
    H, W = 96, 128
    ds = SyntheticDataset(split="test", image_height=H, image_width=W,
                          num_frames=12, include_full_res_depth=True)
    scan = "synth0"
    poses = ds.poses(scan)
    scene = ds.scene(scan)

    bounds = dict(xmin=-3.2, xmax=3.2, ymin=-2.2, ymax=2.2, zmin=-0.1, zmax=3.1)
    vol = TSDF.from_bounds(bounds, voxel_size=0.04)
    cfg = FusionConfig(min_depth=0.3, max_depth=5.0,
                       extended_neg_truncation=True)

    K = np.asarray(ds.K_image, np.float32)  # intrinsics at (H, W)
    fuse = jax.jit(lambda v, d, c, k: integrate_depth(v, d, c, k, cfg),
                   donate_argnums=0)
    # fuse GT depth from every other frame
    for i in range(0, 10, 2):
        wTc = poses[i]
        _, depth = scene.render(wTc, K, H, W)
        vol = fuse(vol, jnp.asarray(depth, jnp.float32)[..., None],
                   jnp.asarray(np.linalg.inv(wTc), jnp.float32),
                   jnp.asarray(K, jnp.float32))

    # raycast from a held-out pose and compare against its GT render
    wTc = poses[7]
    _, gt = scene.render(wTc, K, H, W)
    # jit: eager per-op execution of the 256-sample march on the 1-core
    # CPU test host is ~10x slower and never hits the persistent cache
    d, w, v = jax.jit(lambda t, p, ik: raycast(
        t, p, ik, H, W, min_depth=0.3, max_depth=5.0, num_samples=256,
    ))(vol, jnp.asarray(wTc, jnp.float32),
       jnp.asarray(np.linalg.inv(K), jnp.float32))
    d, v = np.asarray(d), np.asarray(v)
    gt_ok = (gt > 0.3) & (gt < 3.0) & np.isfinite(gt)
    both = v & gt_ok
    assert both.mean() > 0.5, f"raycast coverage {both.mean():.2f}"
    err = np.abs(d[both] - gt[both])
    assert np.median(err) < 0.05, f"median err {np.median(err):.3f}"
    assert np.mean(err < 0.12) > 0.9, f"90th pct err too big"


@pytest.mark.slow
def test_incremental_runner_end_to_end(tmp_path):
    from doubletake_tpu.runners import incremental

    o = Options()
    o.dataset = "synthetic"
    o.name = "e2e_gate"
    o.output_base_path = str(tmp_path)
    o.image_width, o.image_height = 64, 32
    o.image_encoder_name = "tiny"
    o.matching_encoder_type = "tiny"
    o.depth_decoder_name = "skip"
    o.model_type = "cv_hint_depth_model"
    o.feature_volume_type = "mlp_mesh_hint_feature_volume"
    o.matching_num_depth_bins = 8
    o.plane_chunk = 8
    o.model_num_views = 2
    o.batch_size = 1
    o.skip_frames = 8
    o.raycast_samples = 64
    o.num_workers = 0

    res = incremental.run(o)
    fa = res["frame_avg"]
    for key in ("abs_diff", "abs_rel", "a5", "frame_time", "hint_coverage"):
        assert key in fa, f"missing metric {key}"
        assert np.isfinite(fa[key]), f"non-finite {key}"
    # random-init model: depth is wrong but must be in the representable
    # range and the metric plumbing sane
    assert 0.0 < fa["abs_rel"] < 50.0
    assert 0.0 <= fa["a5"] <= 100.0
    # score artifacts written
    scores = os.path.join(str(tmp_path), "e2e_gate",
                          "incremental_default", "scores")
    assert os.path.exists(os.path.join(scores, "all_frame_avg_metrics.json"))


@pytest.mark.slow
def test_raycast_hints_match_mesh_rasterize_mechanism():
    """SURVEY §7 cross-validation (VERDICT r2 missing #5): the TSDF-raycast
    hint mechanism must produce the same information as the reference's
    marching-cubes -> rasterize pipeline (rendering_utils.py:21-53). Here:
    fuse GT depths, extract the mesh with the native marching-tetrahedra
    extension, z-buffer rasterize its depth on host, and compare against
    raycast() on the same volume from the same camera: depth agreement
    within ~a voxel and matching validity coverage."""
    from doubletake_tpu.tools.marching_cubes import tsdf_to_mesh

    H, W = 96, 128
    ds = SyntheticDataset(split="test", image_height=H, image_width=W,
                          num_frames=12, include_full_res_depth=True)
    scan = "synth0"
    poses = ds.poses(scan)
    scene = ds.scene(scan)

    bounds = dict(xmin=-3.2, xmax=3.2, ymin=-2.2, ymax=2.2, zmin=-0.1, zmax=3.1)
    vol = TSDF.from_bounds(bounds, voxel_size=0.04)
    cfg = FusionConfig(min_depth=0.3, max_depth=5.0,
                       extended_neg_truncation=True)
    K = np.asarray(ds.K_image, np.float32)
    fuse = jax.jit(lambda v, d, c, k: integrate_depth(v, d, c, k, cfg),
                   donate_argnums=0)
    for i in range(0, 10, 2):
        wTc = poses[i]
        _, depth = scene.render(wTc, K, H, W)
        vol = fuse(vol, jnp.asarray(depth, jnp.float32)[..., None],
                   jnp.asarray(np.linalg.inv(wTc), jnp.float32),
                   jnp.asarray(K, jnp.float32))

    wTc = poses[7]
    d_ray, w_ray, v_ray = raycast(
        vol, jnp.asarray(wTc, jnp.float32),
        jnp.asarray(np.linalg.inv(K), jnp.float32), H, W,
        min_depth=0.3, max_depth=5.0, num_samples=256,
    )
    d_ray, v_ray = np.asarray(d_ray), np.asarray(v_ray)

    # --- reference mechanism: MC mesh + host z-buffer raster ---
    verts, faces = tsdf_to_mesh(vol)
    assert len(faces) > 1000, "mesh extraction produced too few faces"
    # rasterize as a dense point splat (verts + centroids + edge midpoints
    # give ~3 samples per 4cm triangle vs ~5cm pixel footprint) into a 2x
    # supersampled z-buffer, then min-pool — a full triangle scanline
    # rasterizer changes the answer by < the sampling density here
    tri = verts[faces]                                    # (M, 3, 3)
    pts = np.concatenate([
        verts,
        tri.mean(axis=1),
        0.5 * (tri[:, 0] + tri[:, 1]),
        0.5 * (tri[:, 1] + tri[:, 2]),
        0.5 * (tri[:, 2] + tri[:, 0]),
    ])
    cTw = np.linalg.inv(wTc)
    cam = pts @ cTw[:3, :3].T + cTw[:3, 3]
    z = cam[:, 2]
    ok = z > 0.3
    cam, z = cam[ok], z[ok]
    ss = 2
    Kss = K.copy()
    Kss[:2] *= ss
    uv = (cam @ Kss[:3, :3].T)
    u = np.rint(uv[:, 0] / z - 0.5).astype(np.int64)
    v = np.rint(uv[:, 1] / z - 0.5).astype(np.int64)
    inside = (u >= 0) & (u < W * ss) & (v >= 0) & (v < H * ss)
    zbuf = np.full((H * ss, W * ss), np.inf, np.float32)
    np.minimum.at(zbuf, (v[inside], u[inside]), z[inside].astype(np.float32))
    zbuf = zbuf.reshape(H, ss, W, ss).min(axis=(1, 3))
    v_ras = np.isfinite(zbuf)

    # validity coverage must agree (same surfaces seen by both mechanisms)
    both = v_ray & v_ras
    assert abs(v_ray.mean() - v_ras.mean()) < 0.12, (
        f"coverage: raycast {v_ray.mean():.2f} vs raster {v_ras.mean():.2f}"
    )
    assert both.mean() > 0.5 * max(v_ray.mean(), v_ras.mean())

    err = np.abs(d_ray[both] - zbuf[both])
    # same zero-crossing field, different mechanism: ~voxel-size agreement
    assert np.median(err) < 0.04, f"median |d| {np.median(err):.3f}"
    assert np.mean(err < 0.12) > 0.85, (
        f"within-3-voxel fraction {np.mean(err < 0.12):.2f}"
    )


@pytest.mark.slow
def test_offline_two_pass_runner_end_to_end(tmp_path):
    """Offline two-pass glue: pass-1 empty-hint fusion into the locked hint
    volume, per-scan prebuilt ray table, BATCHED pass-2 (batch 2: exercises
    the batched fused volume + vmapped raycast), final fusion + artifacts."""
    from doubletake_tpu.runners import offline_two_pass

    o = Options()
    o.dataset = "synthetic"
    o.name = "e2e_offline"
    o.output_base_path = str(tmp_path)
    o.image_width, o.image_height = 64, 32
    o.image_encoder_name = "tiny"
    o.matching_encoder_type = "tiny"
    o.depth_decoder_name = "skip"
    o.model_type = "cv_hint_depth_model"
    o.feature_volume_type = "mlp_mesh_hint_feature_volume"
    o.matching_num_depth_bins = 8
    o.plane_chunk = 8
    o.model_num_views = 2
    o.batch_size = 2
    o.skip_frames = 8
    o.raycast_samples = 64
    o.num_workers = 0
    o.run_fusion = True

    res = offline_two_pass.run(o)
    fa = res["frame_avg"]
    for key in ("abs_diff", "abs_rel", "a5", "frame_time", "hint_coverage"):
        assert key in fa, f"missing metric {key}"
        assert np.isfinite(fa[key]), f"non-finite {key}"
    assert 0.0 < fa["abs_rel"] < 50.0
    # pass-2 hints exist: the pass-1 volume was fused from real predictions
    assert fa["hint_coverage"] > 0.0
    base = os.path.join(str(tmp_path), "e2e_offline",
                        "offline_two_pass_default")
    assert os.path.exists(os.path.join(base, "scores",
                                       "all_frame_avg_metrics.json"))
    meshes = os.listdir(os.path.join(base, "meshes"))
    assert any(f.endswith("_hint_tsdf.npz") for f in meshes)
    assert any(f.endswith("_tsdf.npz") for f in meshes)
