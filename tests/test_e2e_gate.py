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


@pytest.mark.slow
def test_fused_kernel_full_model_parity_gate():
    """CPU mirror of the bench.py hardware parity gate (VERDICT r4 item 3).

    Runs the FLAGSHIP-shaped model (512x384, efficientnet + unet_pp, 64
    planes, 8 views, hint MLP engaged) through both cost-volume paths —
    fused Pallas kernel (interpret mode, same explicit bf16 casts as on
    hardware) and the XLA oracle — on the same synthetic-scene frame
    bench.py gates on, and asserts the SAME budgets as bench.py:
      * s0-depth p99       <= 1e-2 m   (PARITY_P99_LIMIT)
      * Abs-Diff metric delta <= 5e-4 m (ABS_DIFF_DELTA_LIMIT)
    A kernel-numerics regression (e.g. round 4's BAND 40->32 cut, which
    produced 15.6 mm p99 on hardware — BENCH_r04) now fails in the test
    tier instead of after a full hardware round.
    """
    from doubletake_tpu.data.loader import DataLoader
    from doubletake_tpu.models.depth_model import DepthModelCVHint

    H, W = 384, 512
    model_fast = DepthModelCVHint(fast_cost_volume=True)
    model_xla = DepthModelCVHint(fast_cost_volume=False)

    ds = SyntheticDataset(
        split="test", image_height=H, image_width=W, num_frames=12,
        tuple_size=model_fast.model_num_views, pass_frame_id=True,
    )
    loader = DataLoader(ds, batch_size=1, shuffle=False, num_workers=0)
    cur_np, src_np = next(iter(loader))

    CUR = ("image_bhw3", "cam_T_world_b44", "world_T_cam_b44", "invK_s1_b44",
           "K_s0_b44", "invK_s0_b44")
    SRC = ("image_bkhw3", "cam_T_world_bk44", "world_T_cam_bk44", "K_s1_bk44")
    cur = {k: jnp.asarray(cur_np[k]) for k in CUR}
    src = {k: jnp.asarray(src_np[k]) for k in SRC}

    variables = jax.jit(model_xla.init)(jax.random.PRNGKey(0), cur, src)

    # hint at matching res from the frame's GT depth (hint inputs don't
    # move the warp geometry under test; this just engages the hint MLP
    # like the bench's raycast hints do)
    hh, hw = H // 4, W // 4
    gt = np.nan_to_num(np.asarray(cur_np["depth_bhw1"][0, ..., 0]))
    gh, gw = gt.shape
    hint_d = gt[(np.arange(hh) * gh) // hh][:, (np.arange(hw) * gw) // hw]
    valid = hint_d > 0.5
    hint = {
        "depth_hint_bhw1": jnp.asarray(
            np.where(valid, hint_d, np.nan)[None, ..., None]),
        "hint_mask_bhw1": jnp.asarray(valid[None, ..., None]),
        "sampled_weights_bhw1": jnp.asarray(
            np.where(valid, 0.5, 0.0)[None, ..., None].astype(np.float32)),
    }
    assert valid.mean() > 0.5, "hint must engage for a meaningful gate"

    d_fast = np.asarray(jax.jit(model_fast.apply)(
        variables, cur, src, hint=hint)["depth_pred_s0_bhw1"])
    d_slow = np.asarray(jax.jit(model_xla.apply)(
        variables, cur, src, hint=hint)["depth_pred_s0_bhw1"])

    diff = np.abs(d_fast - d_slow)
    p99 = float(np.percentile(diff, 99))
    assert p99 <= 1e-2, f"fused-vs-XLA s0 depth p99 {p99 * 1e3:.2f} mm > 10 mm"

    # metric-level gate, same protocol as bench.py depth_metrics
    def abs_diff_metric(pred_b1):
        pred = pred_b1[0, ..., 0]
        ph, pw = pred.shape
        up = pred[(np.arange(gh) * ph) // gh][:, (np.arange(gw) * pw) // gw]
        m = np.isfinite(gt) & (gt > 0.5)
        return float(np.abs(up[m] - gt[m]).mean())

    delta = abs(abs_diff_metric(d_fast) - abs_diff_metric(d_slow))
    assert delta <= 5e-4, f"Abs-Diff metric delta {delta * 1e3:.3f} mm > 0.5 mm"
