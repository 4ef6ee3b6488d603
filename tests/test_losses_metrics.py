"""Tests for losses, metrics, keyframe buffers, and the options system."""

import numpy as np
import torch

import jax.numpy as jnp

from doubletake_tpu import losses
from doubletake_tpu.options import Options, OptionsHandler
from doubletake_tpu.tools.keyframe_buffer import (
    DVMVSConfig,
    KeyframeBuffer,
    OfflineKeyframeBuffer,
    pose_distance,
)
from doubletake_tpu.utils.metrics import (
    ResultsAverager,
    compute_depth_metrics_batched,
)


def test_scale_invariant_loss_matches_formula():
    rng = np.random.RandomState(0)
    gt = rng.rand(64).astype(np.float32) + 0.5
    pred = rng.rand(64).astype(np.float32) + 0.5
    mask = rng.rand(64) > 0.3
    out = float(
        losses.scale_invariant_loss(
            jnp.asarray(np.log(gt)), jnp.asarray(np.log(pred)), jnp.asarray(mask)
        )
    )
    d = np.log(gt[mask]) - np.log(pred[mask])
    ref = np.sqrt((d**2).mean() - 0.85 * d.mean() ** 2)
    np.testing.assert_allclose(out, ref, rtol=1e-5)


def test_metrics_match_torch_nan_trick():
    rng = np.random.RandomState(1)
    gt = rng.rand(2, 100).astype(np.float32) * 4 + 0.5
    pred = gt + rng.randn(2, 100).astype(np.float32) * 0.1
    valid = rng.rand(2, 100) > 0.25

    out = compute_depth_metrics_batched(
        jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(valid)
    )

    # torch nan-trick reference
    tg = torch.from_numpy(gt.copy())
    tp = torch.from_numpy(pred.copy())
    tv = torch.from_numpy(valid)
    tg[~tv] = torch.nan
    tp[~tv] = torch.nan
    thresh = torch.max(torch.stack([tg / tp, tp / tg], dim=2), dim=2)[0]
    a5 = (thresh < 1.05).float()
    a5[~tv] = torch.nan
    np.testing.assert_allclose(
        np.asarray(out["a5"]), torch.nanmean(a5, dim=1).numpy(), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["abs_diff"]),
        torch.nanmean(torch.abs(tg - tp), dim=1).numpy(),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out["rmse"]),
        torch.sqrt(torch.nanmean((tg - tp) ** 2, dim=1)).numpy(),
        rtol=1e-5,
    )


def test_full_loss_cocktail_runs_and_is_finite():
    rng = np.random.RandomState(2)
    B, K, H, W = 1, 2, 32, 48
    depth_gt = (rng.rand(B, H, W, 1).astype(np.float32) + 0.5) * 2
    depth_gt[0, :4] = np.nan  # invalid band
    mask_b = np.isfinite(depth_gt)
    Km = np.eye(4, dtype=np.float32)
    Km[0, 0] = Km[1, 1] = 20.0
    Km[0, 2], Km[1, 2] = W / 2, H / 2

    outputs = {}
    for i in range(4):
        h, w = H // 2**i, W // 2**i
        ld = rng.randn(B, h, w, 1).astype(np.float32) * 0.1
        outputs[f"log_depth_pred_s{i}_bhw1"] = jnp.asarray(ld)
        outputs[f"depth_pred_s{i}_bhw1"] = jnp.exp(jnp.asarray(ld))

    cur_data = {
        "depth_bhw1": jnp.asarray(depth_gt),
        "mask_b_bhw1": jnp.asarray(mask_b),
        "invK_s0_b44": jnp.asarray(np.linalg.inv(Km))[None],
        "world_T_cam_b44": jnp.eye(4)[None],
    }
    src_data = {
        "depth_bkhw1": jnp.asarray(
            (rng.rand(B, K, H, W, 1).astype(np.float32) + 0.5) * 2
        ),
        "K_s0_bk44": jnp.asarray(np.stack([Km] * K))[None],
        "cam_T_world_bk44": jnp.stack([jnp.eye(4)] * K)[None],
    }
    normals = jnp.asarray(rng.randn(B, H, W, 3).astype(np.float32))
    normals = normals / jnp.linalg.norm(normals, axis=-1, keepdims=True)

    out = losses.compute_losses(cur_data, src_data, outputs, normals, normals)
    for k, v in out.items():
        assert np.isfinite(float(v)), f"{k} is not finite"
    assert float(out["normals_loss"]) < 1e-5  # identical normals -> ~0 loss
    assert float(out["loss"]) > 0


def test_keyframe_buffer_policy():
    buf = KeyframeBuffer(
        buffer_size=DVMVSConfig.test_keyframe_buffer_size,
        keyframe_pose_distance=DVMVSConfig.test_keyframe_pose_distance,
        optimal_t_score=DVMVSConfig.test_optimal_t_measure,
        optimal_R_score=DVMVSConfig.test_optimal_R_measure,
    )

    def pose(x):
        T = np.eye(4)
        T[0, 3] = x
        return T

    assert buf.try_new_keyframe(pose(0.0), "f0") == 0  # first
    assert buf.try_new_keyframe(pose(0.05), "f1") == 2  # too close
    assert buf.try_new_keyframe(pose(0.15), "f2") == 1  # accepted
    assert buf.try_new_keyframe(pose(0.30), "f3") == 1
    frames = buf.get_best_measurement_frames(2)
    assert len(frames) == 2
    # nearest-optimal frames (t approx 0.15) should be preferred
    dists = sorted(abs(f[0][0, 3] - 0.30) for f in frames)
    assert dists[0] <= 0.31

    # lost tracking: nan poses
    nan_pose = np.full((4, 4), np.nan)
    codes = [buf.try_new_keyframe(nan_pose, "x") for _ in range(31)]
    assert codes[-1] == 3  # reset after >30 bad poses
    assert len(buf.buffer) == 0


def test_offline_buffer_rejects_near_any():
    buf = OfflineKeyframeBuffer(keyframe_pose_distance=0.1)

    def pose(x):
        T = np.eye(4)
        T[0, 3] = x
        return T

    buf.try_new_keyframe(pose(0.0), "a")
    buf.try_new_keyframe(pose(0.2), "b")
    # close to the FIRST buffered frame, far from the last -> still rejected
    assert buf.try_new_keyframe(pose(0.05), "c") == 2


def test_pose_distance_symmetry_properties():
    T = np.eye(4)
    c, r, t = pose_distance(T, T)
    assert c == 0 and r == 0 and t == 0


def test_options_yaml_cli_merge(tmp_path):
    model_yaml = tmp_path / "model.yaml"
    model_yaml.write_text(
        "!!python/object:doubletake.options.Options\n"
        "batch_size: 24\nimage_encoder_name: efficientnet\n"
        "model_type: cv_hint_depth_model\nlr_steps: [70000, 80000]\n"
        "unknown_key: 42\n"
    )
    data_yaml = tmp_path / "data.yaml"
    data_yaml.write_text("dataset: scannet\nbatch_size: 8\n")

    handler = OptionsHandler(
        argv=[
            "--config_file", str(model_yaml),
            "--data_config_file", str(data_yaml),
            "--batch_size", "4",
            "--run_fusion",
        ]
    )
    opts = handler.parse_and_merge_options()
    assert opts.batch_size == 4  # CLI wins over both YAMLs
    assert opts.dataset == "scannet"
    assert opts.model_type == "cv_hint_depth_model"
    assert opts.run_fusion is True
    assert opts.extra["unknown_key"] == 42
    assert opts.lr_steps == [70000, 80000]

    # round trip
    out_yaml = tmp_path / "saved.yaml"
    OptionsHandler.save_options_as_yaml(str(out_yaml), opts)
    loaded = OptionsHandler.load_options_from_yaml(str(out_yaml))
    assert loaded.batch_size == 4


def test_results_averager():
    ra = ResultsAverager("exp", "frame metrics")
    for i in range(5):
        ra.update_results({"abs_diff": i * 1.0, "a5": 0.5})
    ra.compute_final_average()
    assert ra.final_metrics["abs_diff"] == 2.0
    assert ra.running_metrics["abs_diff"] == 2.0
