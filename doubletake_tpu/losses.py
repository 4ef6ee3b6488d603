"""Training losses (pure jnp, NHWC, NaN-coded invalid GT).

Parity with reference src/doubletake/losses.py and the loss cocktail in
src/doubletake/experiment_modules/sr_depth_model.py:437-526:

    loss = ms_log_l1 + 1.0 * grad + 1.0 * normals + 0.2 * mv

Invalid GT depth is NaN-coded (like the reference datasets); every loss
masks with isfinite + the provided validity mask. Boolean masked_select
becomes masked means (sum(x * m) / sum(m)) — identical values, static
shapes.
"""

from __future__ import annotations

import jax.numpy as jnp

from doubletake_tpu.ops.grid_sample import grid_sample_2d
from doubletake_tpu.ops.resize import interpolate_nearest, pyrdown
from doubletake_tpu.utils.geometry import (
    backproject_depth,
    project_points,
    spatial_gradient,
)


def _masked_mean(x, mask):
    m = mask.astype(jnp.float32)
    denom = jnp.maximum(m.sum(), 1.0)
    return jnp.where(mask, x, 0.0).astype(jnp.float32).sum() / denom


def scale_invariant_loss(log_depth_gt, log_depth_pred, mask, si_lambda: float = 0.85):
    """Eigen SI loss (losses.py:38-50)."""
    d = jnp.where(mask, log_depth_gt - log_depth_pred, 0.0)
    m = mask.astype(jnp.float32)
    n = jnp.maximum(m.sum(), 1.0)
    mean_sq = (d**2 * m).sum() / n
    mean = (d * m).sum() / n
    return jnp.sqrt(mean_sq - si_lambda * mean**2)


def ms_gradient_loss(depth_gt_bhw1, depth_pred_bhw1, num_scales: int = 4):
    """Multi-scale gradient L1 (losses.py:11-35). GT NaNs propagate through
    the blur-pool pyramid and are masked at each scale, like the reference."""
    pred_pyr = pyrdown(depth_pred_bhw1, num_scales)
    gt_pyr = pyrdown(depth_gt_bhw1, num_scales)
    loss = 0.0
    for pred_d, gt_d in zip(pred_pyr, gt_pyr):
        gx_gt, gy_gt = spatial_gradient(gt_d)
        gx_p, gy_p = spatial_gradient(pred_d)
        mask = jnp.isfinite(gx_gt) & jnp.isfinite(gy_gt)
        # reference averages over the *selected elements of both gradient
        # maps jointly*: mean over {dx errors} ∪ {dy errors} with one mask
        err_cat = jnp.concatenate([jnp.abs(gx_p - gx_gt), jnp.abs(gy_p - gy_gt)], axis=-1)
        mask_cat = jnp.concatenate([mask, mask], axis=-1)
        loss = loss + _masked_mean(err_cat, mask_cat)
    return loss


def normals_loss(normals_gt_bhw3, normals_pred_bhw3):
    """(1 - dot)/2 over pixels where both normals are finite (losses.py:53-74)."""
    mask = (
        jnp.isfinite(normals_gt_bhw3).all(axis=-1, keepdims=True)
        & jnp.isfinite(normals_pred_bhw3).all(axis=-1, keepdims=True)
    )
    gt = jnp.where(mask, normals_gt_bhw3, 1.0)
    pred = jnp.where(mask, normals_pred_bhw3, 1.0)
    dot = (gt * pred).sum(axis=-1, keepdims=True)
    return _masked_mean(0.5 * (1.0 - dot), mask)


def mv_depth_loss(
    depth_pred_bhw1,
    depth_gt_bhw1,
    src_depth_bkhw1,
    cur_invK_b44,
    src_K_bk44,
    cur_world_T_cam_b44,
    src_cam_T_world_bk44,
):
    """Multi-view reprojection loss (losses.py:77-195).

    For each source view: project GT current depth into the source view,
    nearest-sample source GT depth, keep points in front of the sampled
    surface (<1.05x, occlusion mask); penalize |log sampled - log projected
    pred| over valid, finite entries. Mean over source views.
    """
    b, h, w, _ = depth_gt_bhw1.shape
    k = src_depth_bkhw1.shape[1]

    def one_view(src_depth, src_K, src_cam_T_world):
        # valid mask from GT depth
        gt_cam = backproject_depth(depth_gt_bhw1.reshape(b, 1, -1), cur_invK_b44, h, w)
        gt_world = jnp.einsum("bij,bjn->bin", cur_world_T_cam_b44, gt_cam)
        gt_src = project_points(gt_world, src_K, src_cam_T_world)
        proj_depth = gt_src[:, 2].reshape(b, h, w, 1)
        px = gt_src[:, :2].reshape(b, 2, h, w)
        gx = 2.0 * px[:, 0] / w - 1.0
        gy = 2.0 * px[:, 1] / h - 1.0
        grid = jnp.stack([gx, gy], axis=-1)
        sampled = grid_sample_2d(
            jnp.where(jnp.isfinite(src_depth), src_depth, 0.0), grid, mode="nearest"
        )
        valid = (proj_depth < 1.05 * sampled) & (proj_depth > 0) & (sampled > 0)

        # reproject the *predicted* depth and compare in the source frame
        pr_cam = backproject_depth(depth_pred_bhw1.reshape(b, 1, -1), cur_invK_b44, h, w)
        pr_world = jnp.einsum("bij,bjn->bin", cur_world_T_cam_b44, pr_cam)
        pr_src = project_points(pr_world, src_K, src_cam_T_world)
        pred_depth = pr_src[:, 2].reshape(b, h, w, 1)

        diff = jnp.abs(jnp.log(sampled) - jnp.log(pred_depth))
        ok = valid & jnp.isfinite(diff)
        return _masked_mean(diff, ok)

    loss = 0.0
    for ki in range(k):
        loss = loss + one_view(
            src_depth_bkhw1[:, ki], src_K_bk44[:, ki], src_cam_T_world_bk44[:, ki]
        )
    return loss / k


def compute_losses(cur_data, src_data, outputs, normals_gt, normals_pred):
    """Full loss cocktail (sr_depth_model.py:437-526 parity).

    cur_data: "depth_bhw1" (NaN-coded GT), "mask_b_bhw1" (bool valid),
        "invK_s0_b44", "world_T_cam_b44".
    src_data: "depth_bkhw1", "K_s0_bk44", "cam_T_world_bk44".
    outputs: model outputs with log_depth_pred_s{i}_bhw1 / depth_pred_s0_bhw1.
    """
    depth_gt = cur_data["depth_bhw1"]
    mask_b = cur_data["mask_b_bhw1"]
    depth_pred = outputs["depth_pred_s0_bhw1"]
    log_depth_pred = outputs["log_depth_pred_s0_bhw1"]
    log_depth_gt = jnp.log(depth_gt)

    gt_hw = depth_gt.shape[1:3]
    ms_loss = 0.0
    for i in range(4):
        key = f"log_depth_pred_s{i}_bhw1"
        if key in outputs:
            pred_up = interpolate_nearest(outputs[key], gt_hw)
            ms_loss = ms_loss + _masked_mean(
                jnp.abs(jnp.where(mask_b, log_depth_gt, 0.0) - pred_up) * mask_b, mask_b
            ) / (2**i)

    grad = ms_gradient_loss(depth_gt, depth_pred)
    n_loss = normals_loss(normals_gt, normals_pred)
    abs_l = _masked_mean(jnp.abs(depth_gt - depth_pred), mask_b)
    si = scale_invariant_loss(log_depth_gt, log_depth_pred, mask_b)
    log_l1 = _masked_mean(jnp.abs(log_depth_gt - log_depth_pred), mask_b)

    mv = mv_depth_loss(
        depth_pred,
        depth_gt,
        src_data["depth_bkhw1"],
        cur_data["invK_s0_b44"],
        src_data["K_s0_bk44"],
        cur_data["world_T_cam_b44"],
        src_data["cam_T_world_bk44"],
    )

    loss = ms_loss + 1.0 * grad + 1.0 * n_loss + 0.2 * mv
    return {
        "loss": loss,
        "ms_loss": ms_loss,
        "grad_loss": grad,
        "normals_loss": n_loss,
        "abs_loss": abs_l,
        "si_loss": si,
        "log_l1_loss": log_l1,
        "mv_loss": mv,
    }
