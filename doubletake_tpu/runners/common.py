"""Shared runner infrastructure: model construction, jitted eval steps,
metric protocol (nearest upsample to full-res GT, valid > 0.5 m), fusers.

Protocol parity with the reference eval scripts (test_no_hint.py:177-212,
test_incremental.py:290-326): predictions are nearest-upsampled to the
full-res GT depth, masked to GT > 0.5 m (and finite), and averaged per
frame, per scene, and overall via ResultsAverager.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from doubletake_tpu.models.depth_model import get_model_class
from doubletake_tpu.options import Options
from doubletake_tpu.ops.resize import interpolate_nearest
from doubletake_tpu.tools.tsdf import TSDF, FusionConfig
from doubletake_tpu.utils.metrics import compute_depth_metrics_batched

EVAL_MIN_DEPTH = 0.5  # valid GT depth threshold (test_no_hint.py:184)

# keys the jitted eval step consumes (fixed set => stable jit signature)
CUR_KEYS = ("image_bhw3", "cam_T_world_b44", "world_T_cam_b44", "invK_s1_b44",
            "K_s0_b44", "invK_s0_b44")
SRC_KEYS = ("image_bkhw3", "cam_T_world_bk44", "world_T_cam_bk44", "K_s1_bk44")


def build_model(opts: Options):
    """Construct the model from options (model registry parity)."""
    model_type = opts.model_type or opts.extra.get("model_type", "depth_model")
    cls = get_model_class(model_type)
    # only values the reference supports (sr_depth_model.py:174-177, :/cv enc)
    if opts.loss_type != "log_l1":
        raise ValueError(f"loss_type: {opts.loss_type} unknown")
    if opts.cv_encoder_type != "multi_scale_encoder":
        raise ValueError(f"cv_encoder_type: {opts.cv_encoder_type} unknown")
    return cls(
        image_encoder_name=opts.image_encoder_name,
        depth_decoder_name=opts.depth_decoder_name,
        feature_volume_type=opts.feature_volume_type,
        matching_encoder_type=opts.matching_encoder_type,
        matching_scale=opts.matching_scale,
        matching_num_depth_bins=opts.matching_num_depth_bins,
        matching_feature_dims=opts.matching_feature_dims,
        model_num_views=opts.model_num_views,
        min_matching_depth=opts.min_matching_depth,
        max_matching_depth=opts.max_matching_depth,
        plane_chunk=opts.plane_chunk,
        fast_cost_volume=opts.fast_cost_volume,
        compute_dtype=opts.compute_dtype,
    )


def init_or_load_params(opts: Options, model, sample_batch):
    """Initialize params, or load from a converted/orbax checkpoint.

    With opts.lazy_load_weights_from_checkpoint, tolerate missing/mismatched
    entries by merging what fits over fresh init (reference
    model_utils.py:47-63)."""
    cur_np, src_np = sample_batch
    cur = {k: jnp.asarray(cur_np[k]) for k in CUR_KEYS if k in cur_np}
    src = {k: jnp.asarray(src_np[k]) for k in SRC_KEYS if k in src_np}
    path = opts.load_weights_from_checkpoint
    if path and os.path.exists(path):
        from doubletake_tpu.checkpoints.io import load_params

        return _maybe_cast(opts, load_params(path))
    variables = jax.jit(model.init)(jax.random.PRNGKey(opts.random_seed), cur, src)
    lazy_path = opts.lazy_load_weights_from_checkpoint
    if lazy_path and os.path.exists(lazy_path):
        from doubletake_tpu.checkpoints.io import lazy_load_params, load_params

        variables = lazy_load_params(variables, load_params(lazy_path))
    return _maybe_cast(opts, variables)


def _maybe_cast(opts: Options, variables):
    """bf16 inference: cast params + stats so conv/matmul stacks compute in
    bf16 (flax dtype promotion; the model casts images at entry). Parity
    delta measured on TPU — see PERF_NOTES round 3."""
    if opts.compute_dtype == "bfloat16":
        from doubletake_tpu.checkpoints.io import cast_floating

        return cast_floating(variables, jnp.bfloat16)
    return variables


def rgb_for_fusion(opts: Options, cur, out_hw):
    """De-normalized RGB at fusion resolution for color fusion
    (fuse_color; reference Open3DFuser resizes color to the depth map)."""
    if not opts.fuse_color:
        return None
    from doubletake_tpu.ops.resize import interpolate_bilinear
    from doubletake_tpu.utils.io import IMAGENET_MEAN, IMAGENET_STD

    img = cur["image_bhw3"]
    img = img * jnp.asarray(IMAGENET_STD) + jnp.asarray(IMAGENET_MEAN)
    return jnp.clip(interpolate_bilinear(img, out_hw), 0.0, 1.0)


def depth_for_fusion(opts: Options, out):
    """Depth fed to the fuser, honoring mask_pred_depth (invalidate pixels
    with no valid MVS info) and fusion_use_raw_lowest_cost (fuse the cost
    volume argmax) — reference test_no_hint.py:214-240."""
    depth = out["depth_pred_s0_bhw1"]
    if opts.fusion_use_raw_lowest_cost:
        lowest = out["lowest_cost_bhw"][..., None]
        depth = interpolate_nearest(lowest, depth.shape[1:3])
    if opts.mask_pred_depth:
        mask = out["overall_mask_bhw"][..., None].astype(jnp.float32)
        m = interpolate_nearest(mask, depth.shape[1:3]) > 0.5
        depth = jnp.where(m, depth, -1.0)  # invalid coded -1 like the reference
    return depth


def finalize_tsdf(opts: Options, tsdf):
    """Pre-export TSDF trim: zero low-confidence voxels
    (reference fusers_helper.py:468-469, trim_tsdf_using_confience)."""
    if not opts.trim_tsdf_using_confience:
        return tsdf
    vals = jnp.where(tsdf.weights < 0.02, 0.0, tsdf.values.astype(jnp.float32))
    return tsdf.replace(values=vals.astype(tsdf.values.dtype))


def device_batch(cur_np: Dict, src_np: Dict):
    cur = {k: jnp.asarray(cur_np[k]) for k in CUR_KEYS if k in cur_np}
    src = {k: jnp.asarray(src_np[k]) for k in SRC_KEYS if k in src_np}
    return cur, src


def make_forward_fn(model, use_hint: bool):
    """A jitted forward: (variables, cur, src[, hint]) -> outputs dict."""

    if use_hint:
        @jax.jit
        def fwd(variables, cur, src, hint):
            return model.apply(variables, cur, src, hint=hint, return_mask=True)
    else:
        @jax.jit
        def fwd(variables, cur, src):
            return model.apply(variables, cur, src, return_mask=True)

    return fwd


def frame_metrics(depth_pred_bhw1, full_gt_bhw1, mult_a: bool = True):
    """Reference metric protocol: nearest-upsample pred to full-res GT,
    mask GT finite and > 0.5 m. Returns dict of per-frame (B,) arrays."""
    gt_hw = full_gt_bhw1.shape[1:3]
    pred_up = interpolate_nearest(depth_pred_bhw1, gt_hw)
    b = full_gt_bhw1.shape[0]
    gt = full_gt_bhw1.reshape(b, -1)
    pred = pred_up.reshape(b, -1)
    valid = jnp.isfinite(gt) & (gt > EVAL_MIN_DEPTH)
    return compute_depth_metrics_batched(gt, pred, valid, mult_a=mult_a)


_metrics_jit = jax.jit(partial(frame_metrics, mult_a=True))


def compute_frame_metrics(depth_pred_bhw1, full_gt_np):
    return _metrics_jit(depth_pred_bhw1, jnp.asarray(full_gt_np))


def scene_bounds_for_fusion(dataset, scan_id, max_extent: float = 10.0):
    """TSDF bounds: dataset GT bounds when available (get_fuser parity —
    fusers_helper.py:214-260 uses the GT mesh), else fixed +-max_extent."""
    if hasattr(dataset, "get_gt_mesh_bounds"):
        mn, mx = dataset.get_gt_mesh_bounds(scan_id)
        return {
            "xmin": float(mn[0]), "xmax": float(mx[0]),
            "ymin": float(mn[1]), "ymax": float(mx[1]),
            "zmin": float(mn[2]), "zmax": float(mx[2]),
        }
    return {
        "xmin": -max_extent, "xmax": max_extent,
        "ymin": -max_extent, "ymax": max_extent,
        "zmin": -max_extent, "zmax": max_extent,
    }


def make_fuser(opts: Options, dataset, scan_id) -> Tuple[TSDF, FusionConfig]:
    """Score-fuser parity: resolution/ max depth from opts (0.02 m / 3.5 m
    for published scores), extended negative truncation optional.

    depth_fuser selects the reference fuser family (get_fuser,
    fusers_helper.py:214-260): "ours" is the paper-score fuser;
    "open3d"/"custom_open3d" were the color-capable Open3D wrappers — here
    one TSDF covers all three, with color enabled for the open3d names."""
    if opts.depth_fuser not in ("ours", "open3d", "custom_open3d"):
        raise ValueError(f"depth_fuser: {opts.depth_fuser} unknown")
    with_color = opts.fuse_color or opts.depth_fuser in ("open3d", "custom_open3d")
    bounds = scene_bounds_for_fusion(dataset, scan_id)
    tsdf = TSDF.from_bounds(bounds, opts.fusion_resolution,
                            with_color=with_color)
    cfg = FusionConfig(
        min_depth=EVAL_MIN_DEPTH,
        max_depth=opts.fusion_max_depth,
        extended_neg_truncation=opts.extended_neg_truncation,
    )
    return tsdf, cfg


def resolve_raycast_samples(opts: Options, voxel_size: float,
                            max_depth: float) -> int:
    """opts.raycast_samples, with 0 meaning the band-derived minimal safe
    budget (tools.tsdf.auto_raycast_samples). EVERY runner that raycasts
    hints must route the option through here — passing a raw 0 into
    raycast_table would silently march at Sc=2 and produce near-empty
    hints (raycast_table also asserts against that)."""
    if opts.raycast_samples:
        return opts.raycast_samples
    from doubletake_tpu.tools.tsdf import auto_raycast_samples

    return auto_raycast_samples(
        voxel_size, EVAL_MIN_DEPTH, max_depth, opts.extended_neg_truncation
    )


def make_hint_fuser(opts: Options, dataset, scan_id) -> Tuple[TSDF, FusionConfig]:
    """Hint-mesh fuser locked to 0.04 m / 3.0 m
    (test_offline_two_pass.py:47-69)."""
    bounds = scene_bounds_for_fusion(dataset, scan_id)
    tsdf = TSDF.from_bounds(bounds, 0.04)
    cfg = FusionConfig(min_depth=EVAL_MIN_DEPTH, max_depth=3.0,
                       extended_neg_truncation=opts.extended_neg_truncation)
    return tsdf, cfg


def output_dirs(opts: Options, mode: str):
    base = os.path.join(opts.output_base_path, opts.name, mode)
    scores = os.path.join(base, "scores")
    meshes = os.path.join(base, "meshes")
    os.makedirs(scores, exist_ok=True)
    os.makedirs(meshes, exist_ok=True)
    return base, scores, meshes
