"""Incremental (online) DoubleTake evaluation — the flagship mode.

Reference: src/doubletake/test_incremental.py. Per scan, frames arrive in
order; each frame raycasts the running TSDF for a hint (depth + confidence,
invalid below weight 0.025 — :244), runs the model with the hint injected
into the cost volume, computes metrics, and fuses the predicted depth back
into the volume.

TPU-native design: hint raycast + model forward + TSDF fusion are ONE
jitted step with the volume donated, so the whole per-frame loop is a
single device dispatch with no host round-trips (the reference pays
mesh-extraction + rasterization + three kernel launches here). The first
frame needs no special case: raycasting an empty volume yields an
all-invalid hint.
"""

from __future__ import annotations

import os
import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from doubletake_tpu.data.loader import DataLoader
from doubletake_tpu.datasets.registry import dataset_from_opts
from doubletake_tpu.options import Options
from doubletake_tpu.runners import common
from doubletake_tpu.runners.no_hint import unique_scans
from doubletake_tpu.tools.tsdf import integrate_depth, raycast
from doubletake_tpu.utils.metrics import ResultsAverager

HINT_WEIGHT_THRESHOLD = 0.025  # test_incremental.py:244


def make_step(model, cfg, hint_h, hint_w, raycast_samples, fusion_max_depth,
              opts=None):
    """Fused per-frame step: raycast hint -> forward -> fuse.

    Returns (step, step_cached): identical except step_cached takes the src
    views' precomputed matching features (the inference feature cache — every
    src view of a sequential scan was already encoded when it was the cur
    frame; reuse is bit-identical, see DepthModel.__call__ docstring), so the
    matching encoder runs on 1 image instead of model_num_views.
    """

    use_mip = bool(getattr(opts, "raycast_mip", False)) if opts else False

    def _step(variables, tsdf, cur, src, src_feats=None):
        # 1) hint from the running volume, at depth-output resolution
        hint_d, hint_wt, hint_v = raycast(
            tsdf,
            cur["world_T_cam_b44"][0],
            cur["invK_s0_b44"][0],
            hint_h,
            hint_w,
            min_depth=common.EVAL_MIN_DEPTH,
            max_depth=fusion_max_depth,
            num_samples=raycast_samples,
            use_mip=use_mip,
        )
        valid = hint_v & (hint_wt >= HINT_WEIGHT_THRESHOLD)
        hint = {
            "depth_hint_bhw1": jnp.where(valid, hint_d, jnp.nan)[None, ..., None],
            "hint_mask_bhw1": valid[None, ..., None],
            "sampled_weights_bhw1": jnp.where(valid, hint_wt, 0.0)[None, ..., None],
        }

        # 2) model forward with the hint
        out = model.apply(
            variables, cur, src, hint=hint, return_mask=True,
            src_matching_feats=src_feats,
        )
        depth = out["depth_pred_s0_bhw1"]

        # 3) fuse prediction into the volume
        fusion_depth = (
            common.depth_for_fusion(opts, out) if opts is not None else depth
        )
        new_tsdf = integrate_depth(
            tsdf, fusion_depth[0], cur["cam_T_world_b44"][0], cur["K_s0_b44"][0], cfg
        )
        return out, hint, new_tsdf

    step = partial(jax.jit, donate_argnums=(1,))(
        lambda variables, tsdf, cur, src: _step(variables, tsdf, cur, src)
    )
    step_cached = partial(jax.jit, donate_argnums=(1,))(
        lambda variables, tsdf, cur, src, src_feats: _step(
            variables, tsdf, cur, src, src_feats
        )
    )
    return step, step_cached


def make_split_steps(model, cfg, hint_h, hint_w, raycast_samples,
                     fusion_max_depth, opts=None):
    """Separate hint / forward / fuse dispatches so model_time and hint_time
    can be measured independently (the reference's CUDA-event timing,
    test_incremental.py:273-288). Slower than the fused step — use only for
    profiling (--split_timing)."""

    use_mip = bool(getattr(opts, "raycast_mip", False)) if opts else False

    @jax.jit
    def hint_step(tsdf, cur):
        hint_d, hint_wt, hint_v = raycast(
            tsdf, cur["world_T_cam_b44"][0], cur["invK_s0_b44"][0],
            hint_h, hint_w, min_depth=common.EVAL_MIN_DEPTH,
            max_depth=fusion_max_depth, num_samples=raycast_samples,
            use_mip=use_mip,
        )
        valid = hint_v & (hint_wt >= HINT_WEIGHT_THRESHOLD)
        return {
            "depth_hint_bhw1": jnp.where(valid, hint_d, jnp.nan)[None, ..., None],
            "hint_mask_bhw1": valid[None, ..., None],
            "sampled_weights_bhw1": jnp.where(valid, hint_wt, 0.0)[None, ..., None],
        }

    @jax.jit
    def forward_step(variables, cur, src, hint):
        return model.apply(variables, cur, src, hint=hint, return_mask=True)

    @partial(jax.jit, donate_argnums=(0,))
    def fuse_step(tsdf, out, cur):
        fusion_depth = (
            common.depth_for_fusion(opts, out) if opts is not None
            else out["depth_pred_s0_bhw1"]
        )
        return integrate_depth(
            tsdf, fusion_depth[0], cur["cam_T_world_b44"][0],
            cur["K_s0_b44"][0], cfg,
        )

    return hint_step, forward_step, fuse_step


def run(opts: Options, variables=None):
    assert "hint" in opts.feature_volume_type, (
        "incremental mode needs a hint model (mlp_mesh_hint_feature_volume)"
    )
    base, scores_dir, meshes_dir = common.output_dirs(
        opts, f"incremental_{opts.frame_tuple_type}"
    )
    model = common.build_model(opts)

    probe = dataset_from_opts(opts, split=opts.split, include_full_res_depth=True)
    scans = unique_scans(probe)
    if opts.single_debug_scan_id:
        scans = [s for s in scans if s == opts.single_debug_scan_id]

    # render hints at MATCHING resolution (image/4): the cost volume
    # consumes the hint nearest-resized to matching res anyway, so
    # raycasting directly there is information-equivalent to the
    # reference's half-res render + nearest resize (rendering_utils.py
    # renders 256x192 for 512x384 input) at 4x fewer rays.
    hint_h = opts.image_height // 4
    hint_w = opts.image_width // 4

    all_frame_avg = ResultsAverager(opts.name, "frame avg")
    scene_avg = ResultsAverager(opts.name, "scene avg")

    for scan_id in scans:
        ds = dataset_from_opts(
            opts, split=opts.split, limit_to_scan_id=scan_id,
            include_full_res_depth=True, pass_frame_id=True,
        )
        # batch size 1 is mandatory: frames are sequential (reference :25)
        loader = DataLoader(ds, batch_size=1, shuffle=False,
                            num_workers=min(4, opts.num_workers))

        tsdf, cfg = common.make_fuser(opts, ds, scan_id)
        # raycast_samples == 0 -> derive the minimal safe budget from the
        # truncation band (auto_raycast_samples docstring)
        samples = common.resolve_raycast_samples(
            opts, tsdf.voxel_size, opts.fusion_max_depth
        )
        step_args = (model, cfg, hint_h, hint_w, samples,
                     opts.fusion_max_depth)
        if opts.split_timing:
            hint_step, forward_step, fuse_step = make_split_steps(
                *step_args, opts=opts
            )
        else:
            step, step_cached = make_step(*step_args, opts=opts)

        # matching-feature cache: frame_id -> (h/4, w/4, C) device array.
        # Bounded LRU — keyframe tuples only reach back a few dozen frames.
        from collections import OrderedDict

        feat_cache: "OrderedDict[str, jnp.ndarray]" = OrderedDict()
        FEAT_CACHE_MAX = 64

        scan_metrics = ResultsAverager(opts.name, f"scan {scan_id}")
        frame_idx = 0
        frames = iter(loader)

        def fetch():
            """Pull the next host batch and START its async host->device
            transfer (jax device transfers are asynchronous) so input feed
            overlaps the in-flight frame's device compute — the dispatch
            overhead on this platform otherwise serializes with compute
            (PERF_NOTES round 2/3)."""
            try:
                cur_np, src_np = next(frames)
            except StopIteration:
                return None
            return cur_np, src_np, common.device_batch(cur_np, src_np)

        pending = fetch()
        while pending is not None:
            cur_np, src_np, (cur, src) = pending
            if variables is None:
                variables = common.init_or_load_params(opts, model, (cur_np, src_np))

            t0 = time.perf_counter()
            split_times = {}
            if opts.split_timing:
                # separate dispatches for the reference's model_time /
                # hint_time split (test_incremental.py:273-288)
                hint = hint_step(tsdf, cur)
                jax.block_until_ready(hint)
                t1 = time.perf_counter()
                out = forward_step(variables, cur, src, hint)
                out["depth_pred_s0_bhw1"].block_until_ready()
                t2 = time.perf_counter()
                tsdf = fuse_step(tsdf, out, cur)
                split_times = {"hint_time": t1 - t0, "model_time": t2 - t1}
                pending = fetch()
            else:
                has_ids = (
                    "frame_id_string" in cur_np and "frame_id_string" in src_np
                )
                src_feats = None
                if has_ids:
                    ids = src_np["frame_id_string"][0]
                    if all(i in feat_cache for i in ids):
                        src_feats = jnp.stack(
                            [feat_cache[i] for i in ids]
                        )[None]
                if src_feats is not None:
                    out, hint, tsdf = step_cached(
                        variables, tsdf, cur, src, src_feats
                    )
                else:
                    out, hint, tsdf = step(variables, tsdf, cur, src)
                if has_ids:
                    fid = cur_np["frame_id_string"][0]
                    feat_cache[fid] = out["matching_feats_bhwc"][0]
                    feat_cache.move_to_end(fid)
                    while len(feat_cache) > FEAT_CACHE_MAX:
                        feat_cache.popitem(last=False)
                # prefetch the NEXT frame while this one runs on device
                pending = fetch()
            depth = out["depth_pred_s0_bhw1"]
            depth.block_until_ready()
            frame_time = time.perf_counter() - t0

            metrics = common.compute_frame_metrics(depth, cur_np["full_res_depth_bhw1"])
            fm = {k: float(np.asarray(v)[0]) for k, v in metrics.items()}
            fm["frame_time"] = frame_time
            fm.update(split_times)
            fm["hint_coverage"] = float(np.asarray(hint["hint_mask_bhw1"]).mean())
            scan_metrics.update_results(fm)
            all_frame_avg.update_results(fm)

            if opts.dump_depth_visualization:
                from doubletake_tpu.utils.visualization import quick_viz_export

                quick_viz_export(
                    os.path.join(base, "viz"),
                    f"{scan_id.replace('/', '_')}_{frame_idx:06d}",
                    image_bhw3=cur_np["image_bhw3"][0],
                    depth_pred=np.asarray(depth[0]),
                    depth_gt=cur_np["depth_bhw1"][0],
                    hint_depth=np.asarray(hint["depth_hint_bhw1"][0]),
                    fixed_min_max=opts.viz_fixed_min_max,
                )
            frame_idx += 1

        scan_metrics.compute_final_average()
        scan_metrics.output_json(
            os.path.join(scores_dir, f"{scan_id.replace('/', '_')}_metrics.json")
        )
        scene_avg.update_results(scan_metrics.final_metrics)

        tsdf = common.finalize_tsdf(opts, tsdf)
        tsdf.save(os.path.join(meshes_dir, f"{scan_id.replace('/', '_')}_tsdf.npz"))
        try:
            from doubletake_tpu.tools.marching_cubes import export_mesh

            export_mesh(tsdf, os.path.join(meshes_dir, f"{scan_id.replace('/', '_')}.ply"))
        except ImportError:
            pass

    all_frame_avg.compute_final_average()
    scene_avg.compute_final_average()
    all_frame_avg.output_json(os.path.join(scores_dir, "all_frame_avg_metrics.json"))
    scene_avg.output_json(os.path.join(scores_dir, "scene_avg_metrics.json"))
    print("\nScene averages:")
    scene_avg.pretty_print_results()
    print("\nFrame averages:")
    all_frame_avg.pretty_print_results()
    return {"frame_avg": all_frame_avg.final_metrics, "scene_avg": scene_avg.final_metrics}
