"""Offline two-pass DoubleTake evaluation.

Reference: src/doubletake/test_offline_two_pass.py. Pass 1 runs the model
with EMPTY hints over the scan and fuses predictions into a hint volume
locked at 0.04 m / 3.0 m (:47-69); pass 2 re-estimates every depth with
hints raycast from that static volume, optionally fusing a final volume at
the score resolution (0.02 m / 3.5 m).
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
from doubletake_tpu.runners.incremental import HINT_WEIGHT_THRESHOLD
from doubletake_tpu.runners.no_hint import unique_scans
from doubletake_tpu.tools.tsdf import (
    TSDF, build_ray_table, integrate_depth, raycast, raycast_table,
)
from doubletake_tpu.utils.metrics import ResultsAverager


def compute_hint_volume(opts, model, variables, ds, scan_id):
    """Pass 1: empty-hint inference + fusion into the locked hint volume."""
    tsdf, cfg = common.make_hint_fuser(opts, ds, scan_id)
    fwd = common.make_forward_fn(model, use_hint=True)
    fuse = jax.jit(
        lambda vol, d, c, k: integrate_depth(vol, d, c, k, cfg), donate_argnums=0
    )
    loader = DataLoader(ds, batch_size=opts.batch_size, shuffle=False,
                        num_workers=opts.num_workers)
    for cur_np, src_np in loader:
        cur, src = common.device_batch(cur_np, src_np)
        b, h, w = cur["image_bhw3"].shape[:3]
        empty = {
            "depth_hint_bhw1": jnp.zeros((b, h, w, 1)),
            "hint_mask_bhw1": jnp.zeros((b, h, w, 1), bool),
            "sampled_weights_bhw1": jnp.zeros((b, h, w, 1)),
        }
        out = fwd(variables, cur, src, empty)
        depth = out["depth_pred_s0_bhw1"]
        for i in range(depth.shape[0]):
            tsdf = fuse(tsdf, depth[i], cur["cam_T_world_b44"][i], cur["K_s0_b44"][i])
    return tsdf


def make_pass2_step(model, hint_h, hint_w, raycast_samples, hint_max_depth):
    """Pass 2 step: raycast the STATIC hint volume at the frame poses, then
    forward with hints. Batched: the hint volume's ray table is prebuilt
    once per scan (build_ray_table) and the per-frame raycast vmaps over
    the batch — pass 2 is the throughput mode (SURVEY §2.7), so frames run
    at opts.batch_size through one dispatch. (No fusion inside; final
    fusion is separate.)"""

    @jax.jit
    def step(variables, rt, cur, src):
        # revisit mode maps the raycast pose into the hint volume's world
        # frame via "hint_world_T_cam_b44"; the model still sees the
        # original poses (its MVS math only uses relative transforms)
        raycast_pose = cur.get("hint_world_T_cam_b44", cur["world_T_cam_b44"])
        hint_d, hint_wt, hint_v = jax.vmap(
            lambda p, ik: raycast_table(
                rt, p, ik, hint_h, hint_w,
                min_depth=common.EVAL_MIN_DEPTH,
                max_depth=hint_max_depth,
                num_samples=raycast_samples,
            )
        )(raycast_pose, cur["invK_s0_b44"])
        valid = hint_v & (hint_wt >= HINT_WEIGHT_THRESHOLD)
        hint = {
            "depth_hint_bhw1": jnp.where(valid, hint_d, jnp.nan)[..., None],
            "hint_mask_bhw1": valid[..., None],
            "sampled_weights_bhw1": jnp.where(valid, hint_wt, 0.0)[..., None],
        }
        model_cur = {k: v for k, v in cur.items() if k != "hint_world_T_cam_b44"}
        out = model.apply(variables, model_cur, src, hint=hint, return_mask=True)
        return out, hint

    return step


def run(opts: Options, variables=None):
    assert "hint" in opts.feature_volume_type
    base, scores_dir, meshes_dir = common.output_dirs(
        opts, f"offline_two_pass_{opts.frame_tuple_type}"
    )
    model = common.build_model(opts)

    probe = dataset_from_opts(opts, split=opts.split, include_full_res_depth=True)
    scans = unique_scans(probe)
    if opts.single_debug_scan_id:
        scans = [s for s in scans if s == opts.single_debug_scan_id]

    hint_h, hint_w = opts.image_height // 4, opts.image_width // 4

    all_frame_avg = ResultsAverager(opts.name, "frame avg")
    scene_avg = ResultsAverager(opts.name, "scene avg")

    for scan_id in scans:
        ds = dataset_from_opts(
            opts, split=opts.split, limit_to_scan_id=scan_id,
            include_full_res_depth=True,
        )
        if variables is None:
            for first in DataLoader(ds, batch_size=1, num_workers=1):
                variables = common.init_or_load_params(opts, model, first)
                break

        # ---- pass 1: build the hint volume -------------------------------
        hint_tsdf = compute_hint_volume(opts, model, variables, ds, scan_id)
        hint_tsdf.save(
            os.path.join(meshes_dir, f"{scan_id.replace('/', '_')}_hint_tsdf.npz")
        )

        # ---- pass 2: hint-conditioned re-estimation ----------------------
        samples = common.resolve_raycast_samples(
            opts, hint_tsdf.voxel_size, 3.0
        )
        step = make_pass2_step(model, hint_h, hint_w, samples, 3.0)

        final_tsdf = final_cfg = fuse = None
        if opts.run_fusion:
            final_tsdf, final_cfg = common.make_fuser(opts, ds, scan_id)
            fuse = jax.jit(
                lambda vol, d, c, k: integrate_depth(vol, d, c, k, final_cfg),
                donate_argnums=0,
            )

        # batched pass 2: the ray table is built ONCE for the static hint
        # volume; frames run at opts.batch_size through one dispatch
        rt = jax.jit(build_ray_table)(hint_tsdf)
        loader = DataLoader(ds, batch_size=max(1, opts.batch_size),
                            shuffle=False,
                            num_workers=min(4, opts.num_workers))
        scan_metrics = ResultsAverager(opts.name, f"scan {scan_id}")
        for cur_np, src_np in loader:
            cur, src = common.device_batch(cur_np, src_np)
            t0 = time.perf_counter()
            out, hint = step(variables, rt, cur, src)
            depth = out["depth_pred_s0_bhw1"]
            depth.block_until_ready()
            frame_time = (time.perf_counter() - t0) / depth.shape[0]

            metrics = common.compute_frame_metrics(depth, cur_np["full_res_depth_bhw1"])
            hint_cov = np.asarray(hint["hint_mask_bhw1"])
            for bi in range(depth.shape[0]):
                fm = {k: float(np.asarray(v)[bi]) for k, v in metrics.items()}
                fm["frame_time"] = frame_time
                fm["hint_coverage"] = float(hint_cov[bi].mean())
                scan_metrics.update_results(fm)
                all_frame_avg.update_results(fm)

            if opts.run_fusion:
                fusion_depth = common.depth_for_fusion(opts, out)
                for bi in range(depth.shape[0]):
                    # sequential: the running weighted mean is order-dependent
                    final_tsdf = fuse(
                        final_tsdf, fusion_depth[bi],
                        cur["cam_T_world_b44"][bi], cur["K_s0_b44"][bi]
                    )

        scan_metrics.compute_final_average()
        scan_metrics.output_json(
            os.path.join(scores_dir, f"{scan_id.replace('/', '_')}_metrics.json")
        )
        scene_avg.update_results(scan_metrics.final_metrics)

        if opts.run_fusion:
            final_tsdf = common.finalize_tsdf(opts, final_tsdf)
            final_tsdf.save(os.path.join(meshes_dir, f"{scan_id.replace('/', '_')}_tsdf.npz"))
            try:
                from doubletake_tpu.tools.marching_cubes import export_mesh

                export_mesh(final_tsdf,
                            os.path.join(meshes_dir, f"{scan_id.replace('/', '_')}.ply"))
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
