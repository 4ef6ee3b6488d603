"""No-hint depth evaluation (reference src/doubletake/test_no_hint.py).

Per-scan depth inference (SimpleRecon, or DoubleTake with empty hints),
metrics against full-res GT (valid > 0.5 m), optional TSDF fusion + mesh
export, per-scene and overall JSON score artifacts.
"""

from __future__ import annotations

import os
import time
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from doubletake_tpu.data.loader import DataLoader
from doubletake_tpu.datasets.registry import dataset_from_opts
from doubletake_tpu.options import Options
from doubletake_tpu.runners import common
from doubletake_tpu.tools.tsdf import integrate_depth
from doubletake_tpu.utils.metrics import ResultsAverager


def unique_scans(dataset):
    seen, scans = set(), []
    for line in dataset.frame_tuples:
        scan = line.split(" ")[0]
        if scan not in seen:
            seen.add(scan)
            scans.append(scan)
    return scans


def run(opts: Options, variables=None):
    base, scores_dir, meshes_dir = common.output_dirs(opts, f"no_hint_{opts.frame_tuple_type}")
    model = common.build_model(opts)
    use_hint = "hint" in opts.feature_volume_type

    probe = dataset_from_opts(opts, split=opts.split, include_full_res_depth=True)
    scans = unique_scans(probe)
    if opts.single_debug_scan_id:
        scans = [s for s in scans if s == opts.single_debug_scan_id]

    fwd = common.make_forward_fn(model, use_hint=use_hint)

    all_frame_avg = ResultsAverager(opts.name, "frame avg")
    scene_avg = ResultsAverager(opts.name, "scene avg")

    for scan_id in scans:
        ds = dataset_from_opts(
            opts, split=opts.split, limit_to_scan_id=scan_id,
            include_full_res_depth=True, pass_frame_id=opts.cache_depths,
        )
        loader = DataLoader(ds, batch_size=opts.batch_size, shuffle=False,
                            num_workers=opts.num_workers)
        scan_metrics = ResultsAverager(opts.name, f"scan {scan_id}")
        cached_depths, cached_frame_ids = [], []

        tsdf = cfg = None
        if opts.run_fusion:
            tsdf, cfg = common.make_fuser(opts, ds, scan_id)
            fuse = jax.jit(
                lambda vol, d, c, k, img=None: integrate_depth(
                    vol, d, c, k, cfg, image_hw3=img),
                donate_argnums=0, static_argnames=(),
            )

        if variables is None:
            for first in loader:
                variables = common.init_or_load_params(opts, model, first)
                break

        times = []
        for cur_np, src_np in loader:
            cur, src = common.device_batch(cur_np, src_np)
            t0 = time.perf_counter()
            if use_hint:
                b, h, w = cur["image_bhw3"].shape[:3]
                hint = {
                    "depth_hint_bhw1": jnp.zeros((b, h, w, 1)),
                    "hint_mask_bhw1": jnp.zeros((b, h, w, 1), bool),
                    "sampled_weights_bhw1": jnp.zeros((b, h, w, 1)),
                }
                out = fwd(variables, cur, src, hint)
            else:
                out = fwd(variables, cur, src)
            depth = out["depth_pred_s0_bhw1"]
            depth.block_until_ready()
            times.append(time.perf_counter() - t0)

            metrics = common.compute_frame_metrics(
                depth, cur_np["full_res_depth_bhw1"]
            )
            metrics = {k: np.asarray(v) for k, v in metrics.items()}
            bsz = depth.shape[0]
            for i in range(bsz):
                fm = {k: float(v[i]) for k, v in metrics.items()}
                fm["model_time"] = times[-1] / bsz
                scan_metrics.update_results(fm)
                all_frame_avg.update_results(fm)

            if opts.run_fusion:
                fusion_depth = common.depth_for_fusion(opts, out)
                rgb = common.rgb_for_fusion(opts, cur, fusion_depth.shape[1:3])
                for i in range(fusion_depth.shape[0]):
                    tsdf = fuse(
                        tsdf, fusion_depth[i],
                        cur["cam_T_world_b44"][i], cur["K_s0_b44"][i],
                        None if rgb is None else rgb[i],
                    )

            if opts.cache_depths:
                cached_depths.append(np.asarray(depth))
                cached_frame_ids.extend(cur_np.get("frame_id_string", []))

        scan_metrics.compute_final_average()
        scan_metrics.output_json(os.path.join(scores_dir, f"{scan_id.replace('/', '_')}_metrics.json"))
        scene_avg.update_results(scan_metrics.final_metrics)

        if opts.cache_depths and cached_depths:
            cache_dir = os.path.join(base, "depth_cache")
            os.makedirs(cache_dir, exist_ok=True)
            np.savez_compressed(
                os.path.join(cache_dir, f"{scan_id.replace('/', '_')}_depths.npz"),
                depths=np.concatenate(cached_depths, axis=0),
                frame_ids=np.asarray(
                    [fid.split("_")[-1] for fid in cached_frame_ids]
                ),
            )

        if opts.run_fusion:
            tsdf = common.finalize_tsdf(opts, tsdf)
            tsdf.save(os.path.join(meshes_dir, f"{scan_id.replace('/', '_')}_tsdf.npz"))
            try:
                from doubletake_tpu.tools.marching_cubes import export_mesh

                export_mesh(
                    tsdf, os.path.join(meshes_dir, f"{scan_id.replace('/', '_')}.ply")
                )
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
