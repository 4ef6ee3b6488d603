"""Revisit evaluation: hints from a previous session's volume.

Reference: src/doubletake/test_revisit.py (3RScan cross-session). The hint
volume is built from the FIRST visit of a scene; the rescan's frames are
evaluated with hints raycast from that volume after mapping rescan poses
into the first visit's world frame via ``first_scan_T_second_scan``
(:225-240).

Dataset hook: ``revisit_source_scan(scan_id) -> (first_scan_id,
first_T_second_44)``. ThreeRScanDataset parses 3RScan.json; the synthetic
dataset's rescans ("synthN@M") share the world frame (identity).
"""

from __future__ import annotations

import os
import time

import numpy as np

import jax.numpy as jnp

from doubletake_tpu.data.loader import DataLoader
from doubletake_tpu.datasets.registry import dataset_from_opts
from doubletake_tpu.options import Options
from doubletake_tpu.runners import common
from doubletake_tpu.runners.incremental import HINT_WEIGHT_THRESHOLD
from doubletake_tpu.runners.no_hint import unique_scans
from doubletake_tpu.runners.offline_two_pass import compute_hint_volume, make_pass2_step
from doubletake_tpu.tools.tsdf import build_ray_table, integrate_depth
from doubletake_tpu.utils.metrics import ResultsAverager

import jax


def run(opts: Options, variables=None):
    assert "hint" in opts.feature_volume_type
    base, scores_dir, meshes_dir = common.output_dirs(
        opts, f"revisit_{opts.frame_tuple_type}"
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
        rescan_ds = dataset_from_opts(
            opts, split=opts.split, limit_to_scan_id=scan_id,
            include_full_res_depth=True,
        )
        if not hasattr(rescan_ds, "revisit_source_scan"):
            raise ValueError(f"dataset {opts.dataset} does not support revisit")
        first_scan_id, first_T_second = rescan_ds.revisit_source_scan(scan_id)
        first_T_second = jnp.asarray(first_T_second)

        first_ds = dataset_from_opts(
            opts, split=opts.split, limit_to_scan_id=first_scan_id,
            include_full_res_depth=True,
        )
        if variables is None:
            for first in DataLoader(first_ds, batch_size=1, num_workers=1):
                variables = common.init_or_load_params(opts, model, first)
                break

        # hint volume from visit 1 (empty-hint pass, locked hint fuser)
        hint_tsdf = compute_hint_volume(opts, model, variables, first_ds, first_scan_id)

        samples = common.resolve_raycast_samples(
            opts, hint_tsdf.voxel_size, 3.0
        )
        step = make_pass2_step(model, hint_h, hint_w, samples, 3.0)
        # the visit-1 hint volume is static for the whole rescan: build its
        # ray table once (batched raycast vmaps over rescan poses)
        rt = jax.jit(build_ray_table)(hint_tsdf)
        loader = DataLoader(rescan_ds, batch_size=1, shuffle=False,
                            num_workers=min(4, opts.num_workers))
        tsdf = None
        if opts.run_fusion:
            # optional fusion of the rescan's predictions (test_revisit.py
            # supports the final 0.02/3.5 fuser like the other modes)
            tsdf, cfg = common.make_fuser(opts, rescan_ds, scan_id)
            fuse = jax.jit(
                lambda vol, d, c, k: integrate_depth(vol, d, c, k, cfg),
                donate_argnums=0,
            )
        scan_metrics = ResultsAverager(opts.name, f"scan {scan_id}")
        for cur_np, src_np in loader:
            cur, src = common.device_batch(cur_np, src_np)
            # map the rescan pose into the first visit's world frame for the
            # raycast only — the model still sees rescan-frame geometry
            cur_mapped = dict(cur)
            cur_mapped["hint_world_T_cam_b44"] = jnp.einsum(
                "ij,bjk->bik", first_T_second, cur["world_T_cam_b44"]
            )
            t0 = time.perf_counter()
            out, hint = step(variables, rt, cur_mapped, src)
            depth = out["depth_pred_s0_bhw1"]
            depth.block_until_ready()

            metrics = common.compute_frame_metrics(depth, cur_np["full_res_depth_bhw1"])
            fm = {k: float(np.asarray(v)[0]) for k, v in metrics.items()}
            fm["frame_time"] = time.perf_counter() - t0
            fm["hint_coverage"] = float(np.asarray(hint["hint_mask_bhw1"]).mean())
            scan_metrics.update_results(fm)
            all_frame_avg.update_results(fm)

            if opts.run_fusion:
                fusion_depth = common.depth_for_fusion(opts, out)
                tsdf = fuse(tsdf, fusion_depth[0],
                            cur["cam_T_world_b44"][0], cur["K_s0_b44"][0])

        if opts.run_fusion:
            tsdf = common.finalize_tsdf(opts, tsdf)
            tsdf.save(os.path.join(
                meshes_dir, f"{scan_id.replace('/', '_')}_tsdf.npz"))
            try:
                from doubletake_tpu.tools.marching_cubes import export_mesh

                export_mesh(tsdf, os.path.join(
                    meshes_dir, f"{scan_id.replace('/', '_')}.ply"))
            except ImportError:
                pass

        scan_metrics.compute_final_average()
        scan_metrics.output_json(
            os.path.join(scores_dir, f"{scan_id.replace('/', '_')}_metrics.json")
        )
        scene_avg.update_results(scan_metrics.final_metrics)

    all_frame_avg.compute_final_average()
    scene_avg.compute_final_average()
    all_frame_avg.output_json(os.path.join(scores_dir, "all_frame_avg_metrics.json"))
    scene_avg.output_json(os.path.join(scores_dir, "scene_avg_metrics.json"))
    print("\nScene averages:")
    scene_avg.pretty_print_results()
    print("\nFrame averages:")
    all_frame_avg.pretty_print_results()
    return {"frame_avg": all_frame_avg.final_metrics, "scene_avg": scene_avg.final_metrics}
