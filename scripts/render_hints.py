"""Generate training-data depth-hint renders (reference
scripts/render_scripts/render_meshes.py).

For each scan: fuse cached first-pass depths with the PartialFuser (full
and partial variants, optional depth noise), raycast hint depth + TSDF
weights at 256x192 per frame, and write pngs with the reference's scales
(depth x2048, weights x8192 — render_meshes.py:200,225-228) so the
ScanNet hint loader reads them directly.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
from PIL import Image

from doubletake_tpu.data.loader import DataLoader
from doubletake_tpu.datasets.registry import dataset_from_opts
from doubletake_tpu.options import OptionsHandler
from doubletake_tpu.runners.common import make_hint_fuser, scene_bounds_for_fusion
from doubletake_tpu.runners.no_hint import unique_scans
from doubletake_tpu.tools.partial_fuser import PartialFuser
from doubletake_tpu.tools.tsdf import TSDF, FusionConfig

RENDER_H, RENDER_W = 192, 256
DEPTH_SCALE = 2048.0
WEIGHT_SCALE = 8192.0


def save_png16(path, arr, scale):
    arr = np.where(np.isfinite(arr), arr, 0.0)
    Image.fromarray(np.clip(arr * scale, 0, 65535).astype(np.uint16)).save(path)


def load_cached_depths(cache_dir, scan):
    """npz files written by the no-hint runner with --cache_depths."""
    path = os.path.join(cache_dir, f"{scan.replace('/', '_')}_depths.npz")
    return np.load(path)


def main():
    handler = OptionsHandler()
    handler.parser.add_argument("--depth_cache_dir", type=str, required=True)
    handler.parser.add_argument("--render_output_dir", type=str, required=True)
    handler.parser.add_argument("--depth_noise", type=float, default=0.0)
    opts = handler.parse_and_merge_options()
    extra = handler.last_namespace

    probe = dataset_from_opts(opts, split=opts.split)
    scans = unique_scans(probe)
    if opts.single_debug_scan_id:
        scans = [s for s in scans if s == opts.single_debug_scan_id]

    for scan in scans:
        ds = dataset_from_opts(opts, split=opts.split, limit_to_scan_id=scan)
        cache = load_cached_depths(extra.depth_cache_dir, scan)
        bounds = scene_bounds_for_fusion(ds, scan)
        for variant in ("renders", "partial_renders"):
            tsdf = TSDF.from_bounds(bounds, 0.04)
            fuser = PartialFuser(
                tsdf, FusionConfig(min_depth=0.5, max_depth=3.0),
                depth_noise=extra.depth_noise if variant == "partial_renders" else 0.0,
            )
            out_dir = os.path.join(extra.render_output_dir, scan, variant)
            os.makedirs(out_dir, exist_ok=True)

            frame_ids = cache["frame_ids"]
            for i, fid in enumerate(frame_ids):
                world_T_cam, cam_T_world = ds.load_pose(scan, fid)
                K = ds.load_intrinsics(scan, fid)["K_s0_b44"]
                # partial: render from the state BEFORE this frame is fused
                depth, weights, valid = fuser.render_hint(
                    world_T_cam,
                    np.linalg.inv(_scale_K(K, ds)),
                    RENDER_H, RENDER_W,
                )
                save_png16(
                    os.path.join(out_dir, f"depth_{int(fid):06d}.png"),
                    np.asarray(depth), DEPTH_SCALE,
                )
                save_png16(
                    os.path.join(out_dir, f"weights_{int(fid):06d}.png"),
                    np.asarray(weights), WEIGHT_SCALE,
                )
                fuser.fuse_frame(cache["depths"][i], cam_T_world, K)
                if variant == "renders" and i == len(frame_ids) - 1:
                    # full renders: re-render every frame from the COMPLETE
                    # reconstruction
                    for fid2 in frame_ids:
                        wtc, _ = ds.load_pose(scan, fid2)
                        d2, w2, _ = fuser.render_hint(
                            wtc, np.linalg.inv(_scale_K(K, ds)),
                            RENDER_H, RENDER_W,
                        )
                        save_png16(
                            os.path.join(out_dir, f"depth_{int(fid2):06d}.png"),
                            np.asarray(d2), DEPTH_SCALE,
                        )
                        save_png16(
                            os.path.join(out_dir, f"weights_{int(fid2):06d}.png"),
                            np.asarray(w2), WEIGHT_SCALE,
                        )
        print(f"{scan}: hint renders written")


def _scale_K(K_s0, ds):
    """Scale depth-res K_s0 (at ds.depth_{width,height}) to the render res."""
    K = np.asarray(K_s0, np.float32).copy()
    K[0] *= RENDER_W / ds.depth_width
    K[1] *= RENDER_H / ds.depth_height
    return K


if __name__ == "__main__":
    main()
