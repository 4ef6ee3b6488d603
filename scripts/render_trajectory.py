"""Render a smoothed birdseye visualization video of a saved TSDF + trajectory.

Capability equivalent of the reference's pyrender visualization pipeline
(mesh_renderer.py + visualization_utils.py merged videos): loads a TSDF
saved by any runner, replays the scan's camera trajectory, and writes a
birdseye mp4 with the live camera drawn as a frustum marker.

Usage:
    python scripts/render_trajectory.py --config_file ... --data_config_file \
        ... --single_debug_scan_id SCAN --tsdf_path out/.../SCAN_tsdf.npz \
        --output viz.mp4
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from doubletake_tpu.datasets.registry import dataset_from_opts  # noqa: E402
from doubletake_tpu.options import OptionsHandler  # noqa: E402
from doubletake_tpu.tools.tsdf import TSDF  # noqa: E402
from doubletake_tpu.tools.viz_renderer import (  # noqa: E402
    SmoothBirdsEyeCamera,
    draw_camera_marker,
    observed_voxel_points,
    render_tsdf_view,
)
from doubletake_tpu.utils.visualization import save_video  # noqa: E402


def main():
    handler = OptionsHandler()
    handler.parser.add_argument("--tsdf_path", required=True)
    handler.parser.add_argument("--output", default="birdseye.mp4")
    handler.parser.add_argument("--viz_height", type=int, default=384)
    handler.parser.add_argument("--viz_width", type=int, default=512)
    opts = handler.parse_and_merge_options()
    extra = handler.last_namespace

    tsdf = TSDF.load(extra.tsdf_path)
    ds = dataset_from_opts(opts, split=opts.split,
                           limit_to_scan_id=opts.single_debug_scan_id)

    h, w = extra.viz_height, extra.viz_width
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 0.9 * w
    K[0, 2], K[1, 2] = w / 2, h / 2
    invK = np.linalg.inv(K)

    birdseye = SmoothBirdsEyeCamera()
    pts = observed_voxel_points(tsdf)

    frames = []
    for line in ds.frame_tuples:
        scan_id, ref_id = line.split(" ")[:2]
        world_T_cam, _ = ds.load_pose(scan_id, ref_id)
        be_pose = birdseye.get_bird_eye_trans(pts, fpv_pose=world_T_cam)
        rgb, _ = render_tsdf_view(tsdf, be_pose, invK, h, w)
        draw_camera_marker(rgb, world_T_cam, np.linalg.inv(be_pose), K)
        frames.append((np.clip(rgb, 0, 1) * 255).astype(np.uint8))
        if len(frames) % 20 == 0:
            print(f"rendered {len(frames)} frames")

    save_video(extra.output, frames, fps=15)
    print(f"wrote {extra.output} ({len(frames)} frames)")


if __name__ == "__main__":
    main()
