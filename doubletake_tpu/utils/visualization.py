"""Visualization helpers: depth colormapping, tiling, viz export.

Capability parity with reference utils/visualization_utils.py: turbo/
magma depth colormapping with percentile-based vmin/vmax (:15-73), image
tiling, and quick_viz_export-style depth dumps (:210-321). Video export
writes an image sequence (plus mp4 when an encoder is available) instead
of requiring moviepy.
"""

from __future__ import annotations

import os
import subprocess
from typing import Optional

import numpy as np

from doubletake_tpu.utils.io import reverse_imagenet_normalize


def colormap_image(
    depth_hw: np.ndarray,
    mask_hw: Optional[np.ndarray] = None,
    colormap: str = "turbo",
    vmin: Optional[float] = None,
    vmax: Optional[float] = None,
    return_vminvmax: bool = False,
):
    """Depth -> RGB [0,1] via matplotlib colormap; invalid pixels black.

    vmin/vmax default to robust percentiles over valid values
    (visualization_utils.py behavior).
    """
    from matplotlib import colormaps

    depth = np.asarray(depth_hw, np.float32)
    if depth.ndim == 3:
        depth = depth[..., 0]
    valid = np.isfinite(depth)
    if mask_hw is not None:
        valid &= np.asarray(mask_hw, bool).reshape(valid.shape)

    vals = depth[valid]
    if vmin is None:
        vmin = float(np.percentile(vals, 5)) if vals.size else 0.0
    if vmax is None:
        vmax = float(np.percentile(vals, 95)) if vals.size else 1.0
    denom = max(vmax - vmin, 1e-6)
    norm = np.clip((depth - vmin) / denom, 0.0, 1.0)
    rgb = colormaps[colormap](norm)[..., :3].astype(np.float32)
    rgb[~valid] = 0.0
    if return_vminvmax:
        return rgb, vmin, vmax
    return rgb


def tile_images(images, cols: int = 2):
    """Tile same-size HxWx3 images into a grid."""
    images = [np.asarray(im) for im in images]
    h, w = images[0].shape[:2]
    rows = (len(images) + cols - 1) // cols
    canvas = np.zeros((rows * h, cols * w, 3), images[0].dtype)
    for i, im in enumerate(images):
        r, c = divmod(i, cols)
        canvas[r * h: (r + 1) * h, c * w: (c + 1) * w] = im
    return canvas


def save_image(path: str, image_hw3: np.ndarray):
    from PIL import Image

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arr = np.clip(np.asarray(image_hw3) * 255.0, 0, 255).astype(np.uint8)
    Image.fromarray(arr).save(path)


def quick_viz_export(out_dir: str, frame_name: str, image_bhw3=None,
                     depth_pred=None, depth_gt=None, hint_depth=None,
                     fixed_min_max: bool = False):
    """Side-by-side viz panel per frame (quick_viz_export parity)."""
    panels = []
    vmin = 0.0 if fixed_min_max else None
    vmax = 5.0 if fixed_min_max else None
    if image_bhw3 is not None:
        rgb = reverse_imagenet_normalize(np.asarray(image_bhw3))
        panels.append(np.clip(rgb, 0, 1))
    if depth_gt is not None:
        gt_rgb, v0, v1 = colormap_image(
            depth_gt, vmin=vmin, vmax=vmax, return_vminvmax=True
        )
        panels.append(gt_rgb)
        vmin, vmax = v0, v1
    if depth_pred is not None:
        panels.append(colormap_image(depth_pred, vmin=vmin, vmax=vmax))
    if hint_depth is not None:
        panels.append(colormap_image(hint_depth, vmin=vmin, vmax=vmax))
    if not panels:
        return
    # resize everything to the first panel's size with nearest
    h, w = panels[0].shape[:2]
    resized = []
    for p in panels:
        if p.shape[:2] != (h, w):
            ys = np.floor(np.arange(h) * p.shape[0] / h).astype(int)
            xs = np.floor(np.arange(w) * p.shape[1] / w).astype(int)
            p = p[ys][:, xs]
        resized.append(p)
    save_image(os.path.join(out_dir, f"{frame_name}.png"), tile_images(resized))


def save_video(out_path: str, frames, fps: int = 30):
    """Write a list of HxWx3 uint8 frames to mp4 (png sequence fallback)."""
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        for i, f in enumerate(frames):
            save_image(os.path.join(d, f"{i:06d}.png"), f)
        if write_video(d, out_path, fps) is None:
            seq_dir = out_path + "_frames"
            os.makedirs(seq_dir, exist_ok=True)
            for i, f in enumerate(frames):
                save_image(os.path.join(seq_dir, f"{i:06d}.png"), f)
            return seq_dir
    return out_path


def write_video(image_dir: str, out_path: str, fps: int = 30):
    """Encode a png sequence to mp4 with ffmpeg when available; otherwise
    leave the sequence (viewable as-is)."""
    try:
        subprocess.run(
            ["ffmpeg", "-y", "-framerate", str(fps),
             "-pattern_type", "glob", "-i", os.path.join(image_dir, "*.png"),
             "-c:v", "libx264", "-pix_fmt", "yuv420p", out_path],
            check=True, capture_output=True,
        )
        return out_path
    except (FileNotFoundError, subprocess.CalledProcessError):
        return None
