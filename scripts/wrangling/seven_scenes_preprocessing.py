"""Register 7-Scenes Kinect depth to the RGB sensor (``depth.proj.png``).

TPU-repo equivalent of reference scripts/data_scripts/7scenes_preprocessing.py:
the raw 7-Scenes depth maps come from the Kinect IR sensor (focal 585) and
are not registered to the RGB camera (focal 525); this script backprojects
each depth map, transforms by the published depth->RGB calibration
(https://projet.liris.cnrs.fr/voir/activities-dataset/kinect-calibration.html),
re-projects into the RGB frame with a z-buffer min-splat, and writes the
result next to the source as ``frame-XXXXXX.depth.proj.png`` (uint16 mm) —
the file doubletake_tpu/datasets/seven_scenes.py reads.

Fresh implementation: the splat is vectorized with ``np.minimum.at``
(the reference loops over every pixel in Python), making this ~100x faster.
"""

from __future__ import annotations

import argparse
import os
from multiprocessing import Pool

import numpy as np

RGB_FOCAL = 525.0
DEPTH_FOCAL = 585.0
IMG_W, IMG_H = 640, 480

# depth -> RGB sensor transform (public LIRIS Kinect calibration)
D_TO_RGB = np.array(
    [
        [9.9996518012567637e-01, 2.6765126468950343e-03, -7.9041012313000904e-03,
         -2.5558943178152542e-02],
        [-2.7409311281316700e-03, 9.9996302803027592e-01, -8.1504520778013286e-03,
         1.0109636268061706e-04],
        [7.8819942130445332e-03, 8.1718328771890631e-03, 9.9993554558014031e-01,
         2.0318321729487039e-03],
        [0.0, 0.0, 0.0, 1.0],
    ]
)

SCENES = ["chess", "fire", "heads", "office", "pumpkin", "redkitchen", "stairs"]


def register_depth(depth_m: np.ndarray) -> np.ndarray:
    """Depth (meters, HxW from the IR sensor) -> registered uint16 mm map."""
    d_h, d_w = depth_m.shape
    ys, xs = np.meshgrid(np.arange(d_h), np.arange(d_w), indexing="ij")
    valid = (depth_m > 0) & (depth_m < 100)
    z = depth_m[valid]
    x = ((xs[valid] + 0.5) - d_w / 2) / DEPTH_FOCAL * z
    y = ((ys[valid] + 0.5) - d_h / 2) / DEPTH_FOCAL * z
    pts = np.stack([x, y, z, np.ones_like(z)], axis=0)
    pts = D_TO_RGB @ pts

    pz = pts[2]
    u = np.rint(pts[0] / pz * RGB_FOCAL + IMG_W / 2).astype(np.int64)
    v = np.rint(pts[1] / pz * RGB_FOCAL + IMG_H / 2).astype(np.int64)
    # the reference bounds-checks against the DEPTH dims; same here
    keep = (u >= 0) & (v >= 0) & (u < d_w) & (v < d_h) & (pz > 0)

    registered = np.full((IMG_H, IMG_W), 2e3, np.float32)
    np.minimum.at(registered, (v[keep], u[keep]), pz[keep].astype(np.float32))
    registered[registered > 1e3] = 0
    return (registered * 1000).astype(np.uint16)


def process_scene(scene_dir: str):
    from PIL import Image

    for split_file in ("TrainSplit.txt", "TestSplit.txt"):
        path = os.path.join(scene_dir, split_file)
        if not os.path.exists(path):
            continue
        with open(path) as f:
            seqs = ["seq-" + line.strip()[8:].zfill(2) for line in f if line.strip()]
        for seq in seqs:
            seq_dir = os.path.join(scene_dir, seq)
            if not os.path.isdir(seq_dir):
                continue
            depth_files = sorted(
                f for f in os.listdir(seq_dir)
                if f.endswith("depth.png") and not f.endswith("depth.proj.png")
            )
            for i, name in enumerate(depth_files):
                depth = np.asarray(
                    Image.open(os.path.join(seq_dir, name)), np.float32
                ) / 1000.0
                out = register_depth(depth)
                out_path = os.path.join(
                    seq_dir, name.replace("depth.png", "depth.proj.png")
                )
                Image.fromarray(out.astype(np.int32), mode="I").convert(
                    "I;16"
                ).save(out_path)
                if i % 200 == 0:
                    print(f"{scene_dir} {seq}: {i}/{len(depth_files)}")
    return scene_dir


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--dataset_path", required=True,
                    help="7scenes root containing chess/fire/...")
    ap.add_argument("--num_workers", type=int, default=7)
    args = ap.parse_args()

    dirs = [os.path.join(args.dataset_path, s) for s in SCENES
            if os.path.isdir(os.path.join(args.dataset_path, s))]
    with Pool(min(args.num_workers, max(len(dirs), 1))) as pool:
        for d in pool.imap_unordered(process_scene, dirs):
            print(f"done {d}")


if __name__ == "__main__":
    main()
