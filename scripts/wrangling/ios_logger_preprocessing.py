"""Convert ios-logger / ARKit captures into the VDR ``capture.json`` layout.

TPU-repo equivalent of the reference's
scripts/data_scripts/ios_logger_preprocessing.py (whose backing module was
not released). Takes an ios-logger recording —

    <scan>/Frames.m4v         video of RGB frames
    <scan>/Frames.txt         per-frame: timestamp,frame_id,fx,fy,cx,cy
    <scan>/ARposes.txt        per-pose:  timestamp,tx,ty,tz,qw,qx,qy,qz

— matches each video frame to the nearest ARKit pose by timestamp, extracts
the frames (requires ffmpeg on PATH), and writes the VDR capture layout
consumed by doubletake_tpu/datasets/vdr.py:

    <scan>/capture.json       {"frames": [{id, pose4x4 (OpenGL col-major),
                               intrinsics [fx fy cx cy], depthPath, imagePath}]}
    <scan>/frame_<id>.jpg

ARKit depth (``depth_<id>.bin`` float32 256x192 + confidence) is only
available from captures that recorded it; frames without depth get no
depthPath entry and the reader treats depth as absent.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess

import numpy as np


def quat_to_rotmat(qw, qx, qy, qz):
    n = np.sqrt(qw * qw + qx * qx + qy * qy + qz * qz)
    qw, qx, qy, qz = qw / n, qx / n, qy / n, qz / n
    return np.array([
        [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy)],
        [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qw * qx)],
        [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx * qx + qy * qy)],
    ])


def load_poses(path):
    ts, mats = [], []
    with open(path) as f:
        for line in f:
            parts = [p for p in line.strip().replace(",", " ").split() if p]
            if len(parts) < 8:
                continue
            t, tx, ty, tz, qw, qx, qy, qz = map(float, parts[:8])
            T = np.eye(4)
            T[:3, :3] = quat_to_rotmat(qw, qx, qy, qz)
            T[:3, 3] = [tx, ty, tz]
            ts.append(t)
            mats.append(T)
    return np.asarray(ts), mats


def load_frame_meta(path):
    out = []
    with open(path) as f:
        for line in f:
            parts = [p for p in line.strip().replace(",", " ").split() if p]
            if len(parts) < 6:
                continue
            out.append((float(parts[0]), int(float(parts[1])),
                        [float(x) for x in parts[2:6]]))
    return out


def extract_frames(scan_dir, frame_ids):
    video = os.path.join(scan_dir, "Frames.m4v")
    if shutil.which("ffmpeg") is None:
        raise RuntimeError("ffmpeg not found on PATH; needed to split Frames.m4v")
    tmp_pattern = os.path.join(scan_dir, "_extract_%06d.jpg")
    subprocess.run(
        ["ffmpeg", "-y", "-loglevel", "error", "-i", video, "-qscale:v", "2",
         "-start_number", "0", tmp_pattern],
        check=True,
    )
    for i, fid in enumerate(frame_ids):
        src = os.path.join(scan_dir, f"_extract_{i:06d}.jpg")
        if os.path.exists(src):
            os.replace(src, os.path.join(scan_dir, f"frame_{fid}.jpg"))
    # drop extras past the metadata list
    i = len(frame_ids)
    while True:
        extra = os.path.join(scan_dir, f"_extract_{i:06d}.jpg")
        if not os.path.exists(extra):
            break
        os.remove(extra)
        i += 1


def process_scan(scan_dir: str, skip_video: bool = False):
    pose_ts, poses = load_poses(os.path.join(scan_dir, "ARposes.txt"))
    meta = load_frame_meta(os.path.join(scan_dir, "Frames.txt"))
    if not len(pose_ts) or not meta:
        raise RuntimeError(f"{scan_dir}: missing ARposes.txt / Frames.txt data")

    frames = []
    for t, fid, intr in meta:
        pi = int(np.argmin(np.abs(pose_ts - t)))
        # ARKit poses are OpenGL-convention camera_to_world; capture.json
        # stores the matrix column-major like the original VDR app
        pose_colmajor = [float(v) for v in np.asarray(poses[pi]).T.reshape(-1)]
        entry = {
            "id": fid,
            "pose4x4": pose_colmajor,
            "intrinsics": intr,
            "imagePath": f"frame_{fid}.jpg",
        }
        if os.path.exists(os.path.join(scan_dir, f"depth_{fid}.bin")):
            entry["depthPath"] = f"depth_{fid}.bin"
        frames.append(entry)

    if not skip_video:
        extract_frames(scan_dir, [f["id"] for f in frames])

    with open(os.path.join(scan_dir, "capture.json"), "w") as f:
        json.dump({"frames": frames}, f)
    print(f"{scan_dir}: wrote capture.json with {len(frames)} frames")


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--dataset_path", required=True, help="root with scans/<id>")
    ap.add_argument("--scan_id", default=None)
    ap.add_argument("--skip_video", action="store_true",
                    help="only write capture.json (frames already extracted)")
    args = ap.parse_args()

    scans_root = os.path.join(args.dataset_path, "scans")
    scans = [args.scan_id] if args.scan_id else sorted(os.listdir(scans_root))
    for scan in scans:
        process_scan(os.path.join(scans_root, scan), skip_video=args.skip_video)


if __name__ == "__main__":
    main()
