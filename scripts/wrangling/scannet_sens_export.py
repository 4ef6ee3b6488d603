"""Export ScanNet ``.sens`` captures into the frame-file layout the readers use.

TPU-repo equivalent of the reference's scannet wrangling scripts
(reference: scripts/data_scripts/scannet_wrangling_scripts/{SensorData,reader}.py):
parses the ScanNet SensorData v4 binary container and writes

    <out>/<scan>/sensor_data/frame-%06d.color.jpg          (raw jpeg bytes)
    <out>/<scan>/sensor_data/frame-%06d.color.<W>.png      (optional resize)
    <out>/<scan>/sensor_data/frame-%06d.depth.png          (16-bit mm png)
    <out>/<scan>/sensor_data/frame-%06d.pose.txt           (camera_to_world)
    <out>/<scan>/intrinsic/intrinsic_{color,depth}.txt, extrinsic_*.txt

which is exactly what doubletake_tpu/datasets/scannet.py consumes.

Implementation notes (fresh design, not a port): the file is parsed as a
stream — per-frame payloads are ``f.read`` into bytes directly instead of
unpacked char-by-char, and frames can be exported without holding the whole
capture in memory. Only needs numpy + PIL.

Format (SensorData v4): header = version u32, sensor-name (u64 strlen +
bytes), 4x float[16] matrices (intrinsic/extrinsic for color/depth),
color/depth compression i32s, color W/H u32, depth W/H u32, depth_shift
f32, num_frames u64. Each frame = float[16] camera_to_world, 2x u64
timestamps, u64 color_size, u64 depth_size, payloads. Depth payload is
zlib-compressed uint16 millimeters; color payload is a jpeg.
"""

from __future__ import annotations

import argparse
import io
import os
import struct
import sys
import zlib
from multiprocessing import Pool

import numpy as np

COLOR_COMPRESSION = {-1: "unknown", 0: "raw", 1: "png", 2: "jpeg"}
DEPTH_COMPRESSION = {-1: "unknown", 0: "raw_ushort", 1: "zlib_ushort", 2: "occi_ushort"}


class SensHeader:
    def __init__(self, f):
        (version,) = struct.unpack("I", f.read(4))
        if version != 4:
            raise ValueError(f"unsupported .sens version {version}")
        (strlen,) = struct.unpack("Q", f.read(8))
        self.sensor_name = f.read(strlen).decode("ascii", "ignore")
        mats = np.frombuffer(f.read(4 * 16 * 4), np.float32).reshape(4, 4, 4)
        self.intrinsic_color, self.extrinsic_color = mats[0], mats[1]
        self.intrinsic_depth, self.extrinsic_depth = mats[2], mats[3]
        cc, dc = struct.unpack("ii", f.read(8))
        self.color_compression = COLOR_COMPRESSION[cc]
        self.depth_compression = DEPTH_COMPRESSION[dc]
        (self.color_width, self.color_height,
         self.depth_width, self.depth_height) = struct.unpack("IIII", f.read(16))
        (self.depth_shift,) = struct.unpack("f", f.read(4))
        (self.num_frames,) = struct.unpack("Q", f.read(8))


def iter_frames(f, header):
    """Yield (index, camera_to_world 4x4, color_bytes, depth_bytes)."""
    for i in range(header.num_frames):
        pose = np.frombuffer(f.read(16 * 4), np.float32).reshape(4, 4)
        f.read(16)  # color + depth timestamps
        csize, dsize = struct.unpack("QQ", f.read(16))
        yield i, pose, f.read(csize), f.read(dsize)


def _decode_depth(depth_bytes, header):
    if header.depth_compression != "zlib_ushort":
        raise ValueError(f"unsupported depth compression {header.depth_compression}")
    raw = zlib.decompress(depth_bytes)
    return np.frombuffer(raw, np.uint16).reshape(
        header.depth_height, header.depth_width
    )


def _write_depth_png(path, depth_u16):
    from PIL import Image

    Image.fromarray(depth_u16.astype(np.int32), mode="I").convert("I;16").save(path)


def _write_mat(path, mat):
    np.savetxt(path, np.asarray(mat), fmt="%f")


def export_scan(job):
    sens_path, out_scan_dir, args = job
    frames_dir = os.path.join(out_scan_dir, "sensor_data")
    os.makedirs(frames_dir, exist_ok=True)

    with open(sens_path, "rb") as f:
        header = SensHeader(f)

        if args.export_intrinsics:
            intr_dir = os.path.join(out_scan_dir, "intrinsic")
            os.makedirs(intr_dir, exist_ok=True)
            _write_mat(os.path.join(intr_dir, "intrinsic_color.txt"), header.intrinsic_color)
            _write_mat(os.path.join(intr_dir, "extrinsic_color.txt"), header.extrinsic_color)
            _write_mat(os.path.join(intr_dir, "intrinsic_depth.txt"), header.intrinsic_depth)
            _write_mat(os.path.join(intr_dir, "extrinsic_depth.txt"), header.extrinsic_depth)

        for i, pose, color_bytes, depth_bytes in iter_frames(f, header):
            if i % args.frame_skip != 0:
                continue
            stem = os.path.join(frames_dir, f"frame-{i:06d}")

            if args.export_poses:
                _write_mat(stem + ".pose.txt", pose)

            if args.export_color_images:
                if header.color_compression != "jpeg":
                    raise ValueError(
                        f"unsupported color compression {header.color_compression}"
                    )
                if args.rgb_resize:
                    from PIL import Image

                    w, h = args.rgb_resize
                    img = Image.open(io.BytesIO(color_bytes)).convert("RGB")
                    img.resize((w, h), Image.BILINEAR).save(
                        stem + f".color.{w}.png"
                    )
                else:
                    with open(stem + ".color.jpg", "wb") as cf:
                        cf.write(color_bytes)

            if args.export_depth_images:
                depth = _decode_depth(depth_bytes, header)
                if args.depth_resize:
                    from PIL import Image

                    w, h = args.depth_resize
                    depth = np.asarray(
                        Image.fromarray(depth.astype(np.int32), mode="I").resize(
                            (w, h), Image.NEAREST
                        ),
                        np.uint16,
                    )
                    _write_depth_png(stem + f".depth.{w}.png", depth)
                else:
                    _write_depth_png(stem + ".depth.png", depth)

    return os.path.basename(out_scan_dir)


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--scans_folder", required=True)
    ap.add_argument("--scan_list_file", default=None)
    ap.add_argument("--single_debug_scan_id", default=None)
    ap.add_argument("--output_path", required=True)
    ap.add_argument("--export_depth_images", action="store_true")
    ap.add_argument("--export_color_images", action="store_true")
    ap.add_argument("--export_poses", action="store_true")
    ap.add_argument("--export_intrinsics", action="store_true")
    ap.add_argument("--num_workers", type=int, default=1)
    ap.add_argument("--frame_skip", type=int, default=1)
    ap.add_argument("--rgb_resize", nargs=2, type=int, default=None,
                    metavar=("W", "H"))
    ap.add_argument("--depth_resize", nargs=2, type=int, default=None,
                    metavar=("W", "H"))
    args = ap.parse_args()

    if args.single_debug_scan_id:
        scans = [args.single_debug_scan_id]
    elif args.scan_list_file:
        with open(args.scan_list_file) as f:
            scans = [line.strip() for line in f if line.strip()]
    else:
        scans = sorted(
            d for d in os.listdir(args.scans_folder)
            if os.path.isdir(os.path.join(args.scans_folder, d))
        )

    jobs = []
    for scan in scans:
        sens = os.path.join(args.scans_folder, scan, f"{scan}.sens")
        if not os.path.exists(sens):
            print(f"skipping {scan}: no .sens file", file=sys.stderr)
            continue
        jobs.append((sens, os.path.join(args.output_path, scan), args))

    if args.num_workers > 1:
        with Pool(args.num_workers) as pool:
            for name in pool.imap_unordered(export_scan, jobs):
                print(f"done {name}")
    else:
        for job in jobs:
            print(f"done {export_scan(job)}")


if __name__ == "__main__":
    main()
