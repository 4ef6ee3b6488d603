"""Tests for the data-wrangling scripts (synthesized fixtures, no downloads)."""

import io
import json
import os
import struct
import sys
import zlib

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts", "wrangling"))

import scannet_sens_export as sens  # noqa: E402
import seven_scenes_preprocessing as seven  # noqa: E402
import ios_logger_preprocessing as iosl  # noqa: E402


def synth_sens(num_frames=3, cw=32, ch=24, dw=16, dh=12):
    """Build a tiny valid SensorData-v4 container in memory."""
    from PIL import Image

    buf = io.BytesIO()
    buf.write(struct.pack("I", 4))
    name = b"synth"
    buf.write(struct.pack("Q", len(name)) + name)
    for mat in (np.eye(4), np.eye(4), np.diag([2.0, 2.0, 1, 1]), np.eye(4)):
        buf.write(np.asarray(mat, np.float32).tobytes())
    buf.write(struct.pack("ii", 2, 1))  # jpeg color, zlib_ushort depth
    buf.write(struct.pack("IIII", cw, ch, dw, dh))
    buf.write(struct.pack("f", 1000.0))
    buf.write(struct.pack("Q", num_frames))

    rng = np.random.RandomState(0)
    depths = []
    for i in range(num_frames):
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = i * 0.1
        buf.write(pose.tobytes())
        buf.write(struct.pack("QQ", i, i))
        img = Image.fromarray(
            rng.randint(0, 255, (ch, cw, 3), np.uint8), "RGB"
        )
        jb = io.BytesIO()
        img.save(jb, format="JPEG")
        color = jb.getvalue()
        depth = rng.randint(0, 5000, (dh, dw)).astype(np.uint16)
        depths.append(depth)
        dcomp = zlib.compress(depth.tobytes())
        buf.write(struct.pack("QQ", len(color), len(dcomp)))
        buf.write(color)
        buf.write(dcomp)
    buf.write(struct.pack("Q", 0))
    return buf.getvalue(), depths


def test_sens_export_roundtrip(tmp_path):
    data, depths = synth_sens()
    scans = tmp_path / "scans" / "scene0000_00"
    scans.mkdir(parents=True)
    with open(scans / "scene0000_00.sens", "wb") as f:
        f.write(data)

    args = type("A", (), dict(
        export_depth_images=True, export_color_images=True,
        export_poses=True, export_intrinsics=True,
        frame_skip=1, rgb_resize=None, depth_resize=None,
    ))()
    out = tmp_path / "out" / "scene0000_00"
    sens.export_scan((str(scans / "scene0000_00.sens"), str(out), args))

    from PIL import Image

    for i, depth in enumerate(depths):
        stem = out / "sensor_data" / f"frame-{i:06d}"
        assert (stem.parent / f"frame-{i:06d}.color.jpg").exists()
        back = np.asarray(Image.open(f"{stem}.depth.png"))
        np.testing.assert_array_equal(back, depth)
        pose = np.genfromtxt(f"{stem}.pose.txt")
        assert pose[0, 3] == pytest.approx(i * 0.1)
    K = np.genfromtxt(out / "intrinsic" / "intrinsic_depth.txt")
    assert K[0, 0] == pytest.approx(2.0)


def test_seven_scenes_registration_identity_plane():
    """A fronto-parallel plane must register to ~the same plane (the
    calibration transform is near-identity)."""
    depth = np.full((480, 640), 2.0, np.float32)
    out = seven.register_depth(depth)
    center = out[200:280, 280:360].astype(np.float32) / 1000.0
    valid = center > 0
    assert valid.mean() > 0.95
    np.testing.assert_allclose(center[valid], 2.0, atol=0.02)


def test_ios_logger_capture_json(tmp_path):
    scan = tmp_path / "scans" / "cap1"
    scan.mkdir(parents=True)
    with open(scan / "ARposes.txt", "w") as f:
        for i in range(4):
            f.write(f"{i*0.1},{i*0.5},0,0,1,0,0,0\n")
    with open(scan / "Frames.txt", "w") as f:
        for i in range(3):
            f.write(f"{i*0.1+0.01},{i},500,500,320,240\n")

    iosl.process_scan(str(scan), skip_video=True)
    with open(scan / "capture.json") as f:
        cap = json.load(f)
    assert len(cap["frames"]) == 3
    f1 = cap["frames"][1]
    assert f1["id"] == 1
    assert f1["intrinsics"] == [500.0, 500.0, 320.0, 240.0]
    # column-major translation of the nearest pose (t=0.11 -> pose idx 1)
    pose = np.asarray(f1["pose4x4"]).reshape(4, 4).T
    assert pose[0, 3] == pytest.approx(0.5)
