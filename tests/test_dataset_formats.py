"""Format-level tests for the real-dataset readers, using generated fixture
files on disk (tiny scans in each dataset's native layout)."""

import json
import os

import numpy as np
from PIL import Image

from doubletake_tpu.datasets.colmap import ColmapDataset
from doubletake_tpu.datasets.scannet import ScannetDataset
from doubletake_tpu.datasets.seven_scenes import SevenScenesDataset
from doubletake_tpu.datasets.threer_scan import ThreeRScanDataset
from doubletake_tpu.datasets.vdr import VDRDataset

H_IMG, W_IMG = 64, 96


def write_image(path, h, w, value=128):
    Image.fromarray(np.full((h, w, 3), value, np.uint8)).save(path)


def write_depth_png16(path, h, w, mm=2000):
    arr = np.full((h, w), mm, np.uint16)
    arr[0, 0] = 0  # one invalid pixel
    Image.fromarray(arr).save(path)


def make_scannet_fixture(root):
    scan = "scene0000_00"
    sd = os.path.join(root, "scans", scan, "sensor_data")
    os.makedirs(sd)
    os.makedirs(os.path.join(root, "scans", scan, "intrinsic"))
    with open(os.path.join(root, "scans", scan, f"{scan}.txt"), "w") as f:
        f.write("depthWidth = 640\ndepthHeight = 480\nnumColorFrames = 2\n")
    K = np.eye(4)
    K[0, 0] = K[1, 1] = 580.0
    K[0, 2], K[1, 2] = 320, 240
    np.savetxt(os.path.join(root, "scans", scan, "intrinsic", "intrinsic_depth.txt"), K)
    for i in range(2):
        write_image(os.path.join(sd, f"frame-{i:06d}.color.jpg"), 480, 640)
        write_depth_png16(os.path.join(sd, f"frame-{i:06d}.depth.png"), 480, 640)
        pose = np.eye(4)
        pose[0, 3] = 0.2 * i
        np.savetxt(os.path.join(sd, f"frame-{i:06d}.pose.txt"), pose)
    return scan


def test_scannet_reader(tmp_path):
    root = str(tmp_path)
    scan = make_scannet_fixture(root)
    ds = ScannetDataset(
        dataset_path=root, split="train", mv_tuple_file_suffix=None,
        image_height=H_IMG, image_width=W_IMG, include_full_res_depth=True,
    )
    frame = ds.get_frame(scan, 1, load_depth=True)
    assert frame["image_bhw3"].shape == (H_IMG, W_IMG, 3)
    assert frame["depth_bhw1"].shape == (H_IMG // 2, W_IMG // 2, 1)
    # depth scaled mm -> m
    valid = frame["mask_b_bhw1"]
    np.testing.assert_allclose(frame["depth_bhw1"][valid], 2.0, atol=1e-3)
    assert frame["world_T_cam_b44"][0, 3] == 0.2
    # K_s0 scaled to depth res: fx = 580 * (W/2)/640
    np.testing.assert_allclose(
        frame["K_s0_b44"][0, 0], 580.0 * (W_IMG // 2) / 640, rtol=1e-5
    )
    assert frame["full_res_depth_bhw1"].shape == (480, 640, 1)


def test_seven_scenes_reader(tmp_path):
    scan = "chess/seq-01"
    sd = os.path.join(str(tmp_path), scan)
    os.makedirs(sd)
    for i in range(2):
        write_image(os.path.join(sd, f"frame-{i:06d}.color.png"), 480, 640)
        write_depth_png16(os.path.join(sd, f"frame-{i:06d}.depth.proj.png"), 480, 640)
        np.savetxt(os.path.join(sd, f"frame-{i:06d}.pose.txt"), np.eye(4))
    ds = SevenScenesDataset(
        dataset_path=str(tmp_path), split="test", mv_tuple_file_suffix=None,
        image_height=H_IMG, image_width=W_IMG,
    )
    frame = ds.get_frame(scan, 0, load_depth=True)
    assert frame["image_bhw3"].shape == (H_IMG, W_IMG, 3)
    np.testing.assert_allclose(
        frame["K_s0_b44"][0, 0], 525.0 * (W_IMG // 2) / 640, rtol=1e-5
    )
    valid = frame["mask_b_bhw1"]
    np.testing.assert_allclose(frame["depth_bhw1"][valid], 2.0, atol=1e-3)


def test_vdr_reader(tmp_path):
    scan = "cap1"
    sd = os.path.join(str(tmp_path), scan)
    os.makedirs(sd)
    pose_gl = np.eye(4, dtype=np.float32)
    pose_gl[1, 3] = 1.0  # +y up in GL
    meta = [
        {
            "pose4x4": pose_gl.T.reshape(-1).tolist(),
            "resolution": [1920, 1440],
            "intrinsics": [1400.0, 1400.0, 960.0, 720.0, 0.0],
        }
        for _ in range(2)
    ]
    with open(os.path.join(sd, "capture.json"), "w") as f:
        json.dump(meta, f)
    for i in range(2):
        write_image(os.path.join(sd, f"frame_{i}.jpg"), 1440, 1920)
        np.full((192, 256), 1.5, np.float32).tofile(os.path.join(sd, f"depth_{i}.bin"))
        np.ones((192, 256), np.uint8).tofile(
            os.path.join(sd, f"depthConfidence_{i}.bin")
        )
    ds = VDRDataset(
        dataset_path=str(tmp_path), split="test", mv_tuple_file_suffix=None,
        image_height=H_IMG, image_width=W_IMG,
    )
    frame = ds.get_frame(scan, 0, load_depth=True)
    # GL pose +y up becomes -z in CV world after rotx(-pi/2): translation
    # (0, 1, 0) -> (0, 0, -1)... rotx(-90): y -> -z? verify consistency via
    # round trip instead of hard-coding: pose must be invertible & finite
    assert np.isfinite(frame["world_T_cam_b44"]).all()
    np.testing.assert_allclose(
        frame["world_T_cam_b44"][:3, :3] @ frame["world_T_cam_b44"][:3, :3].T,
        np.eye(3), atol=1e-5,
    )
    valid = frame["mask_b_bhw1"]
    np.testing.assert_allclose(frame["depth_bhw1"][valid], 1.5, atol=1e-4)
    np.testing.assert_allclose(
        frame["K_s0_b44"][0, 0], 1400.0 * (W_IMG // 2) / 1920, rtol=1e-5
    )


def test_threer_scan_reader(tmp_path):
    root = str(tmp_path)
    ref_scan, rescan = "abc-ref", "abc-re1"
    for scan in (ref_scan, rescan):
        sd = os.path.join(root, scan, "sensor_data")
        os.makedirs(sd)
        Kc = "877.5 0 479.75 0 0 877.5 269.75 0 0 0 1 0 0 0 0 1"
        with open(os.path.join(sd, "_info.txt"), "w") as f:
            f.write(
                "m_colorWidth = 960\nm_colorHeight = 540\n"
                "m_depthWidth = 224\nm_depthHeight = 172\nm_depthShift = 1000\n"
                f"m_calibrationColorIntrinsic = {Kc}\n"
            )
        for i in range(2):
            write_image(os.path.join(sd, f"frame-{i:06d}.color.jpg"), 540, 960)
            arr = np.full((172, 224), 1800, np.uint16)
            Image.fromarray(arr).save(os.path.join(sd, f"frame-{i:06d}.depth.pgm"))
            np.savetxt(os.path.join(sd, f"frame-{i:06d}.pose.txt"), np.eye(4))
    transform = np.eye(4)
    transform[0, 3] = 0.5
    with open(os.path.join(root, "3RScan.json"), "w") as f:
        json.dump(
            [{
                "reference": ref_scan,
                "scans": [{"reference": rescan,
                           "transform": transform.T.reshape(-1).tolist()}],
            }],
            f,
        )

    ds = ThreeRScanDataset(
        dataset_path=root, split="test", mv_tuple_file_suffix=None,
        image_height=H_IMG, image_width=W_IMG,
    )
    frame = ds.get_frame(ref_scan, 0, load_depth=True)
    valid = frame["mask_b_bhw1"]
    np.testing.assert_allclose(frame["depth_bhw1"][valid], 1.8, atol=1e-3)
    np.testing.assert_allclose(
        frame["K_s0_b44"][0, 0], 877.5 / 960 * (W_IMG // 2), rtol=1e-5
    )

    first, first_T_second = ds.revisit_source_scan(rescan)
    assert first == ref_scan
    np.testing.assert_allclose(first_T_second[0, 3], 0.5)


def test_colmap_reader(tmp_path):
    root = str(tmp_path)
    scan = "walk1"
    sp = os.path.join(root, scan, "sparse", "0")
    os.makedirs(sp)
    os.makedirs(os.path.join(root, scan, "images"))
    with open(os.path.join(sp, "cameras.txt"), "w") as f:
        f.write("# comment\n1 PINHOLE 1280 720 1000 1000 640 360\n")
    # identity pose: qvec (1,0,0,0), tvec 0
    with open(os.path.join(sp, "images.txt"), "w") as f:
        f.write("# comment\n")
        f.write("1 1 0 0 0 0 0 0 1 img0.jpg\n")
        f.write("0 0\n")
    with open(os.path.join(root, scan, "scale.txt"), "w") as f:
        f.write("2.0\n")
    write_image(os.path.join(root, scan, "images", "img0.jpg"), 720, 1280)

    ds = ColmapDataset(
        dataset_path=root, split="test", mv_tuple_file_suffix=None,
        image_height=H_IMG, image_width=W_IMG,
    )
    frame = ds.get_frame(scan, "img0", load_depth=True)
    assert frame["image_bhw3"].shape == (H_IMG, W_IMG, 3)
    assert not frame["mask_b_bhw1"].any()  # no GT depth
    np.testing.assert_allclose(
        frame["K_s0_b44"][0, 0], 1000.0 * (W_IMG // 2) / 1280, rtol=1e-5
    )
    # orthonormal rotation after the rotx alignment
    R = frame["world_T_cam_b44"][:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_threer_scan_reader_zipped(tmp_path):
    """Frames served straight from sequence.zip when sensor_data/ is not
    extracted (reference layout docstring threer_scan_dataset.py:20-33)."""
    import io as _io
    import zipfile

    root = str(tmp_path)
    scan = "zip-scan"
    os.makedirs(os.path.join(root, scan))
    Kc = "877.5 0 479.75 0 0 877.5 269.75 0 0 0 1 0 0 0 0 1"

    def png_bytes(arr):
        buf = _io.BytesIO()
        Image.fromarray(arr).save(buf, format="PNG")
        return buf.getvalue()

    with zipfile.ZipFile(os.path.join(root, scan, "sequence.zip"), "w") as zf:
        zf.writestr(
            "_info.txt",
            "m_colorWidth = 960\nm_colorHeight = 540\n"
            "m_depthWidth = 224\nm_depthHeight = 172\nm_depthShift = 1000\n"
            f"m_calibrationColorIntrinsic = {Kc}\n",
        )
        rng = np.random.RandomState(0)
        color = (rng.rand(540, 960, 3) * 255).astype(np.uint8)
        for i in range(2):
            zf.writestr(f"frame-{i:06d}.color.jpg", png_bytes(color))
            # 16-bit depth as PNG inside the zip member named .pgm would
            # confuse PIL's format sniffing? No: PIL sniffs CONTENT, the
            # name is irrelevant — but write a real PGM for fidelity.
            buf = _io.BytesIO()
            Image.fromarray(np.full((172, 224), 1800, np.uint16)).save(
                buf, format="PPM")
            zf.writestr(f"sensor_data/frame-{i:06d}.depth.pgm", buf.getvalue())
            zf.writestr(
                f"frame-{i:06d}.pose.txt",
                "\n".join(" ".join(str(v) for v in row) for row in np.eye(4)),
            )

    ds = ThreeRScanDataset(
        dataset_path=root, split="test", mv_tuple_file_suffix=None,
        image_height=H_IMG, image_width=W_IMG,
    )
    # members both at archive root and under sensor_data/ resolve
    frame = ds.get_frame(scan, 0, load_depth=True)
    valid = frame["mask_b_bhw1"]
    assert valid.any()
    np.testing.assert_allclose(frame["depth_bhw1"][valid], 1.8, atol=1e-3)
    np.testing.assert_allclose(
        frame["K_s0_b44"][0, 0], 877.5 / 960 * (W_IMG // 2), rtol=1e-5
    )
    np.testing.assert_allclose(frame["world_T_cam_b44"], np.eye(4), atol=1e-6)
    assert frame["image_bhw3"].shape == (H_IMG, W_IMG, 3)


def test_registry_aliases():
    """arkit/scanniverse names are recognized (reference
    dataset_utils.py:49-97) and explain the unreleased readers."""
    import pytest as _pytest

    from doubletake_tpu.datasets.registry import get_dataset

    for name in ("arkit", "scanniverse"):
        with _pytest.raises(NotImplementedError, match="not released"):
            get_dataset(name)
    with _pytest.raises(ValueError):
        get_dataset("not_a_dataset")
