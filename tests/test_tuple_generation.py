"""Tests for DVMVS tuple generation and viz/partial-fuser utilities."""

import numpy as np

from doubletake_tpu.datasets.synthetic import synthetic_trajectory
from doubletake_tpu.tools.tuple_generation import (
    generate_test_tuples,
    generate_train_tuples,
)
from doubletake_tpu.utils.visualization import colormap_image, tile_images


def make_poses(n=60):
    return [p.astype(np.float64) for p in synthetic_trajectory(n, seed=0)]


def test_default_tuples_structure():
    poses = make_poses()
    frame_ids = [str(i) for i in range(len(poses))]
    lines = generate_test_tuples("scanX", poses, frame_ids, "default", 8)
    assert len(lines) > 3
    for line in lines:
        parts = line.split(" ")
        assert parts[0] == "scanX"
        ids = [int(x) for x in parts[1:]]
        assert len(ids) >= 2
        # online: all source frames strictly in the past
        assert all(s < ids[0] for s in ids[1:])
        assert len(set(ids)) == len(ids)


def test_offline_tuples_use_future():
    poses = make_poses()
    frame_ids = [str(i) for i in range(len(poses))]
    lines = generate_test_tuples("scanX", poses, frame_ids, "offline", 8)
    assert len(lines) > 3
    any_future = False
    for line in lines:
        ids = [int(x) for x in line.split(" ")[1:]]
        if any(s > ids[0] for s in ids[1:]):
            any_future = True
    assert any_future  # offline tuples must draw on future frames


def test_dense_tuples_cover_most_frames():
    poses = make_poses(40)
    frame_ids = [str(i) for i in range(len(poses))]
    lines = generate_test_tuples("scanX", poses, frame_ids, "dense", 8)
    refs = {int(line.split(" ")[1]) for line in lines}
    # every frame except possibly the very first gets a tuple
    assert len(refs) >= 38

    lines_off = generate_test_tuples("scanX", poses, frame_ids, "dense_offline", 8)
    refs_off = {int(line.split(" ")[1]) for line in lines_off}
    assert len(refs_off) >= 39


def test_train_tuples():
    poses = make_poses(80)
    frame_ids = [str(i) for i in range(len(poses))]
    lines = generate_train_tuples("scanX", poses, frame_ids, 8)
    assert len(lines) > 0
    for line in lines:
        ids = line.split(" ")[1:]
        assert len(ids) == 8
        assert len(set(ids)) == 8

    pair_lines = generate_train_tuples("scanX", poses, frame_ids, 2)
    assert len(pair_lines) > 5
    assert all(len(line.split(" ")) == 3 for line in pair_lines)


def test_colormap_and_tiling():
    depth = np.random.RandomState(0).rand(10, 12) * 3 + 0.5
    depth[0, 0] = np.nan
    rgb, vmin, vmax = colormap_image(depth, return_vminvmax=True)
    assert rgb.shape == (10, 12, 3)
    assert (rgb[0, 0] == 0).all()  # invalid -> black
    assert vmin < vmax
    canvas = tile_images([rgb, rgb, rgb], cols=2)
    assert canvas.shape == (20, 24, 3)
