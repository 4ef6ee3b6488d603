"""Bit-parity tests for grid_sample ops against torch CPU."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from doubletake_tpu.ops import grid_sample_2d, grid_sample_3d


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
@pytest.mark.parametrize("align_corners", [False, True])
def test_grid_sample_2d_matches_torch(mode, align_corners):
    rng = np.random.RandomState(0)
    n, h, w, c = 2, 9, 13, 5
    img = rng.randn(n, h, w, c).astype(np.float32)
    # grid spans beyond [-1, 1] to exercise zero padding
    grid = (rng.rand(n, 7, 11, 2).astype(np.float32) * 3.0) - 1.5

    ref = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode=mode,
        padding_mode="zeros",
        align_corners=align_corners,
    ).permute(0, 2, 3, 1).numpy()

    out = np.asarray(
        grid_sample_2d(jnp.asarray(img), jnp.asarray(grid), mode=mode, align_corners=align_corners)
    )
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_2d_exact_centers():
    # sampling exactly at pixel centers reproduces the image
    n, h, w, c = 1, 4, 6, 3
    img = np.arange(n * h * w * c, dtype=np.float32).reshape(n, h, w, c)
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    gx = 2 * (xs + 0.5) / w - 1
    gy = 2 * (ys + 0.5) / h - 1
    grid = np.stack([gx, gy], axis=-1)[None].astype(np.float32)
    out = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(out, img, atol=1e-5)


@pytest.mark.parametrize("mode", ["bilinear", "nearest"])
def test_grid_sample_3d_matches_torch(mode):
    rng = np.random.RandomState(1)
    d0, d1, d2, c = 6, 7, 8, 2
    vol = rng.randn(d0, d1, d2, c).astype(np.float32)
    pts = (rng.rand(50, 3).astype(np.float32) * 2.6) - 1.3

    # torch 3D grid_sample: input (N, C, D, H, W), grid last dim (x, y, z)
    # indexing (W, H, D) = volume axes (2, 1, 0), so flip the point order.
    t_in = torch.from_numpy(vol).permute(3, 0, 1, 2)[None]
    t_grid = torch.from_numpy(pts[:, ::-1].copy())[None, None, None]
    ref = (
        F.grid_sample(t_in, t_grid, mode=mode, align_corners=True, padding_mode="zeros")
        .squeeze()
        .T.numpy()
    )

    out = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(pts), mode=mode))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
