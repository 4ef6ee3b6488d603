"""Grid sampling ops with PyTorch-compatible semantics, in pure JAX.

The reference pipeline leans on ``F.grid_sample`` in three distinct flavours
(see reference: src/doubletake/modules/cost_volume.py:190-196 — bilinear 2D,
align_corners=False, zeros padding; src/doubletake/tools/tsdf.py:480-486 —
nearest 2D, align_corners=False, zeros padding; src/doubletake/tools/
tsdf.py:332-337 — trilinear 3D, align_corners=True). Checkpoint/score parity
hinges on matching those exact conventions, so this module implements them
bit-for-bit (tested against torch CPU in tests/test_grid_sample.py).

Layout is TPU-native NHWC (channels last): gathers become row-gathers of
(H*W, C) matrices, which XLA lowers to efficient dynamic-gathers, and the
trailing C dimension stays on the 128-lane axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord, size: int, align_corners: bool):
    """Map a [-1, 1] grid coordinate to pixel index space.

    Matches torch's grid_sampler_unnormalize: with align_corners=False the
    extrema map to the corner pixel *edges*, with align_corners=True to the
    corner pixel *centers*.
    """
    coord = coord.astype(jnp.float32)
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def _gather_2d(img_nhwc, ix, iy, valid):
    """Gather img[n, iy, ix, :] with zeros where ``valid`` is False.

    img_nhwc: (N, H, W, C); ix/iy/valid: (N, P) int32/bool.
    Returns (N, P, C).
    """
    n, h, w, c = img_nhwc.shape
    flat = img_nhwc.reshape(n, h * w, c)
    if c == 1:
        # width-1 gathers lower to a ~3.5x slower scalar path on this TPU
        # (measured: 135 ms vs 39 ms per 18M rows); widen to 2 lanes
        flat = jnp.concatenate([flat, flat], axis=-1)
    idx = jnp.clip(iy, 0, h - 1) * w + jnp.clip(ix, 0, w - 1)
    out = jnp.take_along_axis(flat, idx[..., None], axis=1)[..., :c]
    return jnp.where(valid[..., None], out, jnp.zeros((), out.dtype))


def grid_sample_2d(
    input_nhwc,
    grid_nhw2,
    mode: str = "bilinear",
    padding_mode: str = "zeros",
    align_corners: bool = False,
):
    """2D grid sample, NHWC layout, torch-parity semantics.

    Args:
        input_nhwc: (N, H_in, W_in, C) source.
        grid_nhw2: (N, H_out, W_out, 2) sampling grid in [-1, 1], last dim is
            (x, y) — x indexes width, y indexes height (torch convention).
        mode: "bilinear" or "nearest".
        padding_mode: only "zeros" (all the reference call sites use zeros).
        align_corners: torch semantics.

    Returns:
        (N, H_out, W_out, C) sampled output.
    """
    if padding_mode != "zeros":
        raise NotImplementedError("only zeros padding is supported")

    n, h_in, w_in, c = input_nhwc.shape
    _, h_out, w_out, _ = grid_nhw2.shape

    gx = grid_nhw2[..., 0].reshape(n, -1)
    gy = grid_nhw2[..., 1].reshape(n, -1)
    ix = _unnormalize(gx, w_in, align_corners)
    iy = _unnormalize(gy, h_in, align_corners)

    if mode == "nearest":
        # torch uses std::nearbyint (round half to even); jnp.rint matches.
        ix0 = jnp.rint(ix).astype(jnp.int32)
        iy0 = jnp.rint(iy).astype(jnp.int32)
        valid = (ix0 >= 0) & (ix0 <= w_in - 1) & (iy0 >= 0) & (iy0 <= h_in - 1)
        out = _gather_2d(input_nhwc, ix0, iy0, valid)
        return out.reshape(n, h_out, w_out, c)

    if mode != "bilinear":
        raise NotImplementedError(f"mode={mode}")

    x0f = jnp.floor(ix)
    y0f = jnp.floor(iy)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x1 = x0 + 1
    y1 = y0 + 1

    wx1 = (ix - x0f).astype(input_nhwc.dtype)
    wy1 = (iy - y0f).astype(input_nhwc.dtype)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def inb(xi, yi):
        return (xi >= 0) & (xi <= w_in - 1) & (yi >= 0) & (yi <= h_in - 1)

    v00 = _gather_2d(input_nhwc, x0, y0, inb(x0, y0))
    v01 = _gather_2d(input_nhwc, x1, y0, inb(x1, y0))
    v10 = _gather_2d(input_nhwc, x0, y1, inb(x0, y1))
    v11 = _gather_2d(input_nhwc, x1, y1, inb(x1, y1))

    out = (
        v00 * (wx0 * wy0)[..., None]
        + v01 * (wx1 * wy0)[..., None]
        + v10 * (wx0 * wy1)[..., None]
        + v11 * (wx1 * wy1)[..., None]
    )
    return out.reshape(n, h_out, w_out, c)


def grid_sample_3d(
    volume_dhwc,
    points_n3,
    mode: str = "bilinear",
    align_corners: bool = True,
):
    """Sample a 3D volume at normalized points, torch grid_sample 3D parity.

    Used for TSDF value/weight sampling (reference: tools/tsdf.py:277-339,
    align_corners=True). The reference passes coordinates pre-swapped to
    torch's (z, y, x)-last convention; here we take points directly in
    volume-axis order for clarity.

    Args:
        volume_dhwc: (D0, D1, D2, C) volume (axes in index order).
        points_n3: (N, 3) normalized coords in [-1, 1], one per volume axis
            (points_n3[:, i] indexes axis i of the volume).
        mode: "bilinear" (trilinear) or "nearest".
        align_corners: torch semantics (True at all reference call sites).

    Returns:
        (N, C) sampled values; zeros outside the volume.
    """
    d0, d1, d2, c = volume_dhwc.shape
    p0 = _unnormalize(points_n3[:, 0], d0, align_corners)
    p1 = _unnormalize(points_n3[:, 1], d1, align_corners)
    p2 = _unnormalize(points_n3[:, 2], d2, align_corners)

    flat = volume_dhwc.reshape(d0 * d1 * d2, c)
    if c == 1:
        # avoid the slow width-1 scalar-gather path (see _gather_2d note)
        flat = jnp.concatenate([flat, flat], axis=-1)

    def gather(i0, i1, i2, valid):
        idx = (
            jnp.clip(i0, 0, d0 - 1) * (d1 * d2)
            + jnp.clip(i1, 0, d1 - 1) * d2
            + jnp.clip(i2, 0, d2 - 1)
        )
        out = jnp.take(flat, idx, axis=0)[:, :c]
        return jnp.where(valid[:, None], out, jnp.zeros((), out.dtype))

    if mode == "nearest":
        i0 = jnp.rint(p0).astype(jnp.int32)
        i1 = jnp.rint(p1).astype(jnp.int32)
        i2 = jnp.rint(p2).astype(jnp.int32)
        valid = (
            (i0 >= 0) & (i0 < d0) & (i1 >= 0) & (i1 < d1) & (i2 >= 0) & (i2 < d2)
        )
        return gather(i0, i1, i2, valid)

    f0 = jnp.floor(p0)
    f1 = jnp.floor(p1)
    f2 = jnp.floor(p2)
    i0 = f0.astype(jnp.int32)
    i1 = f1.astype(jnp.int32)
    i2 = f2.astype(jnp.int32)
    w0 = (p0 - f0).astype(volume_dhwc.dtype)
    w1 = (p1 - f1).astype(volume_dhwc.dtype)
    w2 = (p2 - f2).astype(volume_dhwc.dtype)

    out = jnp.zeros((points_n3.shape[0], c), volume_dhwc.dtype)
    for a in (0, 1):
        for b in (0, 1):
            for e in (0, 1):
                j0, j1, j2 = i0 + a, i1 + b, i2 + e
                valid = (
                    (j0 >= 0) & (j0 < d0) & (j1 >= 0) & (j1 < d1) & (j2 >= 0) & (j2 < d2)
                )
                wgt = (
                    (w0 if a else 1.0 - w0)
                    * (w1 if b else 1.0 - w1)
                    * (w2 if e else 1.0 - w2)
                )
                out = out + gather(j0, j1, j2, valid) * wgt[:, None]
    return out
