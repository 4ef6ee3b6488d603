"""Image resize / pyramid ops with PyTorch-compatible semantics, NHWC, pure JAX.

Covers the exact interpolation flavours the reference uses:
  * nearest   — torch ``F.interpolate(mode="nearest")`` index rule
                (reference: modules/mesh_hint_volume.py:186-202, losses
                upsampling in sr_depth_model.py:480-484, eval upsampling).
  * bilinear  — ``F.interpolate(mode="bilinear", align_corners=False)``
                (decoder ``upsample`` helper, utils/generic_utils.py:95-104).
  * blur_pool — kornia ``blur_pool2d(kernel_size=3)``: 3x3 binomial blur with
                reflect padding then stride-2 subsample, used by the gradient
                loss pyramid (utils/generic_utils.py:86-92).

Implemented with static shapes and gather/conv primitives that XLA fuses
well on TPU.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def interpolate_nearest(x_nhwc, out_hw):
    """torch F.interpolate(mode="nearest") parity: src = floor(dst * in/out).

    Integer up/down ratios use gather-free repeat/stride (the common hot
    cases); general ratios fall back to constant-index takes.
    """
    n, h, w, c = x_nhwc.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x_nhwc
    out = x_nhwc
    # height
    if oh != h:
        if oh % h == 0:
            out = jnp.repeat(out, oh // h, axis=1)
        elif h % oh == 0:
            out = out[:, :: h // oh]
        else:
            ys = np.clip(np.floor(np.arange(oh) * (h / oh)).astype(np.int32), 0, h - 1)
            out = jnp.take(out, jnp.asarray(ys), axis=1)
    # width
    if ow != w:
        if ow % w == 0:
            out = jnp.repeat(out, ow // w, axis=2)
        elif w % ow == 0:
            out = out[:, :, :: w // ow]
        else:
            xs = np.clip(np.floor(np.arange(ow) * (w / ow)).astype(np.int32), 0, w - 1)
            out = jnp.take(out, jnp.asarray(xs), axis=2)
    return out


def interpolate_bilinear(x_nhwc, out_hw):
    """torch F.interpolate(mode="bilinear", align_corners=False), no antialias.

    Separable: interpolate rows then columns with clamped edge handling
    (torch clamps source coords to the valid range, unlike grid_sample's
    zero padding).
    """
    n, h, w, c = x_nhwc.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return x_nhwc

    def axis_weights(in_size, out_size):
        pos = (np.arange(out_size, dtype=np.float64) + 0.5) * (in_size / out_size) - 0.5
        pos = np.clip(pos, 0.0, in_size - 1)
        lo = np.floor(pos).astype(np.int32)
        hi = np.minimum(lo + 1, in_size - 1)
        whi = (pos - lo).astype(np.float32)
        return jnp.asarray(lo), jnp.asarray(hi), jnp.asarray(whi)

    ylo, yhi, wy = axis_weights(h, oh)
    xlo, xhi, wx = axis_weights(w, ow)

    wy = wy[None, :, None, None].astype(x_nhwc.dtype)
    x_rows = x_nhwc[:, ylo] * (1.0 - wy) + x_nhwc[:, yhi] * wy
    wx = wx[None, None, :, None].astype(x_nhwc.dtype)
    return x_rows[:, :, xlo] * (1.0 - wx) + x_rows[:, :, xhi] * wx


def _upsample2x_axis(x, axis):
    """Exact 2x bilinear (align_corners=False) along one axis, gather-free.

    Output sample positions are (j + 0.5)/2 - 0.5 = j/2 - 0.25: even outputs
    mix (0.25 prev, 0.75 cur), odd outputs mix (0.75 cur, 0.25 next), with
    edge clamping — implemented with shifts + interleave (XLA lowers gathers
    on TPU to serial loops; this stays fully vectorized).
    """
    x = jnp.moveaxis(x, axis, 1)  # (n, L, ...)
    prev = jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)
    nxt = jnp.concatenate([x[:, 1:], x[:, -1:]], axis=1)
    even = 0.25 * prev + 0.75 * x
    odd = 0.75 * x + 0.25 * nxt
    out = jnp.stack([even, odd], axis=2).reshape((x.shape[0], 2 * x.shape[1]) + x.shape[2:])
    return jnp.moveaxis(out, 1, axis)


def upsample2x_bilinear(x_nhwc):
    """2x bilinear upsample, align_corners=False (decoder skip upsampling)."""
    return _upsample2x_axis(_upsample2x_axis(x_nhwc, 1), 2)


_PASCAL3 = np.array([1.0, 2.0, 1.0])
_BLUR3 = jnp.asarray(np.outer(_PASCAL3, _PASCAL3) / 16.0, dtype=jnp.float32)


def blur_pool_2x(x_nhwc):
    """kornia blur_pool2d(kernel_size=3) parity: reflect-pad 1, 3x3 binomial
    blur, stride-2 subsample. Depthwise conv -> MXU-friendly."""
    n, h, w, c = x_nhwc.shape
    xp = jnp.pad(x_nhwc, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    kernel = jnp.broadcast_to(_BLUR3[:, :, None, None], (3, 3, 1, c)).astype(x_nhwc.dtype)
    return jax.lax.conv_general_dilated(
        xp,
        kernel,
        window_strides=(2, 2),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def pyrdown(x_nhwc, num_scales: int = 4):
    """Blur-pool pyramid: [x, bp(x), bp(bp(x)), ...] with num_scales levels."""
    out = [x_nhwc]
    for _ in range(num_scales - 1):
        out.append(blur_pool_2x(out[-1]))
    return out


def reflect_pad(x_nhwc, pad_h, pad_w):
    """Reflection padding (torch ReflectionPad2d parity)."""
    return jnp.pad(
        x_nhwc, ((0, 0), (pad_h[0], pad_h[1]), (pad_w[0], pad_w[1]), (0, 0)), mode="reflect"
    )


def replicate_pad(x_nhwc, pad_h, pad_w):
    """Replication (edge) padding (torch padding_mode="replicate" parity)."""
    return jnp.pad(
        x_nhwc, ((0, 0), (pad_h[0], pad_h[1]), (pad_w[0], pad_w[1]), (0, 0)), mode="edge"
    )
