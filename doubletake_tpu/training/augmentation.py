"""Train-time color augmentation (device-side, jnp).

Parity target: the reference's CustomColorJitter wrapping kornia
ColorJiggle(0.2, 0.2, 0.2, 0.2) with denormalize -> jitter -> renormalize
(utils/augmentation_utils.py:13-53). Factors are sampled per image;
brightness/contrast/saturation are multiplicative in [0.8, 1.2], hue shifts
in [-0.2, 0.2] radians-scaled like kornia's hue jitter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from doubletake_tpu.utils.io import IMAGENET_MEAN, IMAGENET_STD

_MEAN = jnp.asarray(IMAGENET_MEAN)
_STD = jnp.asarray(IMAGENET_STD)

# ITU-R 601 luma weights (kornia rgb_to_grayscale)
_LUMA = jnp.asarray([0.299, 0.587, 0.114])


def _rgb_to_hsv_hue_shift(img, hue):
    """Cheap hue rotation in YIQ space (kornia adjust_hue equivalent)."""
    yiq = jnp.stack(
        [
            img @ jnp.asarray([0.299, 0.587, 0.114]),
            img @ jnp.asarray([0.59590059, -0.27455667, -0.32134392]),
            img @ jnp.asarray([0.21153661, -0.52273617, 0.31119955]),
        ],
        axis=-1,
    )
    c, s = jnp.cos(hue), jnp.sin(hue)
    i = yiq[..., 1] * c - yiq[..., 2] * s
    q = yiq[..., 1] * s + yiq[..., 2] * c
    y = yiq[..., 0]
    return jnp.stack(
        [
            y + 0.956 * i + 0.619 * q,
            y - 0.272 * i - 0.647 * q,
            y - 1.106 * i + 1.703 * q,
        ],
        axis=-1,
    )


def color_jitter(rng, image_bhw3, strength: float = 0.2):
    """Jitter an imagenet-normalized batch: per-image random factors."""
    b = image_bhw3.shape[0]
    k_b, k_c, k_s, k_h = jax.random.split(rng, 4)
    brightness = 1.0 + jax.random.uniform(k_b, (b, 1, 1, 1), minval=-strength, maxval=strength)
    contrast = 1.0 + jax.random.uniform(k_c, (b, 1, 1, 1), minval=-strength, maxval=strength)
    saturation = 1.0 + jax.random.uniform(k_s, (b, 1, 1, 1), minval=-strength, maxval=strength)
    hue = jax.random.uniform(k_h, (b, 1, 1), minval=-strength, maxval=strength) * jnp.pi

    img = image_bhw3 * _STD + _MEAN  # denormalize
    img = img * brightness
    mean_c = img.mean(axis=(1, 2, 3), keepdims=True)
    img = (img - mean_c) * contrast + mean_c
    gray = (img @ _LUMA)[..., None]
    img = gray + (img - gray) * saturation
    img = _rgb_to_hsv_hue_shift(img, hue)  # hue (b,1,1) broadcasts over (b,h,w)
    img = jnp.clip(img, 0.0, 1.0)
    return (img - _MEAN) / _STD
