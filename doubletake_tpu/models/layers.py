"""Basic neural blocks (Flax linen, NHWC).

Parity targets in the reference:
  * BasicBlock — norm-free residual block with LeakyReLU(0.2) and bias=True
    (reference: src/doubletake/modules/layers.py:33-94);
  * MLP — Linear+LeakyReLU stack with optional final activation disabled
    (reference: src/doubletake/modules/networks.py:120-135);
  * InstanceNorm — torch nn.InstanceNorm2d(affine=False) semantics;
  * BlurPool — antialiased_cnns.BlurPool(filt_size=4, stride=2) semantics
    (used by the antialiased ResNet18 matching encoder).

torch LeakyReLU default negative_slope is 0.01; the reference uses 0.2 in
conv blocks and the default 0.01 inside MLPs (nn.LeakyReLU()).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn


def leaky_relu(x, negative_slope: float = 0.2):
    return jnp.where(x >= 0, x, negative_slope * x)


def instance_norm(x_nhwc, eps: float = 1e-5):
    """torch nn.InstanceNorm2d(affine=False) parity: per-sample, per-channel
    normalization over the spatial dims (biased variance)."""
    mean = x_nhwc.mean(axis=(1, 2), keepdims=True)
    var = x_nhwc.var(axis=(1, 2), keepdims=True)
    return (x_nhwc - mean) * jax.lax.rsqrt(var + eps)


# Lower convs to K*K shifted matmuls instead of lax conv. Round-1 libtpu
# lowered dense convs at ~0.16 TFLOP/s, making this a 100x win; the current
# stack lowers lax conv at full MXU rate (measured 52 TFLOP/s fp32 /
# ~290 TFLOP/s bf16 — PERF_NOTES.md round 2), so the unroll is now OFF by
# default and kept only as an escape hatch for platform regressions.
UNROLL_CONVS = False


class MatmulConv(nn.Module):
    """Drop-in nn.Conv with a shifted-matmul fallback (see UNROLL_CONVS).

    Identical parameter structure to nn.Conv (kernel HWIO + bias), so
    checkpoints and converters are unaffected by the lowering choice.
    """

    features: int
    kernel_size: tuple = (3, 3)
    strides: tuple = (1, 1)
    padding: object = "SAME"
    use_bias: bool = True
    feature_group_count: int = 1

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        sh, sw = self.strides
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, cin // self.feature_group_count, self.features),
        )
        bias = (
            self.param("bias", nn.initializers.zeros, (self.features,))
            if self.use_bias
            else None
        )

        # flax nn.Conv promotion semantics: mixed input/param dtypes compute
        # in the promoted type (bf16 inference casts params at load and
        # images at model entry; init sees bf16 images with fp32 params)
        dt = jnp.promote_types(x.dtype, kernel.dtype)
        x = x.astype(dt)
        kernel = kernel.astype(dt)
        if bias is not None:
            bias = bias.astype(dt)

        if (
            not UNROLL_CONVS
            or self.feature_group_count != 1
            or jax.default_backend() == "cpu"
        ):
            pad = self.padding if isinstance(self.padding, str) else tuple(self.padding)
            out = jax.lax.conv_general_dilated(
                x, kernel, (sh, sw), pad,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=self.feature_group_count,
            )
            return out + bias if bias is not None else out

        n, h, w, _ = x.shape
        if self.padding == "SAME":
            oh = -(-h // sh)
            ow = -(-w // sw)
            pad_h = max((oh - 1) * sh + kh - h, 0)
            pad_w = max((ow - 1) * sw + kw - w, 0)
            pads = ((pad_h // 2, pad_h - pad_h // 2),
                    (pad_w // 2, pad_w - pad_w // 2))
        else:
            pads = tuple(self.padding)
            oh = (h + pads[0][0] + pads[0][1] - kh) // sh + 1
            ow = (w + pads[1][0] + pads[1][1] - kw) // sw + 1

        xp = jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)))
        out = None
        for i in range(kh):
            for j in range(kw):
                piece = jax.lax.slice(
                    xp,
                    (0, i, j, 0),
                    (n, i + (oh - 1) * sh + 1, j + (ow - 1) * sw + 1, cin),
                    (1, sh, sw, 1),
                )
                term = jnp.einsum("nhwc,cf->nhwf", piece, kernel[i, j])
                out = term if out is None else out + term
        if bias is not None:
            out = out + bias
        return out


def conv(
    features: int,
    kernel: int,
    stride: int = 1,
    padding=0,
    use_bias: bool = True,
    groups: int = 1,
    name: str | None = None,
    padding_mode: str = "zeros",
):
    """torch-style conv wrapper: integer padding means symmetric zero pad."""
    if isinstance(padding, int):
        padding = ((padding, padding), (padding, padding))
    return MatmulConv(
        features=features,
        kernel_size=(kernel, kernel),
        strides=(stride, stride),
        padding=padding,
        use_bias=use_bias,
        feature_group_count=groups,
        name=name,
    )


class BasicBlock(nn.Module):
    """Norm-free residual block, LeakyReLU(0.2), bias convs.

    Downsample path: 1x1 conv when stride==1 but channels change, 3x3 conv
    when stride!=1 (reference: modules/layers.py:67-74).
    """

    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        inplanes = x.shape[-1]
        out = conv(self.planes, 3, self.stride, 1, name="conv1")(x)
        out = leaky_relu(out, 0.2)
        out = conv(self.planes, 3, 1, 1, name="conv2")(out)

        if inplanes == self.planes and self.stride == 1:
            identity = x
        elif self.stride == 1:
            identity = conv(self.planes, 1, 1, 0, name="downsample")(x)
        else:
            identity = conv(self.planes, 3, self.stride, 1, name="downsample")(x)

        return leaky_relu(out + identity, 0.2)


class MLP(nn.Module):
    """Linear + LeakyReLU(0.01) stack; final activation optional.

    Parity with reference modules/networks.py:120-135 (LeakyReLU default
    slope 0.01).
    """

    channel_list: Sequence[int]
    disable_final_activation: bool = True

    @nn.compact
    def __call__(self, x):
        n = len(self.channel_list)
        for idx in range(1, n):
            x = nn.Dense(self.channel_list[idx], name=f"linear_{idx - 1}")(x)
            if idx < n - 1 or not self.disable_final_activation:
                x = leaky_relu(x, 0.01)
        return x


def _blurpool_filter(filt_size: int) -> np.ndarray:
    rows = {
        2: np.array([1.0, 1.0]),
        3: np.array([1.0, 2.0, 1.0]),
        4: np.array([1.0, 3.0, 3.0, 1.0]),
        5: np.array([1.0, 4.0, 6.0, 4.0, 1.0]),
    }[filt_size]
    f = np.outer(rows, rows)
    return f / f.sum()


def blur_pool(x_nhwc, filt_size: int = 4, stride: int = 2):
    """antialiased_cnns BlurPool parity: reflect pad then strided binomial
    depthwise conv. For filt_size=4 the pad is (1 left/top, 2 right/bottom)."""
    pad_l = (filt_size - 1) // 2
    pad_r = int(np.ceil((filt_size - 1) / 2.0))
    xp = jnp.pad(
        x_nhwc, ((0, 0), (pad_l, pad_r), (pad_l, pad_r), (0, 0)), mode="reflect"
    )
    c = x_nhwc.shape[-1]
    k = jnp.asarray(_blurpool_filter(filt_size), x_nhwc.dtype)
    kernel = jnp.broadcast_to(k[:, :, None, None], (filt_size, filt_size, 1, c))
    return jax.lax.conv_general_dilated(
        xp,
        kernel,
        (stride, stride),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def max_pool(x_nhwc, window: int, stride: int, padding: int = 0):
    """torch nn.MaxPool2d parity (zero... actually -inf padding)."""
    pads = ((0, 0), (padding, padding), (padding, padding), (0, 0))
    return jax.lax.reduce_window(
        x_nhwc,
        -jnp.inf if jnp.issubdtype(x_nhwc.dtype, jnp.floating) else jnp.iinfo(x_nhwc.dtype).min,
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        pads,
    )


def avg_pool(x_nhwc, window: int, stride: int):
    """torch nn.AvgPool2d parity (no padding)."""
    s = jax.lax.reduce_window(
        x_nhwc, 0.0, jax.lax.add, (1, window, window, 1), (1, stride, stride, 1),
        ((0, 0), (0, 0), (0, 0), (0, 0)),
    )
    return s / (window * window)


def batch_norm(train: bool, eps: float = 1e-5, momentum: float = 0.1, name: str = "bn"):
    """BatchNorm with torch semantics (running stats in 'batch_stats')."""
    return nn.BatchNorm(
        use_running_average=not train, momentum=1.0 - momentum, epsilon=eps, name=name
    )
