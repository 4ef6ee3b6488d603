"""Cost-volume encoder and depth decoders (Flax linen, NHWC).

Parity with reference src/doubletake/modules/networks.py:20-117 (CVEncoder,
DepthDecoderPP) and src/doubletake/modules/networks_fast.py (SkipDecoder).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from doubletake_tpu.models.layers import BasicBlock, conv
from doubletake_tpu.ops.resize import upsample2x_bilinear

_DEC_CHANNELS = (64, 64, 128, 256)


class DoubleBasicBlock(nn.Module):
    """Two chained BasicBlocks (reference networks.py:13-17)."""

    planes: int

    @nn.compact
    def __call__(self, x):
        x = BasicBlock(self.planes, name="block0")(x)
        return BasicBlock(self.planes, name="block1")(x)


class CVEncoder(nn.Module):
    """First half of the U-Net: fuse cost volume with image-prior features.

    Four blocks; block i downsamples (stride 2, except block 0), concats the
    matching-scale image feature, and refines (reference networks.py:88-117).
    """

    num_ch_outs: Sequence[int] = (64, 128, 256, 384)

    @nn.compact
    def __call__(self, cost_volume, img_feats):
        outputs = []
        x = cost_volume
        for i, ch in enumerate(self.num_ch_outs):
            x = BasicBlock(ch, stride=1 if i == 0 else 2, name=f"ds_conv_{i}")(x)
            x = jnp.concatenate([x, img_feats[i]], axis=-1)
            x = BasicBlock(ch, name=f"conv_{i}_0")(x)
            x = BasicBlock(ch, name=f"conv_{i}_1")(x)
            outputs.append(x)
        return outputs


class DepthDecoderPP(nn.Module):
    """U-Net++ grid decoder with log-depth heads at scales s0..s3.

    Node X(i, j): i is encoder depth (0 finest), j decoder column. Inputs:
      right(X(i, j-1)), up2(diag(X(i+1, j-1))), and up2(up(X(i+1, j))) when
      i + j != 4. Heads output_{i} are applied at the final column for each
      i (the reference recreates/overwrites the same modules and dict keys;
      only the last column's result survives — networks.py:60-85).
    Upsampling is 2x bilinear align_corners=False (generic_utils.py:95-104).
    """

    num_output_channels: int = 1

    @nn.compact
    def __call__(self, input_features):
        dec = _DEC_CHANNELS
        grid = {(i, 0): f for i, f in enumerate(input_features)}
        outputs = {}
        for j in range(1, 5):
            for i in range(4 - j, -1, -1):
                ch = dec[i]
                inputs = [BasicBlock(ch, name=f"right_conv_{i}{j - 1}")(grid[(i, j - 1)])]
                inputs.append(
                    upsample2x_bilinear(
                        BasicBlock(ch, name=f"diag_conv_{i + 1}{j - 1}")(grid[(i + 1, j - 1)])
                    )
                )
                if i + j != 4:
                    inputs.append(
                        upsample2x_bilinear(
                            BasicBlock(ch, name=f"up_conv_{i + 1}{j}")(grid[(i + 1, j)])
                        )
                    )
                x = DoubleBasicBlock(ch, name=f"in_conv_{i}{j}")(
                    jnp.concatenate(inputs, axis=-1)
                )
                grid[(i, j)] = x

                if i + j == 4:  # final column for this i -> surviving head
                    y = x
                    if i != 0:
                        y = BasicBlock(ch, name=f"output_{i}_block")(y)
                    y = conv(self.num_output_channels, 1, name=f"output_{i}_conv")(y)
                    outputs[f"log_depth_pred_s{i}_bhw1"] = y
        return outputs


class _SkipConvBlock(nn.Module):
    """Two 3x3 convs with ELU (reference networks_fast.py:6-24)."""

    out_ch: int

    @nn.compact
    def __call__(self, x):
        x = nn.elu(conv(self.out_ch, 3, 1, 1, name="conv1")(x))
        return nn.elu(conv(self.out_ch, 3, 1, 1, name="conv2")(x))


class _SkipHead(nn.Module):
    """1x1 regression head: 128 -> 128 -> 1 with ELU."""

    @nn.compact
    def __call__(self, x):
        x = nn.elu(conv(128, 1, name="conv1")(x))
        x = nn.elu(conv(128, 1, name="conv2")(x))
        return conv(1, 1, name="conv3")(x)


class SkipDecoderRegression(nn.Module):
    """Lightweight skip-connection decoder ("small" model).

    Four ConvUpsampleAndConcat blocks (pre-conv, nearest 2x upsample, concat
    skip, post-conv) with 1x1 regression heads at each scale
    (reference networks_fast.py:27-141).
    """

    output_channels: Sequence[int] = (256, 128, 64, 64)

    @nn.compact
    def __call__(self, input_features):
        feats = list(input_features)
        x = feats[-1]
        outputs = {}
        for bi, out_ch in enumerate(self.output_channels):
            x = _SkipConvBlock(out_ch, name=f"block{bi + 1}_pre")(x)
            n, h, w, c = x.shape
            x = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)  # nearest 2x
            x = jnp.concatenate([x, feats[-(bi + 2)]], axis=-1)
            x = _SkipConvBlock(out_ch, name=f"block{bi + 1}_post")(x)
            scale = 3 - bi
            outputs[f"log_depth_pred_s{scale}_bhw1"] = _SkipHead(name=f"out{bi + 1}")(x)
        return outputs
