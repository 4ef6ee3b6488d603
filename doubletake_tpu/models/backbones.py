"""Backbone encoders (Flax linen, NHWC): matching encoder + image priors.

Re-implementations of the three torch backbones the reference composes
(reference: src/doubletake/modules/networks.py:138-189 and
src/doubletake/experiment_modules/sr_depth_model.py:127-138):

  * ``ResnetMatchingEncoder`` — antialiased ResNet18 stem + layer1
    (Zhang 2019 BlurPool, filt_size=4) followed by a conv/InstanceNorm head
    producing 16-ch matching features at stride 4.
  * ``ResNet18D`` — timm "resnet18d" features_only(5): deep 3-conv stem,
    avg-pool downsample residual stages.
  * ``EfficientNetV2S`` — timm "tf_efficientnetv2_s_in21ft1k"
    features_only(5): TF SAME padding, BN eps 1e-3, SiLU; fused MBConv in the
    early stages, SE-MBConv later.

All blocks are written so a torch->flax checkpoint converter is a pure name
mapping (see checkpoints/convert.py).
"""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from doubletake_tpu.models.layers import (
    MatmulConv,
    avg_pool,
    batch_norm,
    blur_pool,
    conv,
    instance_norm,
    leaky_relu,
    max_pool,
)


class BNBasicBlock(nn.Module):
    """torchvision-style ResNet BasicBlock (BN + ReLU), optional antialiasing.

    resnet-d variant uses AvgPool2d + 1x1 conv in the downsample path.
    """

    planes: int
    stride: int = 1
    avg_down: bool = False
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        inplanes = x.shape[-1]
        out = conv(self.planes, 3, self.stride, 1, use_bias=False, name="conv1")(x)
        out = batch_norm(train, self.bn_eps, name="bn1")(out)
        out = nn.relu(out)
        out = conv(self.planes, 3, 1, 1, use_bias=False, name="conv2")(out)
        out = batch_norm(train, self.bn_eps, name="bn2")(out)

        if inplanes != self.planes or self.stride != 1:
            identity = x
            if self.avg_down and self.stride != 1:
                identity = avg_pool(identity, self.stride, self.stride)
                identity = conv(self.planes, 1, 1, 0, use_bias=False, name="downsample_conv")(identity)
            else:
                identity = conv(
                    self.planes, 1, self.stride, 0, use_bias=False, name="downsample_conv"
                )(identity)
            identity = batch_norm(train, self.bn_eps, name="downsample_bn")(identity)
        else:
            identity = x

        return nn.relu(out + identity)


class ResnetMatchingEncoder(nn.Module):
    """Antialiased ResNet18 stem+layer1 + 16-ch matching head, stride 4.

    Structure (reference networks.py:166-186 with antialiased_cnns.resnet18):
      conv1 7x7 s2 -> bn -> relu -> MaxPool(k2, s1) -> BlurPool(filt4, s2)
      -> layer1 (2 BN BasicBlocks, 64ch)
      -> 1x1 conv 128 -> InstanceNorm -> LeakyReLU(0.2)
      -> 3x3 conv (replicate pad) num_ch_out -> InstanceNorm
    """

    num_ch_out: int = 16

    @nn.compact
    def __call__(self, x_nhw3, train: bool = False):
        x = conv(64, 7, 2, 3, use_bias=False, name="conv1")(x_nhw3)
        x = batch_norm(train, name="bn1")(x)
        x = nn.relu(x)
        x = max_pool(x, 2, 1, 0)
        x = blur_pool(x, filt_size=4, stride=2)
        x = BNBasicBlock(64, name="layer1_0")(x, train)
        x = BNBasicBlock(64, name="layer1_1")(x, train)

        x = conv(128, 1, 1, 0, name="head_conv1")(x)
        x = instance_norm(x)
        x = leaky_relu(x, 0.2)
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
        x = conv(self.num_ch_out, 3, 1, 0, name="head_conv2")(xp)
        return instance_norm(x)


class ResNet18D(nn.Module):
    """timm resnet18d features_only(5): channels [64, 64, 128, 256, 512]."""

    feature_channels = (64, 64, 128, 256, 512)

    @nn.compact
    def __call__(self, x_nhw3, train: bool = False):
        x = conv(32, 3, 2, 1, use_bias=False, name="conv1_0")(x_nhw3)
        x = batch_norm(train, name="bn1_0")(x)
        x = nn.relu(x)
        x = conv(32, 3, 1, 1, use_bias=False, name="conv1_1")(x)
        x = batch_norm(train, name="bn1_1")(x)
        x = nn.relu(x)
        x = conv(64, 3, 1, 1, use_bias=False, name="conv1_2")(x)
        x = batch_norm(train, name="bn1")(x)
        x = nn.relu(x)
        feats = [x]  # stride 2

        x = max_pool(x, 3, 2, 1)
        for li, (planes, stride) in enumerate([(64, 1), (128, 2), (256, 2), (512, 2)]):
            x = BNBasicBlock(planes, stride, avg_down=True, name=f"layer{li + 1}_0")(x, train)
            x = BNBasicBlock(planes, 1, name=f"layer{li + 1}_1")(x, train)
            feats.append(x)
        return feats


def _silu(x):
    return nn.silu(x)


class SqueezeExcite(nn.Module):
    """timm SqueezeExcite: mean-pool -> 1x1 reduce -> act -> 1x1 expand -> sigmoid."""

    rd_channels: int

    @nn.compact
    def __call__(self, x):
        s = x.mean(axis=(1, 2), keepdims=True)
        s = conv(self.rd_channels, 1, 1, 0, name="conv_reduce")(s)
        s = _silu(s)
        s = conv(x.shape[-1], 1, 1, 0, name="conv_expand")(s)
        return x * nn.sigmoid(s)


class ConvBnAct(nn.Module):
    """timm ConvBnAct block ('cn'): conv k3 -> BN -> SiLU, with skip."""

    out_chs: int
    stride: int = 1
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x, train: bool = False):
        shortcut = x
        y = MatmulConv(self.out_chs, (3, 3), (self.stride, self.stride), padding="SAME",
                    use_bias=False, name="conv")(x)
        y = batch_norm(train, self.bn_eps, name="bn1")(y)
        y = _silu(y)
        if self.stride == 1 and x.shape[-1] == self.out_chs:
            y = y + shortcut
        return y


class EdgeResidual(nn.Module):
    """timm EdgeResidual / FusedMBConv ('er'): k3 expand -> pw project."""

    out_chs: int
    exp_ratio: float = 4.0
    stride: int = 1
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        mid = int(in_chs * self.exp_ratio)
        shortcut = x
        y = MatmulConv(mid, (3, 3), (self.stride, self.stride), padding="SAME",
                    use_bias=False, name="conv_exp")(x)
        y = batch_norm(train, self.bn_eps, name="bn1")(y)
        y = _silu(y)
        y = MatmulConv(self.out_chs, (1, 1), (1, 1), padding="SAME", use_bias=False,
                    name="conv_pwl")(y)
        y = batch_norm(train, self.bn_eps, name="bn2")(y)
        if self.stride == 1 and in_chs == self.out_chs:
            y = y + shortcut
        return y


class InvertedResidual(nn.Module):
    """timm InvertedResidual / MBConv ('ir') with SE.

    SE reduced channels are computed from the block *input* channels
    (timm convention: rd = in_chs * se_ratio, acting on the expanded mid).
    """

    out_chs: int
    exp_ratio: float = 4.0
    stride: int = 1
    se_ratio: float = 0.25
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        mid = int(in_chs * self.exp_ratio)
        shortcut = x
        y = MatmulConv(mid, (1, 1), (1, 1), padding="SAME", use_bias=False, name="conv_pw")(x)
        y = batch_norm(train, self.bn_eps, name="bn1")(y)
        y = _silu(y)
        y = MatmulConv(mid, (3, 3), (self.stride, self.stride), padding="SAME",
                    use_bias=False, feature_group_count=mid, name="conv_dw")(y)
        y = batch_norm(train, self.bn_eps, name="bn2")(y)
        y = _silu(y)
        y = SqueezeExcite(max(1, int(in_chs * self.se_ratio)), name="se")(y)
        y = MatmulConv(self.out_chs, (1, 1), (1, 1), padding="SAME", use_bias=False,
                    name="conv_pwl")(y)
        y = batch_norm(train, self.bn_eps, name="bn3")(y)
        if self.stride == 1 and in_chs == self.out_chs:
            y = y + shortcut
        return y


# (block type, repeats, out_chs, exp_ratio, first-stride, se_ratio)
_EFFNETV2_S_ARCH = (
    ("cn", 2, 24, 1.0, 1, 0.0),
    ("er", 4, 48, 4.0, 2, 0.0),
    ("er", 4, 64, 4.0, 2, 0.0),
    ("ir", 6, 128, 4.0, 2, 0.25),
    ("ir", 9, 160, 6.0, 1, 0.25),
    ("ir", 15, 256, 6.0, 2, 0.25),
)


class EfficientNetV2S(nn.Module):
    """tf_efficientnetv2_s features_only(5): channels [24, 48, 64, 160, 256].

    Feature taps after stages 0, 1, 2, 4, 5 (strides 2, 4, 8, 16, 32).
    """

    feature_channels = (24, 48, 64, 160, 256)
    bn_eps: float = 1e-3

    @nn.compact
    def __call__(self, x_nhw3, train: bool = False):
        x = MatmulConv(24, (3, 3), (2, 2), padding="SAME", use_bias=False,
                    name="conv_stem")(x_nhw3)
        x = batch_norm(train, self.bn_eps, name="bn1")(x)
        x = _silu(x)

        feats = []
        for si, (btype, repeats, out_chs, exp, stride0, se) in enumerate(_EFFNETV2_S_ARCH):
            for bi in range(repeats):
                stride = stride0 if bi == 0 else 1
                name = f"blocks_{si}_{bi}"
                if btype == "cn":
                    x = ConvBnAct(out_chs, stride, self.bn_eps, name=name)(x, train)
                elif btype == "er":
                    x = EdgeResidual(out_chs, exp, stride, self.bn_eps, name=name)(x, train)
                else:
                    x = InvertedResidual(out_chs, exp, stride, se, self.bn_eps, name=name)(x, train)
            if si in (0, 1, 2, 4, 5):
                feats.append(x)
        return feats


class TinyEncoder(nn.Module):
    """Toy 5-scale image encoder for CI/dryrun configs (no reference analog).

    One stride-2 conv + BN + ReLU per scale, tiny channels. Exists so the
    full sharded train step (fwd+bwd over the mesh) compiles and runs in
    seconds on virtual CPU devices — the multichip validation path.
    """

    feature_channels = (8, 8, 16, 16, 16)

    @nn.compact
    def __call__(self, x_nhw3, train: bool = False):
        feats = []
        x = x_nhw3
        for si, ch in enumerate(self.feature_channels):
            x = conv(ch, 3, 2, 1, use_bias=False, name=f"conv{si}")(x)
            x = batch_norm(train, name=f"bn{si}")(x)
            x = nn.relu(x)
            feats.append(x)
        return feats


class TinyMatchingEncoder(nn.Module):
    """Toy stride-4 matching encoder for CI/dryrun configs."""

    num_ch_out: int = 16

    @nn.compact
    def __call__(self, x_nhw3, train: bool = False):
        x = conv(16, 3, 2, 1, name="conv0")(x_nhw3)
        x = leaky_relu(x, 0.2)
        x = conv(self.num_ch_out, 3, 2, 1, name="conv1")(x)
        return instance_norm(x)


def get_matching_encoder(matching_encoder_type: str, num_ch_out: int = 16) -> nn.Module:
    """Matching-encoder factory (reference sr_depth_model.py:196-218 selects
    on opts.matching_encoder_type: 'resnet' or 'fpn')."""
    if matching_encoder_type == "resnet":
        return ResnetMatchingEncoder(num_ch_out)
    if matching_encoder_type in ("fpn", "unet"):
        from doubletake_tpu.models.unet_encoder import UNetMatchingEncoder

        return UNetMatchingEncoder(num_ch_out)
    if matching_encoder_type == "tiny":
        return TinyMatchingEncoder(num_ch_out)
    raise ValueError(f"Unrecognized matching encoder: {matching_encoder_type}")


def get_image_encoder(name: str) -> nn.Module:
    """Image-prior encoder factory (reference sr_depth_model.py:127-138)."""
    if "efficientnet" in name:
        return EfficientNetV2S()
    if "resnet18d" in name:
        return ResNet18D()
    if "tiny" in name:
        return TinyEncoder()
    raise ValueError(f"Unrecognized image encoder: {name}")


def encoder_feature_channels(name: str) -> Sequence[int]:
    if "efficientnet" in name:
        return list(EfficientNetV2S.feature_channels)
    if "resnet18d" in name:
        return list(ResNet18D.feature_channels)
    if "tiny" in name:
        return list(TinyEncoder.feature_channels)
    raise ValueError(f"Unrecognized image encoder: {name}")
