"""UNet/FPN matching encoder (Flax linen, NHWC).

Re-implementation of the reference's alternative matching encoder
(reference: src/doubletake/modules/networks.py:192-213): a timm
``mnasnet_100`` backbone (features_only, 5 scales) feeding a torchvision
``FeaturePyramidNetwork(out_channels=32)``, of which only the stride-4
level ("feat_1") is used, followed by LeakyReLU(0.2) -> 1x1 conv to
``num_ch_out`` -> InstanceNorm.

Structure mirrors timm's _gen_mnasnet_b1 (no squeeze-excite, ReLU, BN
eps 1e-5) so the torch->flax checkpoint converter is a pure name mapping.
"""

from __future__ import annotations

from flax import linen as nn

from doubletake_tpu.models.layers import (
    MatmulConv,
    batch_norm,
    conv,
    instance_norm,
    leaky_relu,
)


class _DepthwiseSeparable(nn.Module):
    """timm DepthwiseSeparableConv (mnasnet stage 0): dw3x3 -> pw1x1."""

    out_chs: int
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        y = MatmulConv(c, (3, 3), (1, 1), padding=((1, 1), (1, 1)),
                       use_bias=False, feature_group_count=c,
                       name="conv_dw")(x)
        y = batch_norm(train, self.bn_eps, name="bn1")(y)
        y = nn.relu(y)
        y = MatmulConv(self.out_chs, (1, 1), (1, 1), padding=((0, 0), (0, 0)),
                       use_bias=False, name="conv_pw")(y)
        return batch_norm(train, self.bn_eps, name="bn2")(y)


class _InvertedResidual(nn.Module):
    """timm InvertedResidual without SE (mnasnet_100 'ir' blocks)."""

    out_chs: int
    exp_ratio: float
    kernel: int = 3
    stride: int = 1
    noskip: bool = False
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_chs = x.shape[-1]
        mid = int(in_chs * self.exp_ratio)
        shortcut = x
        y = MatmulConv(mid, (1, 1), (1, 1), padding=((0, 0), (0, 0)),
                       use_bias=False, name="conv_pw")(x)
        y = batch_norm(train, self.bn_eps, name="bn1")(y)
        y = nn.relu(y)
        kp = self.kernel // 2
        y = MatmulConv(mid, (self.kernel, self.kernel), (self.stride, self.stride),
                       padding=((kp, kp), (kp, kp)), use_bias=False,
                       feature_group_count=mid, name="conv_dw")(y)
        y = batch_norm(train, self.bn_eps, name="bn2")(y)
        y = nn.relu(y)
        y = MatmulConv(self.out_chs, (1, 1), (1, 1), padding=((0, 0), (0, 0)),
                       use_bias=False, name="conv_pwl")(y)
        y = batch_norm(train, self.bn_eps, name="bn3")(y)
        if not self.noskip and self.stride == 1 and in_chs == self.out_chs:
            y = y + shortcut
        return y


# (repeats, kernel, first-stride, exp_ratio, out_chs) per mnasnet_100 stage 1..6
_MNASNET_STAGES = (
    (3, 3, 2, 3.0, 24),
    (3, 5, 2, 3.0, 40),
    (3, 5, 2, 6.0, 80),
    (2, 3, 1, 6.0, 96),
    (4, 5, 2, 6.0, 192),
    (1, 3, 1, 6.0, 320),
)


class MnasNet100(nn.Module):
    """timm mnasnet_100 features_only(5): channels [16, 24, 40, 96, 320]."""

    feature_channels = (16, 24, 40, 96, 320)
    bn_eps: float = 1e-5

    @nn.compact
    def __call__(self, x_nhw3, train: bool = False):
        x = MatmulConv(32, (3, 3), (2, 2), padding=((1, 1), (1, 1)),
                       use_bias=False, name="conv_stem")(x_nhw3)
        x = batch_norm(train, self.bn_eps, name="bn1")(x)
        x = nn.relu(x)
        x = _DepthwiseSeparable(16, self.bn_eps, name="blocks_0_0")(x, train)
        feats = [x]  # stride 2
        for si, (repeats, k, stride0, exp, out_chs) in enumerate(_MNASNET_STAGES):
            noskip = si == len(_MNASNET_STAGES) - 1  # last stage is _noskip
            for bi in range(repeats):
                x = _InvertedResidual(
                    out_chs, exp, k, stride0 if bi == 0 else 1,
                    noskip=noskip and bi == 0, bn_eps=self.bn_eps,
                    name=f"blocks_{si + 1}_{bi}",
                )(x, train)
            if si in (0, 1, 3, 5):  # strides 4, 8, 16, 32
                feats.append(x)
        return feats


class FeaturePyramid(nn.Module):
    """torchvision FeaturePyramidNetwork: 1x1 laterals, nearest top-down
    adds, 3x3 output convs. Returns all levels finest-first."""

    out_channels: int = 32

    @nn.compact
    def __call__(self, feats):
        n = len(feats)
        laterals = [
            conv(self.out_channels, 1, name=f"inner_{i}")(f)
            for i, f in enumerate(feats)
        ]
        merged = [None] * n
        merged[n - 1] = laterals[n - 1]
        for i in range(n - 2, -1, -1):
            up = merged[i + 1]
            # nearest-neighbor 2x (torchvision interpolate(..., mode="nearest"))
            up = up.repeat(2, axis=1).repeat(2, axis=2)
            up = up[:, : laterals[i].shape[1], : laterals[i].shape[2]]
            merged[i] = laterals[i] + up
        return [
            conv(self.out_channels, 3, 1, 1, name=f"layer_{i}")(m)
            for i, m in enumerate(merged)
        ]


class UNetMatchingEncoder(nn.Module):
    """mnasnet_100 + FPN matching encoder, stride 4, ``num_ch_out`` channels."""

    num_ch_out: int = 16

    @nn.compact
    def __call__(self, x_nhw3, train: bool = False):
        feats = MnasNet100(name="encoder")(x_nhw3, train)
        fpn = FeaturePyramid(out_channels=32, name="decoder")(feats)
        y = fpn[1]  # "feat_1": stride 4
        y = leaky_relu(y, 0.2)
        y = conv(self.num_ch_out, 1, name="outconv")(y)
        return instance_norm(y)
