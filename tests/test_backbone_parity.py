"""Activation parity for the image-prior backbones vs torch replicas.

VERDICT r1 item 1: neither EfficientNetV2-S nor ResNet18D had any
activation-level parity evidence. timm itself is not installed here, so
these tests rebuild the exact timm architectures in plain torch — TF-SAME
asymmetric padding, BN eps, SiLU, SE gating, avg-pool downsamples — with
timm's parameter naming, push random weights through
checkpoints/convert.py (the same mapping real checkpoints take), and
compare all five feature taps against the Flax backbones.

This certifies (a) the converter's name mapping for the backbone trees and
(b) the JAX blocks' semantics (padding, eps, activation, skip rules)
against torch's operators.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax

from doubletake_tpu.checkpoints.convert import convert_state_dict
from doubletake_tpu.models.backbones import EfficientNetV2S, ResNet18D

H, W = 64, 96


def conv_tf_same(x, weight, stride):
    """timm Conv2dSame: TF-style asymmetric SAME padding."""
    ih, iw = x.shape[-2:]
    kh, kw = weight.shape[-2:]
    pad_h = max((-(-ih // stride) - 1) * stride + kh - ih, 0)
    pad_w = max((-(-iw // stride) - 1) * stride + kw - iw, 0)
    x = F.pad(x, [pad_w // 2, pad_w - pad_w // 2, pad_h // 2, pad_h - pad_h // 2])
    return F.conv2d(x, weight, stride=stride, groups=1)


class _TFConv(nn.Module):
    def __init__(self, cin, cout, k, stride, groups=1):
        super().__init__()
        fan_in = (cin // groups) * k * k
        self.weight = nn.Parameter(torch.randn(cout, cin // groups, k, k)
                                   / fan_in ** 0.5)
        self.stride, self.groups = stride, groups

    def forward(self, x):
        ih, iw = x.shape[-2:]
        kh, kw = self.weight.shape[-2:]
        s = self.stride
        pad_h = max((-(-ih // s) - 1) * s + kh - ih, 0)
        pad_w = max((-(-iw // s) - 1) * s + kw - iw, 0)
        x = F.pad(x, [pad_w // 2, pad_w - pad_w // 2,
                      pad_h // 2, pad_h - pad_h // 2])
        return F.conv2d(x, self.weight, stride=s, groups=self.groups)


def _bn(c, eps):
    bn = nn.BatchNorm2d(c, eps=eps)
    with torch.no_grad():
        bn.weight.copy_(torch.rand(c) + 0.5)
        bn.bias.copy_(torch.randn(c) * 0.1)
        bn.running_mean.copy_(torch.randn(c) * 0.1)
        bn.running_var.copy_(torch.rand(c) + 0.5)
    return bn


class _SE(nn.Module):
    def __init__(self, chs, rd):
        super().__init__()
        self.conv_reduce = nn.Conv2d(chs, rd, 1)
        self.conv_expand = nn.Conv2d(rd, chs, 1)

    def forward(self, x):
        s = x.mean((2, 3), keepdim=True)
        s = F.silu(self.conv_reduce(s))
        return x * torch.sigmoid(self.conv_expand(s))


class _ConvBnAct(nn.Module):
    def __init__(self, cin, cout, stride, eps):
        super().__init__()
        self.conv = _TFConv(cin, cout, 3, stride)
        self.bn1 = _bn(cout, eps)
        self.has_skip = stride == 1 and cin == cout

    def forward(self, x):
        y = F.silu(self.bn1(self.conv(x)))
        return y + x if self.has_skip else y


class _EdgeResidual(nn.Module):
    def __init__(self, cin, cout, exp, stride, eps):
        super().__init__()
        mid = int(cin * exp)
        self.conv_exp = _TFConv(cin, mid, 3, stride)
        self.bn1 = _bn(mid, eps)
        self.conv_pwl = _TFConv(mid, cout, 1, 1)
        self.bn2 = _bn(cout, eps)
        self.has_skip = stride == 1 and cin == cout

    def forward(self, x):
        y = F.silu(self.bn1(self.conv_exp(x)))
        y = self.bn2(self.conv_pwl(y))
        return y + x if self.has_skip else y


class _InvertedResidual(nn.Module):
    def __init__(self, cin, cout, exp, stride, se_ratio, eps):
        super().__init__()
        mid = int(cin * exp)
        self.conv_pw = _TFConv(cin, mid, 1, 1)
        self.bn1 = _bn(mid, eps)
        self.conv_dw = _TFConv(mid, mid, 3, stride, groups=mid)
        self.bn2 = _bn(mid, eps)
        self.se = _SE(mid, max(1, int(cin * se_ratio)))
        self.conv_pwl = _TFConv(mid, cout, 1, 1)
        self.bn3 = _bn(cout, eps)
        self.has_skip = stride == 1 and cin == cout

    def forward(self, x):
        y = F.silu(self.bn1(self.conv_pw(x)))
        y = F.silu(self.bn2(self.conv_dw(y)))
        y = self.se(y)
        y = self.bn3(self.conv_pwl(y))
        return y + x if self.has_skip else y


_ARCH = (  # must mirror backbones._EFFNETV2_S_ARCH
    ("cn", 2, 24, 1.0, 1, 0.0),
    ("er", 4, 48, 4.0, 2, 0.0),
    ("er", 4, 64, 4.0, 2, 0.0),
    ("ir", 6, 128, 4.0, 2, 0.25),
    ("ir", 9, 160, 6.0, 1, 0.25),
    ("ir", 15, 256, 6.0, 2, 0.25),
)


class TorchEffNetV2S(nn.Module):
    """tf_efficientnetv2_s features_only(5) with timm parameter naming."""

    def __init__(self, eps=1e-3):
        super().__init__()
        torch.manual_seed(0)
        self.conv_stem = _TFConv(3, 24, 3, 2)
        self.bn1 = _bn(24, eps)
        blocks = []
        cin = 24
        for (btype, repeats, cout, exp, stride0, se) in _ARCH:
            stage = []
            for bi in range(repeats):
                stride = stride0 if bi == 0 else 1
                if btype == "cn":
                    stage.append(_ConvBnAct(cin, cout, stride, eps))
                elif btype == "er":
                    stage.append(_EdgeResidual(cin, cout, exp, stride, eps))
                else:
                    stage.append(_InvertedResidual(cin, cout, exp, stride, se, eps))
                cin = cout
            blocks.append(nn.Sequential(*stage))
        self.blocks = nn.Sequential(*blocks)

    def forward(self, x):
        x = F.silu(self.bn1(self.conv_stem(x)))
        feats = []
        for si, stage in enumerate(self.blocks):
            x = stage(x)
            if si in (0, 1, 2, 4, 5):
                feats.append(x)
        return feats


class _DBasicBlock(nn.Module):
    """torchvision/timm BasicBlock with resnet-d avg-down, timm naming."""

    def __init__(self, cin, cout, stride, avg_down):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = _bn(cout, 1e-5)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = _bn(cout, 1e-5)
        self.downsample = None
        if cin != cout or stride != 1:
            if avg_down and stride != 1:
                self.downsample = nn.Sequential(
                    nn.AvgPool2d(stride, stride),
                    nn.Conv2d(cin, cout, 1, 1, bias=False),
                    _bn(cout, 1e-5),
                )
            else:
                self.downsample = nn.Sequential(
                    nn.Conv2d(cin, cout, 1, stride, bias=False), _bn(cout, 1e-5)
                )

    def forward(self, x):
        y = F.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        idn = self.downsample(x) if self.downsample is not None else x
        return F.relu(y + idn)


class TorchResNet18D(nn.Module):
    def __init__(self):
        super().__init__()
        torch.manual_seed(1)
        self.conv1 = nn.Sequential(
            nn.Conv2d(3, 32, 3, 2, 1, bias=False), _bn(32, 1e-5), nn.ReLU(),
            nn.Conv2d(32, 32, 3, 1, 1, bias=False), _bn(32, 1e-5), nn.ReLU(),
            nn.Conv2d(32, 64, 3, 1, 1, bias=False),
        )
        self.bn1 = _bn(64, 1e-5)
        cin = 64
        for li, (planes, stride) in enumerate([(64, 1), (128, 2), (256, 2), (512, 2)]):
            blocks = nn.Sequential(
                _DBasicBlock(cin, planes, stride, avg_down=True),
                _DBasicBlock(planes, planes, 1, avg_down=True),
            )
            setattr(self, f"layer{li + 1}", blocks)
            cin = planes

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        feats = [x]
        x = F.max_pool2d(x, 3, 2, 1)
        for li in range(1, 5):
            x = getattr(self, f"layer{li}")(x)
            feats.append(x)
        return feats


def _prefixed_sd(model, prefix="encoder."):
    return {
        prefix + k: v.detach().numpy() for k, v in model.state_dict().items()
    }


def _compare(feats_t, feats_j, rtol):
    assert len(feats_t) == len(feats_j)
    for i, (ft, fj) in enumerate(zip(feats_t, feats_j)):
        a = ft.detach().numpy().transpose(0, 2, 3, 1)
        b = np.asarray(fj)
        assert a.shape == b.shape, f"scale {i}: {a.shape} vs {b.shape}"
        # relative to the activation scale (deep stacks accumulate fp error)
        err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
        assert err < rtol, f"scale {i}: rel diff {err}"


@torch.no_grad()
def test_efficientnetv2s_activation_parity():
    tm = TorchEffNetV2S().eval()
    x = torch.randn(1, 3, H, W)
    feats_t = tm(x)

    variables = convert_state_dict(_prefixed_sd(tm))
    params = variables["params"]["encoder"]
    stats = variables["batch_stats"]["encoder"]
    jm = EfficientNetV2S()
    feats_j = jm.apply(
        {"params": params, "batch_stats": stats},
        np.asarray(x.numpy().transpose(0, 2, 3, 1)),
    )
    _compare(feats_t, feats_j, rtol=2e-3)


@torch.no_grad()
def test_resnet18d_activation_parity():
    tm = TorchResNet18D().eval()
    x = torch.randn(1, 3, H, W)
    feats_t = tm(x)

    variables = convert_state_dict(_prefixed_sd(tm))
    params = variables["params"]["encoder"]
    stats = variables["batch_stats"]["encoder"]
    jm = ResNet18D()
    feats_j = jm.apply(
        {"params": params, "batch_stats": stats},
        np.asarray(x.numpy().transpose(0, 2, 3, 1)),
    )
    _compare(feats_t, feats_j, rtol=2e-3)


class _TorchDS(nn.Module):
    """timm DepthwiseSeparableConv (mnasnet stage 0)."""

    def __init__(self, cin, cout):
        super().__init__()
        self.conv_dw = nn.Conv2d(cin, cin, 3, 1, 1, groups=cin, bias=False)
        self.bn1 = _bn(cin, 1e-5)
        self.conv_pw = nn.Conv2d(cin, cout, 1, bias=False)
        self.bn2 = _bn(cout, 1e-5)

    def forward(self, x):
        return self.bn2(self.conv_pw(F.relu(self.bn1(self.conv_dw(x)))))


class _TorchMnasIR(nn.Module):
    """timm InvertedResidual without SE (mnasnet 'ir')."""

    def __init__(self, cin, cout, exp, k, stride, noskip):
        super().__init__()
        mid = int(cin * exp)
        self.conv_pw = nn.Conv2d(cin, mid, 1, bias=False)
        self.bn1 = _bn(mid, 1e-5)
        self.conv_dw = nn.Conv2d(mid, mid, k, stride, k // 2, groups=mid,
                                 bias=False)
        self.bn2 = _bn(mid, 1e-5)
        self.conv_pwl = nn.Conv2d(mid, cout, 1, bias=False)
        self.bn3 = _bn(cout, 1e-5)
        self.has_skip = not noskip and stride == 1 and cin == cout

    def forward(self, x):
        y = F.relu(self.bn1(self.conv_pw(x)))
        y = F.relu(self.bn2(self.conv_dw(y)))
        y = self.bn3(self.conv_pwl(y))
        return y + x if self.has_skip else y


_MNAS_STAGES = (  # mirrors unet_encoder._MNASNET_STAGES
    (3, 3, 2, 3.0, 24), (3, 5, 2, 3.0, 40), (3, 5, 2, 6.0, 80),
    (2, 3, 1, 6.0, 96), (4, 5, 2, 6.0, 192), (1, 3, 1, 6.0, 320),
)


class TorchUNetMatchingEncoder(nn.Module):
    """mnasnet_100 features_only + torchvision FPN + outconv, timm/tv naming
    (reference networks.py:192-213)."""

    def __init__(self):
        super().__init__()
        torch.manual_seed(2)

        class Enc(nn.Module):
            def __init__(self):
                super().__init__()
                self.conv_stem = nn.Conv2d(3, 32, 3, 2, 1, bias=False)
                self.bn1 = _bn(32, 1e-5)
                blocks = [nn.Sequential(_TorchDS(32, 16))]
                cin = 16
                for (r, k, s0, e, cout) in _MNAS_STAGES:
                    noskip = cout == 320
                    stage = []
                    for bi in range(r):
                        stage.append(_TorchMnasIR(
                            cin, cout, e, k, s0 if bi == 0 else 1,
                            noskip and bi == 0))
                        cin = cout
                    blocks.append(nn.Sequential(*stage))
                self.blocks = nn.Sequential(*blocks)

            def forward(self, x):
                x = F.relu(self.bn1(self.conv_stem(x)))
                feats = []
                for si, stage in enumerate(self.blocks):
                    x = stage(x)
                    if si in (0, 1, 2, 4, 6):
                        feats.append(x)
                return feats

        class FPN(nn.Module):
            def __init__(self, chans, out=32):
                super().__init__()
                self.inner_blocks = nn.ModuleList(
                    [nn.Conv2d(c, out, 1) for c in chans])
                self.layer_blocks = nn.ModuleList(
                    [nn.Conv2d(out, out, 3, 1, 1) for _ in chans])

            def forward(self, feats):
                n = len(feats)
                laterals = [ib(f) for ib, f in zip(self.inner_blocks, feats)]
                merged = [None] * n
                merged[-1] = laterals[-1]
                for i in range(n - 2, -1, -1):
                    up = F.interpolate(merged[i + 1],
                                       size=laterals[i].shape[-2:],
                                       mode="nearest")
                    merged[i] = laterals[i] + up
                return [lb(m) for lb, m in zip(self.layer_blocks, merged)]

        self.encoder = Enc()
        self.decoder = FPN([16, 24, 40, 96, 320])
        self.outconv = nn.Sequential(
            nn.LeakyReLU(0.2), nn.Conv2d(32, 16, 1),
            nn.InstanceNorm2d(16),
        )

    def forward(self, x):
        feats = self.encoder(x)
        fpn = self.decoder(feats)
        return self.outconv(fpn[1])


@torch.no_grad()
def test_unet_matching_encoder_activation_parity():
    from doubletake_tpu.models.unet_encoder import UNetMatchingEncoder

    tm = TorchUNetMatchingEncoder().eval()
    x = torch.randn(1, 3, H, W)
    out_t = tm(x)

    variables = convert_state_dict(_prefixed_sd(tm, prefix="matching_model."))
    params = variables["params"]["matching_model"]
    jm = UNetMatchingEncoder()
    out_j = jm.apply({"params": params, "batch_stats":
                      variables["batch_stats"]["matching_model"]},
                     np.asarray(x.numpy().transpose(0, 2, 3, 1)))
    a = out_t.numpy().transpose(0, 2, 3, 1)
    b = np.asarray(out_j)
    assert a.shape == b.shape
    err = np.abs(a - b).max() / max(np.abs(a).max(), 1e-6)
    assert err < 2e-3, f"rel diff {err}"
