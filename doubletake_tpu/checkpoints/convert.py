"""Reference PyTorch checkpoint -> Flax variables converter.

Maps the reference Lightning checkpoints (simplerecon_model.ckpt,
doubletake_small_model.ckpt, doubletake_model.ckpt — README.md:85-89) onto
this framework's module tree. The source state_dict layout follows the
reference module structure (sr_depth_model.py:127-218):

  encoder.*            timm tf_efficientnetv2_s / resnet18d
  matching_model.net.* antialiased ResNet18 stem+layer1 + conv/IN head
  cost_volume.mlp.net.{0,2,4}            matching MLP [202,128,128,1]
  cost_volume.hint_mlp.net.{0,2,4}       hint MLP [3,12,12,1]
  cost_volume_net.convs.*                CVEncoder
  depth_decoder.convs.*                  DepthDecoderPP / SkipDecoder

Transforms: conv OIHW->HWIO, linear (out,in)->(in,out), BN weight/bias ->
scale/bias with running stats into the 'batch_stats' collection.

Usage:
    variables = convert_reference_checkpoint("doubletake_model.ckpt")
    # -> {"params": ..., "batch_stats": ...} for DepthModel(CVHint).apply
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return {k: v.detach().cpu().numpy() for k, v in sd.items() if hasattr(v, "detach")}


def _conv(sd, key) -> np.ndarray:
    return sd[f"{key}.weight"].transpose(2, 3, 1, 0)


def _dense(sd, key) -> Tuple[np.ndarray, np.ndarray]:
    return sd[f"{key}.weight"].T, sd[f"{key}.bias"]


class _Tree:
    """Builds nested params/batch_stats dicts with path helpers."""

    def __init__(self):
        self.params: Dict = {}
        self.stats: Dict = {}

    def _set(self, root, path, leaf):
        node = root
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = leaf

    def conv(self, sd, src, dst_path, bias=True):
        self._set(self.params, dst_path + ("kernel",), _conv(sd, src))
        if bias and f"{src}.bias" in sd:
            self._set(self.params, dst_path + ("bias",), sd[f"{src}.bias"])

    def dense(self, sd, src, dst_path):
        k, b = _dense(sd, src)
        self._set(self.params, dst_path + ("kernel",), k)
        self._set(self.params, dst_path + ("bias",), b)

    def bn(self, sd, src, dst_path):
        self._set(self.params, dst_path + ("scale",), sd[f"{src}.weight"])
        self._set(self.params, dst_path + ("bias",), sd[f"{src}.bias"])
        self._set(self.stats, dst_path + ("mean",), sd[f"{src}.running_mean"])
        self._set(self.stats, dst_path + ("var",), sd[f"{src}.running_var"])


def _convert_basic_block(t: _Tree, sd, src, dst_path, has_downsample: bool):
    """Norm-free BasicBlock (modules/layers.py:33-94): conv1/conv2 with bias
    plus optional downsample Sequential(conv, Identity)."""
    t.conv(sd, f"{src}.conv1", dst_path + ("conv1",))
    t.conv(sd, f"{src}.conv2", dst_path + ("conv2",))
    if has_downsample or f"{src}.downsample.0.weight" in sd:
        if f"{src}.downsample.0.weight" in sd:
            t.conv(sd, f"{src}.downsample.0", dst_path + ("downsample",))


def _convert_bn_basic_block(t: _Tree, sd, src, dst_path):
    """torchvision/timm BN BasicBlock -> BNBasicBlock."""
    t.conv(sd, f"{src}.conv1", dst_path + ("conv1",), bias=False)
    t.bn(sd, f"{src}.bn1", dst_path + ("bn1",))
    t.conv(sd, f"{src}.conv2", dst_path + ("conv2",), bias=False)
    t.bn(sd, f"{src}.bn2", dst_path + ("bn2",))
    # resnet-d downsample: Sequential(avgpool, conv, bn); plain: (conv, bn)
    for conv_idx, bn_idx in ((1, 2), (0, 1)):
        if f"{src}.downsample.{conv_idx}.weight" in sd and \
           sd[f"{src}.downsample.{conv_idx}.weight"].ndim == 4:
            t.conv(sd, f"{src}.downsample.{conv_idx}",
                   dst_path + ("downsample_conv",), bias=False)
            t.bn(sd, f"{src}.downsample.{bn_idx}", dst_path + ("downsample_bn",))
            break


def _convert_matching_encoder(t: _Tree, sd):
    """matching_model.net Sequential: 0 conv1, 1 bn1, 3 maxpool+blurpool,
    4 layer1, 5 head conv1x1, 8 head conv3x3 (networks.py:179-186)."""
    p = ("matching_model",)
    t.conv(sd, "matching_model.net.0", p + ("conv1",), bias=False)
    t.bn(sd, "matching_model.net.1", p + ("bn1",))
    for bi in range(2):
        _convert_bn_basic_block(t, sd, f"matching_model.net.4.{bi}", p + (f"layer1_{bi}",))
    t.conv(sd, "matching_model.net.5", p + ("head_conv1",))
    t.conv(sd, "matching_model.net.8", p + ("head_conv2",))


def _convert_mlp(t: _Tree, sd, src, dst_path, num_layers=3):
    for li in range(num_layers):
        t.dense(sd, f"{src}.net.{2 * li}", dst_path + (f"linear_{li}",))


def _convert_cv_encoder(t: _Tree, sd):
    p = ("cost_volume_net",)
    for i in range(4):
        _convert_basic_block(t, sd, f"cost_volume_net.convs.ds_conv_{i}",
                             p + (f"ds_conv_{i}",), has_downsample=True)
        for j in range(2):
            _convert_basic_block(t, sd, f"cost_volume_net.convs.conv_{i}.{j}",
                                 p + (f"conv_{i}_{j}",), has_downsample=True)


def _convert_depth_decoder_pp(t: _Tree, sd):
    p = ("depth_decoder",)
    prefix = "depth_decoder.convs"
    for j in range(1, 5):
        for i in range(4 - j, -1, -1):
            _convert_basic_block(t, sd, f"{prefix}.diag_conv_{i + 1}{j - 1}",
                                 p + (f"diag_conv_{i + 1}{j - 1}",), True)
            _convert_basic_block(t, sd, f"{prefix}.right_conv_{i}{j - 1}",
                                 p + (f"right_conv_{i}{j - 1}",), True)
            if i + j != 4:
                _convert_basic_block(t, sd, f"{prefix}.up_conv_{i + 1}{j}",
                                     p + (f"up_conv_{i + 1}{j}",), True)
            _convert_basic_block(t, sd, f"{prefix}.in_conv_{i}{j}.0",
                                 p + (f"in_conv_{i}{j}", "block0"), True)
            _convert_basic_block(t, sd, f"{prefix}.in_conv_{i}{j}.conv_0",
                                 p + (f"in_conv_{i}{j}", "block1"), True)
    for i in range(4):
        if f"{prefix}.output_{i}.0.conv1.weight" in sd:
            _convert_basic_block(t, sd, f"{prefix}.output_{i}.0",
                                 p + (f"output_{i}_block",), True)
        t.conv(sd, f"{prefix}.output_{i}.1", p + (f"output_{i}_conv",))


def _convert_skip_decoder(t: _Tree, sd):
    p = ("depth_decoder",)
    for bi in range(1, 5):
        t.conv(sd, f"depth_decoder.block{bi}.pre_concat_conv.conv1",
               p + (f"block{bi}_pre", "conv1"))
        t.conv(sd, f"depth_decoder.block{bi}.pre_concat_conv.conv2",
               p + (f"block{bi}_pre", "conv2"))
        t.conv(sd, f"depth_decoder.block{bi}.post_concat_conv.conv1",
               p + (f"block{bi}_post", "conv1"))
        t.conv(sd, f"depth_decoder.block{bi}.post_concat_conv.conv2",
               p + (f"block{bi}_post", "conv2"))
        for ci, idx in ((1, 0), (2, 2), (3, 4)):
            t.conv(sd, f"depth_decoder.out{bi}.{idx}",
                   p + (f"out{bi}", f"conv{ci}"))


def _convert_effnetv2(t: _Tree, sd):
    """timm tf_efficientnetv2_s features_only -> EfficientNetV2S."""
    p = ("encoder",)
    t.conv(sd, "encoder.conv_stem", p + ("conv_stem",), bias=False)
    t.bn(sd, "encoder.bn1", p + ("bn1",))
    arch = ((2, "cn"), (4, "er"), (4, "er"), (6, "ir"), (9, "ir"), (15, "ir"))
    for si, (repeats, btype) in enumerate(arch):
        for bi in range(repeats):
            src = f"encoder.blocks.{si}.{bi}"
            dst = p + (f"blocks_{si}_{bi}",)
            if btype == "cn":
                t.conv(sd, f"{src}.conv", dst + ("conv",), bias=False)
                t.bn(sd, f"{src}.bn1", dst + ("bn1",))
            elif btype == "er":
                t.conv(sd, f"{src}.conv_exp", dst + ("conv_exp",), bias=False)
                t.bn(sd, f"{src}.bn1", dst + ("bn1",))
                t.conv(sd, f"{src}.conv_pwl", dst + ("conv_pwl",), bias=False)
                t.bn(sd, f"{src}.bn2", dst + ("bn2",))
            else:
                t.conv(sd, f"{src}.conv_pw", dst + ("conv_pw",), bias=False)
                t.bn(sd, f"{src}.bn1", dst + ("bn1",))
                t.conv(sd, f"{src}.conv_dw", dst + ("conv_dw",), bias=False)
                t.bn(sd, f"{src}.bn2", dst + ("bn2",))
                t.conv(sd, f"{src}.se.conv_reduce", dst + ("se", "conv_reduce"))
                t.conv(sd, f"{src}.se.conv_expand", dst + ("se", "conv_expand"))
                t.conv(sd, f"{src}.conv_pwl", dst + ("conv_pwl",), bias=False)
                t.bn(sd, f"{src}.bn3", dst + ("bn3",))


def _convert_resnet18d(t: _Tree, sd):
    """timm resnet18d features_only -> ResNet18D."""
    p = ("encoder",)
    t.conv(sd, "encoder.conv1.0", p + ("conv1_0",), bias=False)
    t.bn(sd, "encoder.conv1.1", p + ("bn1_0",))
    t.conv(sd, "encoder.conv1.3", p + ("conv1_1",), bias=False)
    t.bn(sd, "encoder.conv1.4", p + ("bn1_1",))
    t.conv(sd, "encoder.conv1.6", p + ("conv1_2",), bias=False)
    t.bn(sd, "encoder.bn1", p + ("bn1",))
    for li in range(1, 5):
        for bi in range(2):
            _convert_bn_basic_block(
                t, sd, f"encoder.layer{li}.{bi}", p + (f"layer{li}_{bi}",)
            )


def _convert_unet_matching_encoder(t: _Tree, sd):
    """timm mnasnet_100 + torchvision FPN matching encoder
    (reference networks.py:192-213) -> UNetMatchingEncoder."""
    p = ("matching_model",)
    enc = p + ("encoder",)
    t.conv(sd, "matching_model.encoder.conv_stem", enc + ("conv_stem",), bias=False)
    t.bn(sd, "matching_model.encoder.bn1", enc + ("bn1",))
    src = "matching_model.encoder.blocks.0.0"
    dst = enc + ("blocks_0_0",)
    t.conv(sd, f"{src}.conv_dw", dst + ("conv_dw",), bias=False)
    t.bn(sd, f"{src}.bn1", dst + ("bn1",))
    t.conv(sd, f"{src}.conv_pw", dst + ("conv_pw",), bias=False)
    t.bn(sd, f"{src}.bn2", dst + ("bn2",))
    for si, repeats in enumerate((3, 3, 3, 2, 4, 1), start=1):
        for bi in range(repeats):
            src = f"matching_model.encoder.blocks.{si}.{bi}"
            dst = enc + (f"blocks_{si}_{bi}",)
            t.conv(sd, f"{src}.conv_pw", dst + ("conv_pw",), bias=False)
            t.bn(sd, f"{src}.bn1", dst + ("bn1",))
            t.conv(sd, f"{src}.conv_dw", dst + ("conv_dw",), bias=False)
            t.bn(sd, f"{src}.bn2", dst + ("bn2",))
            t.conv(sd, f"{src}.conv_pwl", dst + ("conv_pwl",), bias=False)
            t.bn(sd, f"{src}.bn3", dst + ("bn3",))
    dec = p + ("decoder",)
    for i in range(5):
        for tv_name, flax_name in (("inner_blocks", "inner"),
                                   ("layer_blocks", "layer")):
            base = f"matching_model.decoder.{tv_name}.{i}"
            # newer torchvision wraps the convs in Conv2dNormActivation
            key = base if f"{base}.weight" in sd else f"{base}.0"
            t.conv(sd, key, dec + (f"{flax_name}_{i}",))
    t.conv(sd, "matching_model.outconv.1", p + ("outconv",))


def convert_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """Convert a reference state_dict to {"params", "batch_stats"}."""
    t = _Tree()

    if "encoder.conv_stem.weight" in sd:
        _convert_effnetv2(t, sd)
    elif "encoder.conv1.0.weight" in sd:
        _convert_resnet18d(t, sd)

    if "matching_model.net.0.weight" in sd:
        _convert_matching_encoder(t, sd)
    elif "matching_model.encoder.conv_stem.weight" in sd:
        _convert_unet_matching_encoder(t, sd)
    if "cost_volume.mlp.net.0.weight" in sd:
        _convert_mlp(t, sd, "cost_volume.mlp", ("cost_volume", "mlp"))
    if "cost_volume.hint_mlp.net.0.weight" in sd:
        _convert_mlp(t, sd, "cost_volume.hint_mlp", ("cost_volume", "hint_mlp"))
    if "cost_volume_net.convs.ds_conv_0.conv1.weight" in sd:
        _convert_cv_encoder(t, sd)

    if "depth_decoder.convs.in_conv_04.0.conv1.weight" in sd:
        _convert_depth_decoder_pp(t, sd)
    elif "depth_decoder.block1.pre_concat_conv.conv1.weight" in sd:
        _convert_skip_decoder(t, sd)

    return {"params": t.params, "batch_stats": t.stats}


def convert_reference_checkpoint(path: str) -> Dict:
    return convert_state_dict(_load_state_dict(path))
