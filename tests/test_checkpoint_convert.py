"""Checkpoint-converter parity tests.

Torch fixtures below rebuild the reference's module structures (same
Sequential indices / ModuleDict key names the converter expects), run them
on random inputs, and compare against the flax modules loaded with the
converted weights — validating both the name mapping and the numerics of
BasicBlock, the matching encoder (incl. BlurPool + maxpool stem), CVEncoder,
DepthDecoderPP, the MLPs, and TF-SAME conv padding.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from doubletake_tpu.checkpoints.convert import convert_state_dict
from doubletake_tpu.checkpoints.io import lazy_load_params
from doubletake_tpu.models.backbones import ResnetMatchingEncoder
from doubletake_tpu.models.decoders import CVEncoder, DepthDecoderPP
from doubletake_tpu.models.layers import MLP, BasicBlock


# ---------------------------------------------------------------- fixtures


class TorchBasicBlock(nn.Module):
    """Reference norm-free BasicBlock (modules/layers.py:33-94 behavior)."""

    def __init__(self, inplanes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=True)
        self.relu = nn.LeakyReLU(0.2)
        if inplanes == planes and stride == 1:
            self.downsample = None
        else:
            conv = (
                nn.Conv2d(inplanes, planes, 1, 1, 0, bias=True)
                if stride == 1
                else nn.Conv2d(inplanes, planes, 3, stride, 1, bias=True)
            )
            self.downsample = nn.Sequential(conv, nn.Identity())

    def forward(self, x):
        out = self.relu(self.conv1(x))
        out = self.conv2(out)
        identity = x if self.downsample is None else self.downsample(x)
        return self.relu(out + identity)


class TorchBlurPool(nn.Module):
    """antialiased_cnns.BlurPool(filt_size=4, stride=2) behavior."""

    def __init__(self, channels):
        super().__init__()
        a = np.array([1.0, 3.0, 3.0, 1.0])
        filt = np.outer(a, a)
        filt = filt / filt.sum()
        self.register_buffer(
            "filt",
            torch.from_numpy(filt.astype(np.float32))[None, None].repeat(
                channels, 1, 1, 1
            ),
        )
        self.channels = channels

    def forward(self, x):
        xp = F.pad(x, (1, 2, 1, 2), mode="reflect")
        return F.conv2d(xp, self.filt, stride=2, groups=self.channels)


class TorchBNBasicBlock(nn.Module):
    def __init__(self, planes=64):
        super().__init__()
        self.conv1 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + x)


def make_torch_matching_encoder():
    """matching_model.net Sequential with reference indices
    (networks.py:179-186 + antialiased stem)."""
    return nn.Sequential(
        nn.Conv2d(3, 64, 7, 2, 3, bias=False),              # 0 conv1
        nn.BatchNorm2d(64),                                  # 1 bn1
        nn.ReLU(),                                           # 2
        nn.Sequential(nn.MaxPool2d(2, 1), TorchBlurPool(64)),  # 3 maxpool
        nn.Sequential(TorchBNBasicBlock(), TorchBNBasicBlock()),  # 4 layer1
        nn.Conv2d(64, 128, 1),                               # 5
        nn.InstanceNorm2d(128),                              # 6
        nn.LeakyReLU(0.2, True),                             # 7
        nn.Conv2d(128, 16, 3, padding=1, padding_mode="replicate"),  # 8
        nn.InstanceNorm2d(16),                               # 9
    )


def run_torch(mod, x_nhwc):
    with torch.no_grad():
        t = torch.from_numpy(np.ascontiguousarray(x_nhwc.transpose(0, 3, 1, 2)))
        return mod.eval()(t).numpy().transpose(0, 2, 3, 1)


def randomize(mod, seed=0, scale=0.1):
    g = torch.Generator().manual_seed(seed)
    for p in mod.parameters():
        with torch.no_grad():
            p.copy_(torch.randn(p.shape, generator=g) * scale)
    for m in mod.modules():
        if isinstance(m, nn.BatchNorm2d):
            with torch.no_grad():
                m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.1)
                m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
    return mod


# ------------------------------------------------------------------ tests


def test_matching_encoder_parity():
    torch_enc = randomize(make_torch_matching_encoder())
    sd = {f"matching_model.net.{k}": v for k, v in torch_enc.state_dict().items()}
    # rename inner layer1 block keys to reference style: net.4.0.conv1...
    sd = {k: v.numpy() for k, v in sd.items()}

    converted = convert_state_dict(sd)

    model = ResnetMatchingEncoder(16)
    x = np.random.RandomState(0).randn(1, 64, 96, 3).astype(np.float32) * 0.5
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = lazy_load_params(
        variables,
        {
            "params": converted["params"]["matching_model"],
            "batch_stats": converted["batch_stats"]["matching_model"],
        },
    )
    out = np.asarray(model.apply(variables, jnp.asarray(x)))
    ref = run_torch(torch_enc, x)
    assert out.shape == ref.shape == (1, 16, 24, 16)
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-4)


def test_basic_block_parity():
    for inp, planes, stride in [(8, 8, 1), (8, 16, 1), (8, 16, 2)]:
        tb = randomize(TorchBasicBlock(inp, planes, stride), seed=stride)
        x = np.random.RandomState(1).randn(2, 12, 16, inp).astype(np.float32)

        fb = BasicBlock(planes, stride)
        variables = fb.init(jax.random.PRNGKey(0), jnp.asarray(x))
        params = {
            "conv1": {
                "kernel": tb.conv1.weight.detach().numpy().transpose(2, 3, 1, 0),
                "bias": tb.conv1.bias.detach().numpy(),
            },
            "conv2": {
                "kernel": tb.conv2.weight.detach().numpy().transpose(2, 3, 1, 0),
                "bias": tb.conv2.bias.detach().numpy(),
            },
        }
        if tb.downsample is not None:
            params["downsample"] = {
                "kernel": tb.downsample[0].weight.detach().numpy().transpose(2, 3, 1, 0),
                "bias": tb.downsample[0].bias.detach().numpy(),
            }
        out = np.asarray(fb.apply({"params": params}, jnp.asarray(x)))
        ref = run_torch(tb, x)
        np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-5)


def test_lightning_ckpt_file_roundtrip(tmp_path):
    """The exact code path real checkpoints take: a Lightning-layout .ckpt
    FILE on disk (state_dict tensors + hparams/epoch metadata, as
    sr_depth_model.py saves them via Lightning) loaded through
    convert_reference_checkpoint must produce the same tree as the
    in-memory conversion — including skipping non-tensor entries."""
    from doubletake_tpu.checkpoints.convert import convert_reference_checkpoint

    torch_enc = randomize(make_torch_matching_encoder())
    sd = {f"matching_model.net.{k}": v for k, v in torch_enc.state_dict().items()}

    path = str(tmp_path / "reference_model.ckpt")
    torch.save(
        {
            "state_dict": sd,
            "hyper_parameters": {"opts": {"name": "doubletake"}},
            "epoch": 3,
            "global_step": 110000,
            "pytorch-lightning_version": "1.9.0",
            "optimizer_states": [{}],
            "lr_schedulers": [{}],
        },
        path,
    )
    from_file = convert_reference_checkpoint(path)
    in_memory = convert_state_dict({k: v.numpy() for k, v in sd.items()})

    flat_a = jax.tree_util.tree_leaves_with_path(from_file)
    flat_b = jax.tree_util.tree_leaves_with_path(in_memory)
    assert [p for p, _ in flat_a] == [p for p, _ in flat_b]
    for (pa, a), (_, b) in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))


class TorchMLP(nn.Module):
    def __init__(self, channels):
        super().__init__()
        layers = []
        for i in range(len(channels) - 1):
            layers.append(nn.Linear(channels[i], channels[i + 1]))
            layers.append(nn.LeakyReLU(inplace=True))
        self.net = nn.Sequential(*layers[:-1])

    def forward(self, x):
        return self.net(x)


def test_mlp_parity():
    tm = randomize(TorchMLP([10, 12, 12, 1]))
    sd = {f"cost_volume.mlp.{k}": v.numpy() for k, v in tm.state_dict().items()}
    converted = convert_state_dict(sd)

    fm = MLP(channel_list=(10, 12, 12, 1), disable_final_activation=True)
    x = np.random.RandomState(2).randn(5, 10).astype(np.float32)
    variables = fm.init(jax.random.PRNGKey(0), jnp.asarray(x))
    variables = lazy_load_params(
        variables, {"params": converted["params"]["cost_volume"]["mlp"]}
    )
    out = np.asarray(fm.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-6)


class TorchCVEncoder(nn.Module):
    """Reference CVEncoder structure (networks.py:88-117)."""

    def __init__(self, num_ch_cv, num_ch_enc, num_ch_outs):
        super().__init__()
        self.convs = nn.ModuleDict()
        self.num_blocks = len(num_ch_outs)
        for i in range(self.num_blocks):
            num_ch_in = num_ch_cv if i == 0 else num_ch_outs[i - 1]
            num_ch_out = num_ch_outs[i]
            self.convs[f"ds_conv_{i}"] = TorchBasicBlock(
                num_ch_in, num_ch_out, stride=1 if i == 0 else 2
            )
            self.convs[f"conv_{i}"] = nn.Sequential(
                TorchBasicBlock(num_ch_enc[i] + num_ch_out, num_ch_out),
                TorchBasicBlock(num_ch_out, num_ch_out),
            )

    def forward(self, x, img_feats):
        outputs = []
        for i in range(self.num_blocks):
            x = self.convs[f"ds_conv_{i}"](x)
            x = torch.cat([x, img_feats[i]], dim=1)
            x = self.convs[f"conv_{i}"](x)
            outputs.append(x)
        return outputs


def test_cv_encoder_parity():
    num_ch_enc = [8, 12, 16, 20]
    num_ch_outs = [16, 24, 32, 40]
    tcv = randomize(TorchCVEncoder(6, num_ch_enc, num_ch_outs))
    sd = {f"cost_volume_net.{k}": v.numpy() for k, v in tcv.state_dict().items()}
    converted = convert_state_dict(sd)

    rng = np.random.RandomState(3)
    H, W = 16, 24
    cv = rng.randn(1, H, W, 6).astype(np.float32)
    img_feats = [
        rng.randn(1, H // 2**i, W // 2**i, c).astype(np.float32)
        for i, c in enumerate(num_ch_enc)
    ]

    fcv = CVEncoder(num_ch_outs=tuple(num_ch_outs))
    variables = fcv.init(
        jax.random.PRNGKey(0), jnp.asarray(cv), [jnp.asarray(f) for f in img_feats]
    )
    variables = lazy_load_params(
        variables, {"params": converted["params"]["cost_volume_net"]}
    )
    outs = fcv.apply(variables, jnp.asarray(cv), [jnp.asarray(f) for f in img_feats])

    with torch.no_grad():
        t_outs = tcv(
            torch.from_numpy(cv.transpose(0, 3, 1, 2)),
            [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in img_feats],
        )
    for o, r in zip(outs, t_outs):
        np.testing.assert_allclose(
            np.asarray(o), r.numpy().transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
        )


class TorchDepthDecoderPP(nn.Module):
    """Reference U-Net++ decoder structure (networks.py:20-85)."""

    def __init__(self, num_ch_enc):
        super().__init__()
        self.num_ch_dec = [64, 64, 128, 256]
        self.convs = nn.ModuleDict()
        for j in range(1, 5):
            for i in range(4 - j, -1, -1):
                num_ch_out = self.num_ch_dec[i]
                total = 0
                nin = num_ch_enc[i + 1] if j == 1 else self.num_ch_dec[i + 1]
                self.convs[f"diag_conv_{i + 1}{j - 1}"] = TorchBasicBlock(nin, num_ch_out)
                total += num_ch_out
                nin = num_ch_enc[i] if j == 1 else self.num_ch_dec[i]
                self.convs[f"right_conv_{i}{j - 1}"] = TorchBasicBlock(nin, num_ch_out)
                total += num_ch_out
                if i + j != 4:
                    self.convs[f"up_conv_{i + 1}{j}"] = TorchBasicBlock(
                        self.num_ch_dec[i + 1], num_ch_out
                    )
                    total += num_ch_out
                block = nn.Sequential(TorchBasicBlock(total, num_ch_out))
                block.add_module("conv_0", TorchBasicBlock(num_ch_out, num_ch_out))
                self.convs[f"in_conv_{i}{j}"] = block
                self.convs[f"output_{i}"] = nn.Sequential(
                    TorchBasicBlock(num_ch_out, num_ch_out) if i != 0 else nn.Identity(),
                    nn.Conv2d(num_ch_out, 1, 1),
                )

    def forward(self, input_features):
        up = lambda x: F.interpolate(x, scale_factor=2, mode="bilinear", align_corners=False)
        prev_outputs = input_features
        outputs = []
        depth_outputs = {}
        for j in range(1, 5):
            for i in range(4 - j, -1, -1):
                inputs = [self.convs[f"right_conv_{i}{j - 1}"](prev_outputs[i])]
                inputs += [up(self.convs[f"diag_conv_{i + 1}{j - 1}"](prev_outputs[i + 1]))]
                if i + j != 4:
                    inputs += [up(self.convs[f"up_conv_{i + 1}{j}"](outputs[-1]))]
                out = self.convs[f"in_conv_{i}{j}"](torch.cat(inputs, 1))
                outputs.append(out)
                depth_outputs[f"s{i}"] = self.convs[f"output_{i}"](out)
            prev_outputs = outputs[::-1]
        return depth_outputs


@pytest.mark.slow
def test_depth_decoder_pp_parity():
    # norm-free blocks amplify: keep weights small so 20 stacked convs stay
    # in a numerically comparable range
    num_ch_enc = [8, 12, 16, 20, 24]
    tdec = randomize(TorchDepthDecoderPP(num_ch_enc), scale=0.02)
    sd = {f"depth_decoder.{k}": v.numpy() for k, v in tdec.state_dict().items()}
    converted = convert_state_dict(sd)

    rng = np.random.RandomState(4)
    H, W = 32, 48
    feats = [
        rng.randn(1, H // 2**i, W // 2**i, c).astype(np.float32)
        for i, c in enumerate(num_ch_enc)
    ]

    fdec = DepthDecoderPP()
    variables = fdec.init(jax.random.PRNGKey(0), [jnp.asarray(f) for f in feats])
    variables = lazy_load_params(
        variables, {"params": converted["params"]["depth_decoder"]}
    )
    outs = fdec.apply(variables, [jnp.asarray(f) for f in feats])

    with torch.no_grad():
        t_outs = tdec([torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats])
    for i in range(4):
        np.testing.assert_allclose(
            np.asarray(outs[f"log_depth_pred_s{i}_bhw1"]),
            t_outs[f"s{i}"].numpy().transpose(0, 2, 3, 1),
            rtol=1e-3, atol=1e-4,
        )


def test_tf_same_padding_stride2():
    """flax SAME conv must match timm's Conv2dSame asymmetric padding."""
    from flax import linen as fnn

    w = np.random.RandomState(5).randn(3, 3, 4, 8).astype(np.float32) * 0.1
    x = np.random.RandomState(6).randn(1, 9, 13, 4).astype(np.float32)

    conv = fnn.Conv(8, (3, 3), (2, 2), padding="SAME", use_bias=False)
    out = conv.apply({"params": {"kernel": w}}, jnp.asarray(x))

    # timm Conv2dSame: pad (left, right, top, bottom) so out = ceil(in/s)
    t = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ih, iw = 9, 13
    pad_h = max((int(np.ceil(ih / 2)) - 1) * 2 + 3 - ih, 0)
    pad_w = max((int(np.ceil(iw / 2)) - 1) * 2 + 3 - iw, 0)
    tp = F.pad(t, (pad_w // 2, pad_w - pad_w // 2, pad_h // 2, pad_h - pad_h // 2))
    ref = F.conv2d(tp, torch.from_numpy(w.transpose(3, 2, 0, 1)), stride=2)
    np.testing.assert_allclose(
        np.asarray(out), ref.numpy().transpose(0, 2, 3, 1), rtol=1e-4, atol=1e-5
    )


def test_lazy_load_tolerates_partial_and_mismatched_checkpoints(tmp_path):
    """Failure-robustness: loading a checkpoint with missing keys, extra
    keys, and shape mismatches must keep the initialized values for
    everything that doesn't fit (reference model_utils.py:47-63)."""
    import os
    import numpy as np
    from doubletake_tpu.checkpoints.io import (
        lazy_load_params, load_params, save_params,
    )

    variables = {
        "params": {
            "a": {"kernel": np.zeros((3, 4), np.float32)},
            "b": {"kernel": np.zeros((2, 2), np.float32)},
            "c": {"bias": np.zeros((5,), np.float32)},
        },
        "batch_stats": {"a": {"mean": np.zeros((4,), np.float32)}},
    }
    ckpt = {
        "params": {
            "a": {"kernel": np.ones((3, 4), np.float32)},       # fits
            "b": {"kernel": np.ones((9, 9), np.float32)},       # wrong shape
            "zzz": {"kernel": np.ones((1,), np.float32)},       # unknown key
        },
        # batch_stats entirely absent
    }
    path = os.path.join(str(tmp_path), "ckpt.npz")
    save_params(path, ckpt)
    merged = lazy_load_params(variables, load_params(path))

    assert (merged["params"]["a"]["kernel"] == 1).all()          # loaded
    assert (merged["params"]["b"]["kernel"] == 0).all()          # kept init
    assert (merged["params"]["c"]["bias"] == 0).all()            # kept init
    assert (merged["batch_stats"]["a"]["mean"] == 0).all()       # kept init
    assert "zzz" not in merged["params"]
