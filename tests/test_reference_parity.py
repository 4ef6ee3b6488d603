"""Parity vs the reference's OWN torch modules (/root/reference/src).

These tests import the actual reference implementation (torch) and run it
side-by-side with the JAX paths on identical inputs with shared weights —
certifying the 202-channel metadata order, hint semantics, and loss math
against the real code rather than hand-rebuilt fixtures (the upgrade asked
for by VERDICT.md round 1, item 4).

kornia is not installed in this environment; the reference only calls it
inside NormalGenerator / MSGradientLoss, which these tests do not touch, so
an import-only stub suffices.
"""

import sys
import types

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

REF = "/root/reference/src"


def _install_ref():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    def _unused(*a, **k):  # pragma: no cover
        raise RuntimeError("stubbed module: function not available")

    def blur_pool2d(input: torch.Tensor, kernel_size: int) -> torch.Tensor:
        # kornia blur_pool2d, k=3: pascal kernel [[1,2,1],[2,4,2],[1,2,1]]/16,
        # reflect pad, depthwise conv stride 2 (must be scriptable: the
        # reference's pyrdown is @torch.jit.script and inlines this)
        k1 = torch.tensor([1.0, 2.0, 1.0], device=input.device)
        k2 = (k1.unsqueeze(1) * k1.unsqueeze(0)) / 16.0
        c = input.shape[1]
        w = k2.expand(c, 1, 3, 3).contiguous()
        padded = torch.nn.functional.pad(input, [1, 1, 1, 1], mode="reflect")
        return torch.nn.functional.conv2d(padded, w, stride=2, groups=c)

    if "kornia" not in sys.modules:
        kornia = types.ModuleType("kornia")
        kornia.filters = types.ModuleType("kornia.filters")
        kornia.filters.gaussian_blur2d = _unused
        kornia.filters.spatial_gradient = _unused
        kornia.filters.blur_pool2d = blur_pool2d
        sys.modules["kornia"] = kornia
        sys.modules["kornia.filters"] = kornia.filters
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        for sub in ("transforms", "transforms.functional", "models", "ops"):
            mod = types.ModuleType(f"torchvision.{sub}")
            mod.__getattr__ = lambda name: _unused
            sys.modules[f"torchvision.{sub}"] = mod
            parent, _, leaf = f"torchvision.{sub}".rpartition(".")
            setattr(sys.modules[parent] if parent != "torchvision" else tv,
                    leaf, mod)
        sys.modules["torchvision"] = tv
    for name in ("antialiased_cnns", "timm"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            mod.__getattr__ = lambda attr: _unused
            sys.modules[name] = mod


_install_ref()

from doubletake.modules.cost_volume import CostVolumeManager  # noqa: E402
from doubletake.modules.feature_volume import FeatureVolumeManager  # noqa: E402
from doubletake.modules.mesh_hint_volume import (  # noqa: E402
    FeatureMeshHintVolumeManager,
)
from doubletake import losses as ref_losses  # noqa: E402

from doubletake_tpu import losses as jax_losses  # noqa: E402
from doubletake_tpu.models.cost_volume import (  # noqa: E402
    CostVolumeDot,
    FeatureMeshHintVolume,
    FeatureVolume,
)

B, K, C, H, W, D = 1, 3, 4, 8, 12, 8
MIN_D, MAX_D = 0.5, 5.0


def make_K(fx, fy, cx, cy):
    Km = np.eye(4, dtype=np.float32)
    Km[0, 0], Km[1, 1], Km[0, 2], Km[1, 2] = fx, fy, cx, cy
    return Km


def small_pose(rng, scale=0.08):
    angle = rng.randn(3) * scale
    cx, cy, cz = np.cos(angle)
    sx, sy, sz = np.sin(angle)
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = (Rz @ Ry @ Rx).astype(np.float32)
    T[:3, 3] = rng.randn(3).astype(np.float32) * scale
    return T


def fixture_inputs(seed=0):
    rng = np.random.RandomState(seed)
    cur_feats = rng.randn(B, H, W, C).astype(np.float32)
    src_feats = rng.randn(B, K, H, W, C).astype(np.float32)
    Km = make_K(10.0, 10.0, W / 2, H / 2)
    src_T_cur = np.stack([small_pose(rng) for _ in range(K)])[None]
    cur_T_src = np.linalg.inv(src_T_cur).astype(np.float32)
    src_Ks = np.broadcast_to(Km, (B, K, 4, 4)).copy()
    cur_invK = np.linalg.inv(Km)[None].astype(np.float32)
    return cur_feats, src_feats, src_T_cur, cur_T_src, src_Ks, cur_invK


def torch_args(cur_feats, src_feats, src_T_cur, cur_T_src, src_Ks, cur_invK):
    """NHWC numpy fixture -> the reference's BCHW torch calling convention."""
    return dict(
        cur_feats=torch.from_numpy(cur_feats).permute(0, 3, 1, 2).contiguous(),
        src_feats=torch.from_numpy(src_feats).permute(0, 1, 4, 2, 3).contiguous(),
        src_extrinsics=torch.from_numpy(src_T_cur),
        src_poses=torch.from_numpy(cur_T_src),
        src_Ks=torch.from_numpy(src_Ks),
        cur_invK=torch.from_numpy(cur_invK),
        min_depth=torch.tensor(MIN_D),
        max_depth=torch.tensor(MAX_D),
    )


def jax_args(cur_feats, src_feats, src_T_cur, cur_T_src, src_Ks, cur_invK):
    return (
        jnp.asarray(cur_feats), jnp.asarray(src_feats), jnp.asarray(src_T_cur),
        jnp.asarray(cur_T_src), jnp.asarray(src_Ks), jnp.asarray(cur_invK),
    )


def copy_mlp_to_flax(torch_mlp, flax_mlp_params):
    """torch MLP (Sequential of Linear/LeakyReLU) -> flax MLP param dict."""
    out = dict(flax_mlp_params)
    linears = [m for m in torch_mlp.net if isinstance(m, torch.nn.Linear)]
    for i, lin in enumerate(linears):
        out[f"linear_{i}"] = {
            "kernel": jnp.asarray(lin.weight.detach().numpy().T),
            "bias": jnp.asarray(lin.bias.detach().numpy()),
        }
    return out


@torch.no_grad()
def test_dot_cost_volume_matches_reference():
    fx = fixture_inputs()
    ref = CostVolumeManager(H, W, num_depth_bins=D)
    tvol, tlow, tplanes, _ = ref(**torch_args(*fx), return_mask=False)

    model = CostVolumeDot(num_depth_bins=D, plane_chunk=4)
    ja = jax_args(*fx)
    params = model.init(jax.random.PRNGKey(0), *ja, MIN_D, MAX_D)
    jvol, jlow, jplanes, _ = model.apply(params, *ja, MIN_D, MAX_D)

    np.testing.assert_allclose(
        np.asarray(jplanes), tplanes[0, :, 0, 0].numpy(), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(jvol).transpose(0, 3, 1, 2), tvol.numpy(), atol=2e-4
    )
    np.testing.assert_allclose(np.asarray(jlow), tlow.numpy(), atol=1e-5)


@torch.no_grad()
def test_feature_volume_matches_reference():
    fx = fixture_inputs(1)
    ref = FeatureVolumeManager(
        H, W, num_depth_bins=D, mlp_channels=[0, 16, 16, 1],
        matching_dim_size=C, num_source_views=K,
    )
    tvol, tlow, _, tmask = ref(**torch_args(*fx), return_mask=True)

    model = FeatureVolume(num_depth_bins=D, mlp_hidden=16, plane_chunk=4)
    ja = jax_args(*fx)
    params = model.init(jax.random.PRNGKey(0), *ja, MIN_D, MAX_D)
    p = dict(params["params"])
    p["mlp"] = copy_mlp_to_flax(ref.mlp, p["mlp"])
    jvol, jlow, _, jmask = model.apply({"params": p}, *ja, MIN_D, MAX_D,
                                       return_mask=True)

    np.testing.assert_allclose(
        np.asarray(jvol).transpose(0, 3, 1, 2), tvol.numpy(), atol=5e-4
    )
    np.testing.assert_allclose(np.asarray(jlow), tlow.numpy(), atol=1e-5)
    assert (np.asarray(jmask) == tmask.numpy()).all()


@torch.no_grad()
def test_mesh_hint_volume_matches_reference():
    fx = fixture_inputs(2)
    rng = np.random.RandomState(3)
    # hint maps at 2x resolution: also certifies the nearest-resize parity
    hh, hw = 2 * H, 2 * W
    hint_depth = rng.uniform(MIN_D, MAX_D, (B, 1, hh, hw)).astype(np.float32)
    hint_mask = (rng.rand(B, 1, hh, hw) > 0.4).astype(np.float32)
    hint_depth[hint_mask == 0] = np.nan  # invalid coded NaN (test_incremental.py:216)
    hint_wts = rng.rand(B, 1, hh, hw).astype(np.float32)

    ref = FeatureMeshHintVolumeManager(
        H, W, num_depth_bins=D, mlp_channels=[0, 16, 16, 1],
        matching_dim_size=C, num_source_views=K,
    )
    tvol, tlow, _, _ = ref(
        **torch_args(*fx),
        cv_depth_hint_dict={
            "depth_hint_b1hw": torch.from_numpy(hint_depth),
            "depth_hint_mask_b1hw": torch.from_numpy(hint_mask),
            "sampled_weights_b1hw": torch.from_numpy(hint_wts),
        },
    )

    model = FeatureMeshHintVolume(num_depth_bins=D, mlp_hidden=16, plane_chunk=4)
    ja = jax_args(*fx)
    hint = {
        "depth_hint_bhw1": jnp.asarray(hint_depth.transpose(0, 2, 3, 1)),
        "hint_mask_bhw1": jnp.asarray(hint_mask.transpose(0, 2, 3, 1) > 0.5),
        "sampled_weights_bhw1": jnp.asarray(hint_wts.transpose(0, 2, 3, 1)),
    }
    params = model.init(jax.random.PRNGKey(0), *ja, MIN_D, MAX_D, hint=hint)
    p = dict(params["params"])
    p["mlp"] = copy_mlp_to_flax(ref.mlp, p["mlp"])
    p["hint_mlp"] = copy_mlp_to_flax(ref.hint_mlp, p["hint_mlp"])
    jvol, jlow, _, _ = model.apply({"params": p}, *ja, MIN_D, MAX_D, hint=hint)

    np.testing.assert_allclose(
        np.asarray(jvol).transpose(0, 3, 1, 2), tvol.numpy(), atol=5e-4
    )
    np.testing.assert_allclose(np.asarray(jlow), tlow.numpy(), atol=1e-5)


@torch.no_grad()
def test_scale_invariant_loss_matches_reference():
    rng = np.random.RandomState(0)
    gt = rng.uniform(0.5, 4.0, (2, 1, H, W)).astype(np.float32)
    pred = rng.uniform(0.5, 4.0, (2, 1, H, W)).astype(np.float32)
    t = ref_losses.ScaleInvariantLoss()(
        torch.from_numpy(np.log(gt)), torch.from_numpy(np.log(pred))
    )
    j = jax_losses.scale_invariant_loss(
        jnp.log(jnp.asarray(gt)), jnp.log(jnp.asarray(pred)),
        jnp.ones_like(jnp.asarray(gt), bool),
    )
    np.testing.assert_allclose(float(j), float(t), rtol=1e-5)


@torch.no_grad()
def test_normals_loss_matches_reference():
    rng = np.random.RandomState(1)
    def unit(x):
        return x / np.linalg.norm(x, axis=1, keepdims=True)
    gt = unit(rng.randn(2, 3, H, W)).astype(np.float32)
    pred = unit(rng.randn(2, 3, H, W)).astype(np.float32)
    gt[0, :, 0, 0] = np.nan  # invalid normals masked
    t = ref_losses.NormalsLoss()(torch.from_numpy(gt), torch.from_numpy(pred))
    j = jax_losses.normals_loss(
        jnp.asarray(gt.transpose(0, 2, 3, 1)), jnp.asarray(pred.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(float(j), float(t), rtol=1e-5)


@torch.no_grad()
def test_mv_depth_loss_matches_reference():
    rng = np.random.RandomState(2)
    fx = fixture_inputs(4)
    _, _, src_T_cur, cur_T_src, src_Ks, cur_invK = fx
    Km = np.linalg.inv(cur_invK[0]).astype(np.float32)

    pred = rng.uniform(1.0, 3.0, (B, 1, H, W)).astype(np.float32)
    gt = rng.uniform(1.0, 3.0, (B, 1, H, W)).astype(np.float32)
    src_depth = rng.uniform(1.0, 3.0, (B, K, 1, H, W)).astype(np.float32)
    src_depth[0, 0, 0, :2] = np.nan  # missing src GT must not poison the loss

    world_T_cam = np.eye(4, dtype=np.float32)[None]
    # src cam_T_world = src_cam_T_cur_cam (cur cam == world here)
    t = ref_losses.MVDepthLoss(H, W)(
        torch.from_numpy(pred), torch.from_numpy(gt), torch.from_numpy(src_depth),
        torch.from_numpy(cur_invK), torch.from_numpy(src_Ks),
        torch.from_numpy(world_T_cam), torch.from_numpy(src_T_cur),
    )
    j = jax_losses.mv_depth_loss(
        jnp.asarray(pred.transpose(0, 2, 3, 1)),
        jnp.asarray(gt.transpose(0, 2, 3, 1)),
        jnp.asarray(src_depth.transpose(0, 1, 3, 4, 2)),
        jnp.asarray(cur_invK), jnp.asarray(src_Ks),
        jnp.asarray(world_T_cam), jnp.asarray(src_T_cur),
    )
    np.testing.assert_allclose(float(j), float(t), rtol=1e-4)


@torch.no_grad()
def test_depth_metrics_match_reference():
    """Depth metric math vs the reference's own metrics_utils (valid-masked
    batched variant vs their NaN-trick batched path)."""
    from doubletake.utils import metrics_utils as ref_metrics

    from doubletake_tpu.utils.metrics import compute_depth_metrics_batched

    rng = np.random.RandomState(0)
    gt = rng.uniform(0.6, 4.0, (2, 500)).astype(np.float32)
    pred = rng.uniform(0.6, 4.0, (2, 500)).astype(np.float32)
    valid = rng.rand(2, 500) > 0.3

    ours = compute_depth_metrics_batched(
        jnp.asarray(gt), jnp.asarray(pred), jnp.asarray(valid), mult_a=True
    )
    for b in range(2):
        tgt = torch.from_numpy(gt[b][valid[b]])
        tpred = torch.from_numpy(pred[b][valid[b]])
        ref = ref_metrics.compute_depth_metrics(tgt, tpred, mult_a=True)
        for key, val in ref.items():
            mine = float(np.asarray(ours[key])[b])
            np.testing.assert_allclose(
                mine, float(val), rtol=2e-4, err_msg=f"{key} (batch {b})"
            )
