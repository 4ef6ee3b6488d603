"""Parity tests for plane-sweep volumes vs a torch slow-path fixture.

The torch fixture below re-derives the documented reference behavior
(per-plane backproject -> project -> grid_sample -> metadata concat -> MLP)
independently and shares the MLP weights with the flax module, validating
the vectorized/chunked JAX implementation end to end, including the 202-ch
metadata ordering.
"""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from doubletake_tpu.models.cost_volume import (
    CostVolumeDot,
    FeatureMeshHintVolume,
    FeatureVolume,
    generate_depth_planes,
)

B, K, C, H, W, D = 1, 3, 4, 8, 12, 8
MIN_D, MAX_D = 0.25, 5.0


def make_K(fx, fy, cx, cy):
    Km = np.eye(4, dtype=np.float32)
    Km[0, 0], Km[1, 1], Km[0, 2], Km[1, 2] = fx, fy, cx, cy
    return Km


def small_pose(rng, scale=0.1):
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


def torch_warp_plane(src_feats, src_T_cur, src_Ks, cur_invK, depth):
    """Warp all src views at one fronto-parallel depth plane (torch)."""
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    pix = np.stack([xs + 0.5, ys + 0.5, np.ones_like(xs)], 0).reshape(3, -1)
    pts = cur_invK[0, :3, :3] @ pix * depth  # (3, N)
    pts_h = np.concatenate([pts, np.ones((1, pts.shape[1]))], 0)

    warped, depths, pxs = [], [], []
    for k in range(K):
        P = src_Ks[0, k] @ src_T_cur[0, k]
        cam = P[:3] @ pts_h
        z = cam[2:] + 1e-8
        scale = np.where(np.abs(cam[2:]) > 1e-8, 1.0 / z, 1.0)
        px = cam[:2] * scale
        gx = 2 * px[0] / W - 1
        gy = 2 * px[1] / H - 1
        grid = torch.from_numpy(
            np.stack([gx, gy], -1).reshape(1, H, W, 2).astype(np.float32)
        )
        f = torch.from_numpy(src_feats[0, k]).permute(2, 0, 1)[None]
        wf = F.grid_sample(f, grid, mode="bilinear", padding_mode="zeros", align_corners=False)
        warped.append(wf[0].permute(1, 2, 0).numpy())
        depths.append(z.reshape(H, W))
        pxs.append(px.reshape(2, H, W))
    return np.stack(warped), np.stack(depths), pts, np.stack(pxs)


def test_dot_cost_volume_matches_fixture():
    cur_feats, src_feats, src_T_cur, cur_T_src, src_Ks, cur_invK = fixture_inputs()
    model = CostVolumeDot(num_depth_bins=D, plane_chunk=4)
    params = model.init(jax.random.PRNGKey(0), *map(jnp.asarray, (
        cur_feats, src_feats, src_T_cur, cur_T_src, src_Ks, cur_invK)), MIN_D, MAX_D)
    vol, lowest, planes, _ = model.apply(params, *map(jnp.asarray, (
        cur_feats, src_feats, src_T_cur, cur_T_src, src_Ks, cur_invK)), MIN_D, MAX_D)

    planes_np = np.exp(np.log(MIN_D) + np.log(MAX_D / MIN_D) * np.linspace(0, 1, D))
    np.testing.assert_allclose(np.asarray(planes), planes_np, rtol=1e-4)
    planes_np = np.asarray(planes)  # use the model's fp32 planes downstream

    for d_idx in [0, 3, D - 1]:
        warped, depths, _, _ = torch_warp_plane(
            src_feats, src_T_cur, src_Ks, cur_invK, planes_np[d_idx]
        )
        mask = (depths > 0).astype(np.float32)
        dot = (warped * cur_feats[0][None]).sum(-1) * mask
        ref = dot.sum(0)
        np.testing.assert_allclose(
            np.asarray(vol)[0, :, :, d_idx], ref, rtol=1e-3, atol=1e-4
        )


def _flax_mlp_to_torch(params_subtree, channel_list):
    layers = []
    for i in range(len(channel_list) - 1):
        lin = torch.nn.Linear(1, 1)
        kern = np.asarray(params_subtree[f"linear_{i}"]["kernel"])
        bias = np.asarray(params_subtree[f"linear_{i}"]["bias"])
        lin.weight = torch.nn.Parameter(torch.from_numpy(kern.T.copy()))
        lin.bias = torch.nn.Parameter(torch.from_numpy(bias.copy()))
        layers.append(lin)
    return layers


def _torch_metadata_volume(params, cur_feats, src_feats, src_T_cur, cur_T_src,
                           src_Ks, cur_invK, hint=None):
    """Slow-path torch fixture for the 202-ch metadata volume (+hint MLP)."""
    mlp = _flax_mlp_to_torch(params["params"]["mlp"], [0, 128, 128, 1])
    hint_mlp = None
    if hint is not None:
        hint_mlp = _flax_mlp_to_torch(params["params"]["hint_mlp"], [0, 12, 12, 1])

    planes_np = np.asarray(generate_depth_planes(MIN_D, MAX_D, D))

    # pose metadata
    pose_meta = []
    for k in range(K):
        Rt = cur_T_src[0, k]
        tr = np.trace(Rt[:3, :3])
        rm = np.sqrt(2 * (1 - min(3.0, tr) / 3))
        tm = np.linalg.norm(Rt[:3, 3])
        pose_meta.append((np.sqrt(rm**2 + tm**2), rm, tm))
    pose_meta = np.array(pose_meta, dtype=np.float32)  # (K, 3)

    vol = np.zeros((D, H, W), np.float32)
    for d_idx in range(D):
        depth = planes_np[d_idx]
        warped, depths, pts, _ = torch_warp_plane(
            src_feats, src_T_cur, src_Ks, cur_invK, depth
        )
        mask = (depths > 0).astype(np.float32)
        dot = (warped * cur_feats[0][None]).sum(-1) * mask

        def normalize(v, axis):
            return v / np.maximum(np.linalg.norm(v, axis=axis, keepdims=True), 1e-12)

        cur_rays = normalize(pts, 0).reshape(3, H, W)
        src_rays, angles = [], []
        for k in range(K):
            center = cur_T_src[0, k, :3, 3]
            r = normalize(pts - center[:, None], 0).reshape(3, H, W)
            src_rays.append(r)
            angles.append((cur_rays * r).sum(0))

        chans = []
        for k in range(K):
            chans.append(warped[k])  # (H, W, C)
        chans.append(cur_feats[0])
        chans.append(mask.transpose(1, 2, 0))
        chans.append(depths.transpose(1, 2, 0))
        chans.append(np.full((H, W, 1), depth, np.float32))
        chans.append(dot.transpose(1, 2, 0))
        chans.append(np.stack(angles, -1))
        chans.append(cur_rays.transpose(1, 2, 0))
        for k in range(K):
            chans.append(src_rays[k].transpose(1, 2, 0))
        for m in range(3):
            chans.append(np.broadcast_to(pose_meta[:, m], (H, W, K)))
        x = torch.from_numpy(np.concatenate([c.astype(np.float32) for c in chans], -1))

        for li, lin in enumerate(mlp):
            x = lin(x)
            if li < len(mlp) - 1:
                x = F.leaky_relu(x, 0.01)
        score = x[..., 0]

        if hint is not None:
            hd, hm, hw_ = hint
            diff = np.abs(hd - depth)
            diff = np.where(hm, diff, -1.0).astype(np.float32)
            wts = np.where(hm, hw_, 0.0).astype(np.float32)
            hx = torch.stack(
                [score, torch.from_numpy(diff), torch.from_numpy(wts)], -1
            )
            for li, lin in enumerate(hint_mlp):
                hx = lin(hx)
                if li < len(hint_mlp) - 1:
                    hx = F.leaky_relu(hx, 0.01)
            score = hx[..., 0]

        vol[d_idx] = score.detach().numpy()
    return vol


def test_feature_volume_matches_torch_slow_path():
    cur_feats, src_feats, src_T_cur, cur_T_src, src_Ks, cur_invK = fixture_inputs()
    model = FeatureVolume(num_depth_bins=D, plane_chunk=4)
    args = tuple(map(jnp.asarray, (cur_feats, src_feats, src_T_cur, cur_T_src, src_Ks, cur_invK)))
    params = model.init(jax.random.PRNGKey(1), *args, MIN_D, MAX_D)
    vol, lowest, planes, mask = model.apply(params, *args, MIN_D, MAX_D, return_mask=True)

    ref = _torch_metadata_volume(
        params, cur_feats, src_feats, src_T_cur, cur_T_src, src_Ks, cur_invK
    )
    np.testing.assert_allclose(
        np.asarray(vol)[0].transpose(2, 0, 1), ref, rtol=1e-3, atol=1e-4
    )
    assert mask.shape == (B, H, W)
    # lowest_cost is the argmax plane depth
    am = np.argmax(np.asarray(vol)[0], axis=-1)
    np.testing.assert_allclose(np.asarray(lowest)[0], np.asarray(planes)[am], rtol=1e-6)


def test_hint_volume_matches_torch_slow_path():
    cur_feats, src_feats, src_T_cur, cur_T_src, src_Ks, cur_invK = fixture_inputs(seed=7)
    rng = np.random.RandomState(8)
    hint_depth = (rng.rand(B, H, W, 1).astype(np.float32) + 0.3) * 2
    hint_mask = rng.rand(B, H, W, 1) > 0.4
    hint_weights = rng.rand(B, H, W, 1).astype(np.float32)
    hint = {
        "depth_hint_bhw1": jnp.asarray(hint_depth),
        "hint_mask_bhw1": jnp.asarray(hint_mask),
        "sampled_weights_bhw1": jnp.asarray(hint_weights),
    }
    model = FeatureMeshHintVolume(num_depth_bins=D, plane_chunk=4)
    args = tuple(map(jnp.asarray, (cur_feats, src_feats, src_T_cur, cur_T_src, src_Ks, cur_invK)))
    params = model.init(jax.random.PRNGKey(2), *args, MIN_D, MAX_D, hint=hint)
    vol, _, _, _ = model.apply(params, *args, MIN_D, MAX_D, hint=hint)

    ref = _torch_metadata_volume(
        params, cur_feats, src_feats, src_T_cur, cur_T_src, src_Ks, cur_invK,
        hint=(hint_depth[0, :, :, 0], hint_mask[0, :, :, 0], hint_weights[0, :, :, 0]),
    )
    np.testing.assert_allclose(
        np.asarray(vol)[0].transpose(2, 0, 1), ref, rtol=1e-3, atol=1e-4
    )
