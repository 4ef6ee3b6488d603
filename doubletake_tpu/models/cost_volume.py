"""Plane-sweep cost/feature volumes (JAX/Flax, NHWC, static shapes).

TPU-native reimplementation of the reference volume managers:
  * simple dot-product cost volume
    (reference: src/doubletake/modules/cost_volume.py:9-363);
  * metadata "feature volume" — per-plane warped features + geometric
    metadata (202 channels) reduced by an MLP [202,128,128,1]
    (reference: src/doubletake/modules/feature_volume.py:12-796);
  * mesh-hint volume — feature volume + a hint MLP [3,12,12,1] mixing the
    plane-sweep score with |hint_depth - plane_depth| and the sampled TSDF
    confidence (reference: src/doubletake/modules/mesh_hint_volume.py).

Design: everything is vectorized over depth planes (the reference's "fast"
einops path) but processed in static plane chunks so the (views x channels x
planes) warped tensor never fully materializes in HBM — each chunk is
warp -> metadata -> MLP -> 1 channel. XLA fuses the metadata assembly into
the first MLP matmul's operand; a fused Pallas kernel slots in behind the
same interface (doubletake_tpu/ops/pallas/).

Metadata channel order (must match the checkpoint MLP exactly; channel math
from feature_volume.py:49-67 and concat order from :768-785):
  [src_feats (k*c), cur_feats (c), mask (k), src depths (k), plane depth (1),
   dot (k), ray angle (k), rays ((1+k)*3, cur first), pose dist (k),
   R measure (k), t measure (k)]  -> 202 for k=7, c=16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from doubletake_tpu.models.layers import MLP
from doubletake_tpu.ops.grid_sample import grid_sample_2d
from doubletake_tpu.utils.geometry import (
    normalize_vectors,
    pixel_grid_homogeneous,
    pose_distance,
)

_PREC = jax.lax.Precision.HIGHEST


def generate_depth_planes(min_depth, max_depth, num_planes: int):
    """Log-spaced depth planes (reference cost_volume.py:96-130)."""
    ramp = jnp.linspace(0.0, 1.0, num_planes)
    return jnp.exp(jnp.log(min_depth) + jnp.log(max_depth / min_depth) * ramp)


def _warp_chunk(src_feats_bkhwc, planes_c, P_bk34, rays_b3n, h, w):
    """Warp all source views onto the current view for a chunk of planes.

    Args:
        src_feats_bkhwc: (B, k, H, W, C) source matching features.
        planes_c: (Dc,) plane depths for this chunk.
        P_bk34: (B, k, 3, 4) src_K @ src_cam_T_cur_cam projection rows.
        rays_b3n: (B, 3, N) invK-backprojected unit-depth pixel rays.
    Returns:
        warped (B, k, Dc, H, W, C), src depth (B, k, Dc, H, W),
        world points in cur frame (B, Dc, 3, N).
    """
    b, k, _, _, c = src_feats_bkhwc.shape
    dc = planes_c.shape[0]
    n = h * w

    # points at each plane, in the current camera's frame ("world")
    pts_bd3n = planes_c[None, :, None, None] * rays_b3n[:, None]

    # project into each source view: P[:, :3] @ [pts; 1]
    cam_bkd3n = (
        jnp.einsum("bkij,bdjn->bkdin", P_bk34[..., :3], pts_bd3n, precision=_PREC)
        + P_bk34[..., 3][:, :, None, :, None]
    )
    z_bkd1n = cam_bkd3n[:, :, :, 2:3] + 1e-8
    guard = jnp.abs(cam_bkd3n[:, :, :, 2:3]) > 1e-8
    scale = jnp.where(guard, 1.0 / z_bkd1n, jnp.ones_like(z_bkd1n))
    px_bkd2n = cam_bkd3n[:, :, :, :2] * scale

    gx = 2.0 * px_bkd2n[:, :, :, 0] / w - 1.0
    gy = 2.0 * px_bkd2n[:, :, :, 1] / h - 1.0
    grid = jnp.stack([gx, gy], axis=-1).reshape(b * k, dc * h, w, 2)

    warped = grid_sample_2d(
        src_feats_bkhwc.reshape(b * k, h, w, c), grid.astype(src_feats_bkhwc.dtype)
    ).reshape(b, k, dc, h, w, c)

    depths_bkdhw = z_bkd1n.reshape(b, k, dc, h, w)
    return warped, depths_bkdhw, pts_bd3n, px_bkd2n


def _projection_setup(src_K_bk44, src_cam_T_cur_cam_bk44, cur_invK_b44, h, w, dtype):
    P_bk44 = jnp.einsum(
        "bkij,bkjl->bkil", src_K_bk44, src_cam_T_cur_cam_bk44, precision=_PREC
    )
    pix = pixel_grid_homogeneous(h, w, dtype)
    rays_b3n = jnp.einsum(
        "bij,jn->bin", cur_invK_b44[:, :3, :3], pix, precision=_PREC
    )
    return P_bk44[:, :, :3, :], rays_b3n


def _border_mask(px_bk2hw, h, w):
    """2-px border validity (reference cost_volume.py:73-94)."""
    x, y = px_bk2hw[:, :, 0], px_bk2hw[:, :, 1]
    return (x > 2) & (x < w - 2) & (y > 2) & (y < h - 2)


class CostVolumeDot(nn.Module):
    """Masked dot-product cost volume summed over views (simple_cost_volume)."""

    num_depth_bins: int = 64
    plane_chunk: int = 16
    use_pallas: bool = False  # accepted for interface parity; dot volume has no kernel

    @nn.compact
    def __call__(
        self,
        cur_feats_bhwc,
        src_feats_bkhwc,
        src_cam_T_cur_cam_bk44,
        cur_cam_T_src_cam_bk44,
        src_K_bk44,
        cur_invK_b44,
        min_depth,
        max_depth,
        hint=None,
        return_mask: bool = False,
        train: bool = False,
    ):
        del hint, train
        b, h, w, c = cur_feats_bhwc.shape
        planes_d = generate_depth_planes(min_depth, max_depth, self.num_depth_bins)
        P_bk34, rays_b3n = _projection_setup(
            src_K_bk44, src_cam_T_cur_cam_bk44, cur_invK_b44, h, w, cur_feats_bhwc.dtype
        )

        chunks = []
        for s in range(0, self.num_depth_bins, self.plane_chunk):
            planes_c = jax.lax.dynamic_slice_in_dim(planes_d, s, self.plane_chunk)
            warped, depths, _, _ = _warp_chunk(
                src_feats_bkhwc, planes_c, P_bk34, rays_b3n, h, w
            )
            mask = (depths > 0).astype(warped.dtype)
            dot = jnp.einsum(
                "bkdhwc,bhwc->bkdhw", warped, cur_feats_bhwc, precision=_PREC
            ) * mask
            chunks.append(dot.sum(axis=1))  # (B, Dc, H, W)

        volume_bdhw = jnp.concatenate(chunks, axis=1)
        volume_bhwd = volume_bdhw.transpose(0, 2, 3, 1)
        lowest_cost_bhw = planes_d[jnp.argmax(volume_bhwd, axis=-1)]
        return volume_bhwd, lowest_cost_bhw, planes_d, None


class FeatureVolume(nn.Module):
    """Metadata MLP feature volume (mlp_feature_volume).

    Produces a (B, H, W, D) volume: one MLP score per pixel per depth plane.
    """

    num_depth_bins: int = 64
    mlp_hidden: int = 128
    plane_chunk: int = 16
    use_hint_mlp: bool = False
    use_pallas: bool = False  # route through the fused Pallas kernel (TPU only)

    def setup(self):
        # channel count is data-dependent (k, c) but the MLP is built lazily
        # by flax on first call; channel order documented in the module doc.
        self.mlp = MLP(
            channel_list=(-1, self.mlp_hidden, self.mlp_hidden, 1),
            disable_final_activation=True,
            name="mlp",
        )
        if self.use_hint_mlp:
            self.hint_mlp = MLP(
                channel_list=(-1, 12, 12, 1), disable_final_activation=True,
                name="hint_mlp",
            )

    def __call__(
        self,
        cur_feats_bhwc,
        src_feats_bkhwc,
        src_cam_T_cur_cam_bk44,
        cur_cam_T_src_cam_bk44,
        src_K_bk44,
        cur_invK_b44,
        min_depth,
        max_depth,
        hint=None,
        return_mask: bool = False,
        train: bool = False,
    ):
        """Build the feature volume.

        hint (only with use_hint_mlp): dict with
            "depth_hint_bhw1"        rendered hint depth (any resolution;
                                      nearest-resized here),
            "hint_mask_bhw1"         bool validity,
            "sampled_weights_bhw1"   TSDF confidence at the hint surface.
        Returns (volume_bhwd, lowest_cost_bhw, planes_d, overall_mask_bhw).
        """
        b, h, w, c = cur_feats_bhwc.shape
        k = src_feats_bkhwc.shape[1]
        dtype = cur_feats_bhwc.dtype

        planes_d = generate_depth_planes(min_depth, max_depth, self.num_depth_bins)
        P_bk34, rays_b3n = _projection_setup(
            src_K_bk44, src_cam_T_cur_cam_bk44, cur_invK_b44, h, w, dtype
        )

        # pose-distance metadata from cur_cam_T_src_cam (reference passes
        # src_poses = cur_cam_T_src_cam into pose_distance)
        pd, rm, tm = pose_distance(cur_cam_T_src_cam_bk44.reshape(b * k, 4, 4))
        pd_bk = pd.reshape(b, k).astype(dtype)
        rm_bk = rm.reshape(b, k).astype(dtype)
        tm_bk = tm.reshape(b, k).astype(dtype)
        pose_meta_b3k = jnp.concatenate([pd_bk, rm_bk, tm_bk], axis=-1)  # (B, 3k)

        # source camera centers in the current frame
        src_centers_bk3 = cur_cam_T_src_cam_bk44[:, :, :3, 3].astype(dtype)

        hint_depth = hint_weights = hint_valid = None
        if self.use_hint_mlp:
            from doubletake_tpu.ops.resize import interpolate_nearest

            hint_depth = interpolate_nearest(hint["depth_hint_bhw1"], (h, w))[..., 0]
            hint_valid = interpolate_nearest(
                hint["hint_mask_bhw1"].astype(jnp.float32), (h, w)
            )[..., 0].astype(bool)
            hint_weights = interpolate_nearest(hint["sampled_weights_bhw1"], (h, w))[..., 0]
            hint_weights = jnp.where(hint_valid, hint_weights, 0.0).astype(dtype)

        if (
            self.use_pallas
            and not train  # the kernel has no VJP; training uses XLA
            and not self.is_initializing()
            and jax.default_backend() == "tpu"
            and w == 128
            and c == 16
            and h % 8 == 0
        ):
            return self._fused_volume(
                cur_feats_bhwc, src_feats_bkhwc, src_cam_T_cur_cam_bk44,
                cur_cam_T_src_cam_bk44, src_K_bk44, cur_invK_b44,
                min_depth, max_depth, planes_d,
                hint_depth, hint_valid, hint_weights,
                P_bk34, rays_b3n, return_mask,
            )

        chunks = []
        overall_mask_bhw = None
        for s in range(0, self.num_depth_bins, self.plane_chunk):
            planes_c = jax.lax.dynamic_slice_in_dim(planes_d, s, self.plane_chunk)
            dc = planes_c.shape[0]
            warped, depths, pts_bd3n, px_bkd2n = _warp_chunk(
                src_feats_bkhwc, planes_c, P_bk34, rays_b3n, h, w
            )
            mask = (depths > 0).astype(dtype)  # (B, k, Dc, H, W)

            dot = jnp.einsum(
                "bkdhwc,bhwc->bkdhw", warped, cur_feats_bhwc, precision=_PREC
            ) * mask

            # rays (unit) from cur camera and from each src camera to the points
            cur_rays_bd3n = normalize_vectors(pts_bd3n, axis=2)
            src_rays_bkd3n = normalize_vectors(
                pts_bd3n[:, None] - src_centers_bk3[:, :, None, :, None], axis=3
            )
            ray_angle_bkdn = jnp.sum(cur_rays_bd3n[:, None] * src_rays_bkd3n, axis=3)

            # assemble MLP input (B, Dc, H, W, 202) — channel order in moduledoc
            def hw(x_bkdn):  # (B, k, Dc, N) -> (B, Dc, H, W, k)
                return x_bkdn.transpose(0, 2, 3, 1).reshape(b, dc, h, w, -1)

            vis_src = warped.transpose(0, 2, 3, 4, 1, 5).reshape(b, dc, h, w, k * c)
            vis_cur = jnp.broadcast_to(cur_feats_bhwc[:, None], (b, dc, h, w, c))
            mask_c = mask.transpose(0, 2, 3, 4, 1)
            depths_c = depths.transpose(0, 2, 3, 4, 1)
            plane_c = jnp.broadcast_to(
                planes_c[None, :, None, None, None].astype(dtype), (b, dc, h, w, 1)
            )
            dot_c = dot.transpose(0, 2, 3, 4, 1)
            angle_c = hw(ray_angle_bkdn.astype(dtype))
            rays_all = jnp.concatenate(
                [cur_rays_bd3n[:, None], src_rays_bkd3n], axis=1
            )  # (B, 1+k, Dc, 3, N)
            rays_c = (
                rays_all.transpose(0, 2, 4, 1, 3)
                .reshape(b, dc, h, w, (1 + k) * 3)
                .astype(dtype)
            )
            pose_c = jnp.broadcast_to(
                pose_meta_b3k[:, None, None, None, :], (b, dc, h, w, 3 * k)
            )

            mlp_in = jnp.concatenate(
                [vis_src, vis_cur, mask_c, depths_c, plane_c, dot_c, angle_c, rays_c, pose_c],
                axis=-1,
            )
            score = self.mlp(mlp_in)[..., 0]  # (B, Dc, H, W)

            if self.use_hint_mlp:
                # |hint - plane| with -1 where the hint is invalid
                diff = jnp.abs(hint_depth[:, None] - planes_c[None, :, None, None]).astype(dtype)
                diff = jnp.where(hint_valid[:, None], diff, -1.0)
                wts = jnp.broadcast_to(hint_weights[:, None], (b, dc, h, w))
                hint_in = jnp.stack([score, diff, wts], axis=-1)
                score = self.hint_mlp(hint_in)[..., 0]

            chunks.append(score)

            if return_mask and s + self.plane_chunk >= self.num_depth_bins:
                # validity at the LAST plane: any view with positive depth and
                # inside the 2px border (feature_volume.py:709-713)
                depth_ok = depths[:, :, -1] > 0  # (B, k, H, W)
                border_ok = _border_mask(
                    px_bkd2n[:, :, -1].reshape(b, k, 2, h, w), h, w
                )
                overall_mask_bhw = jnp.any(depth_ok & border_ok, axis=1)

        volume_bdhw = jnp.concatenate(chunks, axis=1)
        volume_bhwd = volume_bdhw.transpose(0, 2, 3, 1)
        lowest_cost_bhw = planes_d[jnp.argmax(volume_bhwd, axis=-1)]
        return volume_bhwd, lowest_cost_bhw, planes_d, overall_mask_bhw

    def _fused_volume(
        self, cur_feats_bhwc, src_feats_bkhwc, src_cam_T_cur_cam_bk44,
        cur_cam_T_src_cam_bk44, src_K_bk44, cur_invK_b44,
        min_depth, max_depth, planes_d,
        hint_depth, hint_valid, hint_weights,
        P_bk34, rays_b3n, return_mask,
    ):
        """Inference fast path: route through the fused Pallas kernel.

        Numerics: bf16 matmul operands inside the kernel bound parity with
        the XLA path at ~1e-3 mean / 5e-3 p99 on O(1) scores (validated by
        tests/test_fused_volume.py and on-TPU parity checks). Inference
        only — the kernel has no VJP; training always takes the XLA path.
        Batched: one pallas call with the batch as a grid dimension (the
        reference capability analog: arbitrary-batch fast path,
        feature_volume.py:588-796).
        """
        from doubletake_tpu.ops.pallas.fused_volume import (
            fused_feature_volume, pad_mlp_weights,
        )

        b, h, w, _ = cur_feats_bhwc.shape
        k = src_feats_bkhwc.shape[1]
        mlp_params = self.mlp.variables["params"]
        hint_params = (
            self.hint_mlp.variables["params"] if self.use_hint_mlp else None
        )
        weights = pad_mlp_weights(mlp_params, hint_params)

        hint_bhw3 = None
        if self.use_hint_mlp:
            hint_bhw3 = jnp.stack(
                [
                    hint_depth.astype(jnp.float32),
                    hint_valid.astype(jnp.float32),
                    hint_weights.astype(jnp.float32),
                ],
                axis=-1,
            )
        volume_bdhw, _ = fused_feature_volume(
            cur_feats_bhwc,
            src_feats_bkhwc,
            src_cam_T_cur_cam_bk44,
            cur_cam_T_src_cam_bk44,
            src_K_bk44,
            cur_invK_b44,
            min_depth,
            max_depth,
            weights,
            hint_bhw3=hint_bhw3,
            num_depth_bins=self.num_depth_bins,
            use_hint=self.use_hint_mlp,
            # Pallas has no CPU lowering: on the CPU test/dev platform the
            # kernel runs in interpreter mode so the full-model fast path is
            # exercisable off-hardware (tests/test_e2e_gate.py mirrors the
            # bench.py hardware parity gate this way).
            interpret=jax.default_backend() == "cpu",
        )

        volume_bhwd = volume_bdhw.transpose(0, 2, 3, 1)
        volume_bhwd = volume_bhwd.astype(cur_feats_bhwc.dtype)
        lowest_cost_bhw = planes_d[jnp.argmax(volume_bhwd, axis=-1)]

        overall_mask_bhw = None
        if return_mask:
            # validity at the LAST plane (feature_volume.py:709-713): any
            # view with positive projected depth inside the 2px border
            pts_b3n = planes_d[-1] * rays_b3n
            cam = (
                jnp.einsum(
                    "bkij,bjn->bkin", P_bk34[..., :3], pts_b3n, precision=_PREC
                )
                + P_bk34[..., 3][:, :, :, None]
            )
            z = cam[:, :, 2]
            guard = jnp.abs(z) > 1e-8
            px = cam[:, :, :2] / jnp.where(guard, z, 1.0)[:, :, None]
            ok = _border_mask(px.reshape(b, k, 2, h, w), h, w)
            depth_ok = z.reshape(b, k, h, w) > 0
            overall_mask_bhw = jnp.any(ok & depth_ok, axis=1)

        return volume_bhwd, lowest_cost_bhw, planes_d, overall_mask_bhw


class FeatureMeshHintVolume(FeatureVolume):
    """Feature volume + hint MLP (mlp_mesh_hint_feature_volume)."""

    use_hint_mlp: bool = True


def get_volume_class(feature_volume_type: str):
    return {
        "simple_cost_volume": CostVolumeDot,
        "mlp_feature_volume": FeatureVolume,
        "mlp_mesh_hint_feature_volume": FeatureMeshHintVolume,
    }[feature_volume_type]
