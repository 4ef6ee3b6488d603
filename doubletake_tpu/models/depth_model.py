"""Full depth-estimation models (Flax linen, NHWC).

Composition parity with the reference experiment modules:
  * ``DepthModel``        — SimpleRecon (reference:
    src/doubletake/experiment_modules/sr_depth_model.py:38-435);
  * ``DepthModelCVHint``  — DoubleTake, same skeleton with the mesh-hint
    volume and a hint dict input (reference:
    src/doubletake/experiment_modules/doubletake_model.py:265-425).

Differences by design (TPU-native):
  * NHWC everywhere; data dicts use *_bhw3 / *_bhw1 names.
  * The torch "unbatched matching encoder" test path existed to dodge batch-
    dependent batchnorm nondeterminism; JAX inference BN uses running stats,
    so batched == unbatched and no special path is needed.
  * Horizontal-flip train augmentation is a static ``flip`` argument: images
    are flipped for the encoders, matching features are flipped back for MVS,
    and the cost volume output is re-flipped so it aligns with the flipped
    image-prior features (sr_depth_model.py:275-435 ordering).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from doubletake_tpu.models.backbones import (
    encoder_feature_channels,
    get_image_encoder,
    get_matching_encoder,
)
from doubletake_tpu.models.cost_volume import get_volume_class
from doubletake_tpu.models.decoders import CVEncoder, DepthDecoderPP, SkipDecoderRegression


def _maybe_flip(x, flip, axis: int):
    """Horizontal flip under a static bool OR a traced scalar bool.

    Traced flips (training: per-batch coin, sr_depth_model.py:351-359) cost
    one reverse + select — cheap next to the conv stack — and keep the train
    step a single compiled program instead of a lax.cond double-compile.
    """
    if isinstance(flip, bool):
        return jnp.flip(x, axis) if flip else x
    return jnp.where(flip, jnp.flip(x, axis), x)


class DepthModel(nn.Module):
    """SimpleRecon-style MVS depth model.

    Config mirrors the reference Options fields of the same names.
    """

    image_encoder_name: str = "efficientnet"
    depth_decoder_name: str = "unet_pp"
    feature_volume_type: str = "mlp_feature_volume"
    matching_encoder_type: str = "resnet"
    matching_scale: int = 1
    matching_num_depth_bins: int = 64
    matching_feature_dims: int = 16
    model_num_views: int = 8
    min_matching_depth: float = 0.25
    max_matching_depth: float = 5.0
    plane_chunk: int = 16
    fast_cost_volume: bool = False
    # "bfloat16" runs the conv/matmul stacks in bf16 (images cast here,
    # params cast at load — runners/common._maybe_cast). Outputs are always
    # fp32. Analogue of the reference's fp16 inference (train.py:321).
    compute_dtype: str = "float32"

    def setup(self):
        self.encoder = get_image_encoder(self.image_encoder_name)
        self.matching_model = get_matching_encoder(
            self.matching_encoder_type, self.matching_feature_dims
        )
        self.cost_volume = get_volume_class(self.feature_volume_type)(
            num_depth_bins=self.matching_num_depth_bins,
            plane_chunk=self.plane_chunk,
            use_pallas=self.fast_cost_volume,
        )
        self.cost_volume_net = CVEncoder(num_ch_outs=(64, 128, 256, 384))
        if self.depth_decoder_name == "unet_pp":
            self.depth_decoder = DepthDecoderPP()
        elif self.depth_decoder_name == "skip":
            self.depth_decoder = SkipDecoderRegression()
        else:
            raise ValueError(f"Unknown decoder {self.depth_decoder_name}")

    def encode_frame(self, image_bhw3, train: bool = False):
        """Image-only encoders for one (batch of) frame(s): the image-prior
        encoder pyramid and the matching features.

        Neither depends on poses, src views, or the hint, so a sequential
        pipeline (incremental/offline runners, bench.py) can hoist them out
        of the frame->frame dependency chain and run them BATCHED over a
        group of upcoming frames — image-only work is where most of the
        non-CV forward time goes, and batching recovers MXU utilization the
        b=1 serial chain leaves on the table. Feed the results back through
        ``__call__(cur_feats=..., cur_matching_feats=...)``; reuse is
        bit-identical because inference BN uses running stats.
        """
        img = image_bhw3.astype(jnp.dtype(self.compute_dtype))
        return (
            tuple(self.encoder(img, train=train)),
            self.matching_model(img, train=train),
        )

    def __call__(
        self,
        cur_data: Dict[str, Any],
        src_data: Dict[str, Any],
        train: bool = False,
        flip: bool = False,
        return_mask: bool = False,
        hint: Optional[Dict[str, Any]] = None,
        src_matching_feats: Optional[Any] = None,
        cur_feats: Optional[Any] = None,
        cur_matching_feats: Optional[Any] = None,
        stop_after: Optional[str] = None,
    ):
        """Forward pass.

        cur_data: dict with "image_bhw3", "cam_T_world_b44", "world_T_cam_b44",
            f"invK_s{matching_scale}_b44".
        src_data: dict with "image_bkhw3" (B, k, H, W, 3), "cam_T_world_bk44",
            "world_T_cam_bk44", f"K_s{matching_scale}_bk44".
        src_matching_feats: optional (B, k, H/4, W/4, C) precomputed matching
            features for the src views, in the SAME view order as src_data
            (the 202-ch volume MLP is view-order-sensitive). Inference feature
            cache: in sequential modes every src view was already encoded when
            it was the cur frame, and inference BN uses running stats, so
            cached features are bit-identical to recomputed ones — the
            matching encoder then runs on 1 image instead of k+1. The cur
            frame's features are returned as outputs["matching_feats_bhwc"]
            for the caller to cache. Inference-only (flip must be False).
        cur_feats / cur_matching_feats: optional precomputed outputs of
            ``encode_frame`` for the cur frame (the encode-ahead pipeline:
            image-only work hoisted out of the sequential hint->forward->fuse
            chain and batched over upcoming frames). Bit-identical to the
            in-call encoders. Inference-only (flip must be False).
        stop_after: profiling diagnostic — "cost_volume" returns right after
            the cost volume, "cv_encoder" after the CVEncoder. Stage-marginal
            benches (scripts/bench_incremental_parts.py) subtract these
            partial forwards to attribute in-context time to CV vs CVEncoder
            vs decoder. Never set in production paths.
        """
        dtype = jnp.dtype(self.compute_dtype)
        # Image tensors are OPTIONAL when the corresponding features are
        # precomputed (encode-ahead / feature-cache pipelines): a lax.scan
        # over frames then carries ~5 MB of features per frame instead of
        # ~230 MB of stacked images in its xs.
        cur_image = cur_data.get("image_bhw3")
        src_image = src_data.get("image_bkhw3")
        if cur_image is None:
            assert cur_feats is not None and cur_matching_feats is not None, (
                "cur_data lacks image_bhw3: cur_feats and cur_matching_feats "
                "must be precomputed (encode_frame)"
            )
        else:
            cur_image = cur_image.astype(dtype)
        if src_image is None:
            assert src_matching_feats is not None, (
                "src_data lacks image_bkhw3: src_matching_feats must be "
                "precomputed"
            )
        else:
            src_image = src_image.astype(dtype)
        src_K = src_data[f"K_s{self.matching_scale}_bk44"]
        cur_invK = cur_data[f"invK_s{self.matching_scale}_b44"]

        # relative transforms (fp32, autocast-off in the reference)
        src_cam_T_cur_cam = jnp.einsum(
            "bkij,bjl->bkil",
            src_data["cam_T_world_bk44"],
            cur_data["world_T_cam_b44"],
        )
        cur_cam_T_src_cam = jnp.einsum(
            "bij,bkjl->bkil",
            cur_data["cam_T_world_b44"],
            src_data["world_T_cam_bk44"],
        )

        if cur_image is not None:
            cur_image = _maybe_flip(cur_image, flip, 2)
        if src_image is not None:
            src_image = _maybe_flip(src_image, flip, 3)

        if cur_feats is not None:
            assert isinstance(flip, bool) and not flip, (
                "cur_feats is an inference encode-ahead input; flipped "
                "passes must encode images"
            )
            cur_feats = tuple(f.astype(dtype) for f in cur_feats)
        else:
            cur_feats = self.encoder(cur_image, train=train)

        # matching features for cur + all src views in one batch
        b, k = src_data["world_T_cam_bk44"].shape[:2]
        if src_matching_feats is None and cur_matching_feats is None:
            all_images = jnp.concatenate([cur_image[:, None], src_image], axis=1)
            all_feats = self.matching_model(
                all_images.reshape((b * (k + 1),) + all_images.shape[2:]),
                train=train,
            )
            all_feats = all_feats.reshape((b, k + 1) + all_feats.shape[1:])
            matching_cur_feats = all_feats[:, 0]
            matching_src_feats = all_feats[:, 1:]
        else:
            assert isinstance(flip, bool) and not flip, (
                "src/cur matching feats are inference feature-cache inputs; "
                "flipped training passes must encode images"
            )
            if cur_matching_feats is not None:
                matching_cur_feats = cur_matching_feats.astype(dtype)
            else:
                matching_cur_feats = self.matching_model(cur_image, train=train)
            if src_matching_feats is not None:
                matching_src_feats = src_matching_feats.astype(dtype)
            else:
                all_feats = self.matching_model(
                    src_image.reshape((b * k,) + src_image.shape[2:]),
                    train=train,
                )
                matching_src_feats = all_feats.reshape(
                    (b, k) + all_feats.shape[1:]
                )

        matching_cur_feats = _maybe_flip(matching_cur_feats, flip, 2)
        matching_src_feats = _maybe_flip(matching_src_feats, flip, 3)

        cost_volume_bhwd, lowest_cost_bhw, _, overall_mask_bhw = self.cost_volume(
            matching_cur_feats,
            matching_src_feats,
            src_cam_T_cur_cam,
            cur_cam_T_src_cam,
            src_K,
            cur_invK,
            self.min_matching_depth,
            self.max_matching_depth,
            hint=hint,
            return_mask=return_mask,
            train=train,
        )

        cost_volume_bhwd = _maybe_flip(cost_volume_bhwd, flip, 2)
        if stop_after == "cost_volume":
            return {"cost_volume_bhwd": cost_volume_bhwd,
                    "matching_feats_bhwc": matching_cur_feats}

        cv_feats = self.cost_volume_net(
            cost_volume_bhwd, cur_feats[self.matching_scale:]
        )
        if stop_after == "cv_encoder":
            return {"cv_feats": cv_feats,
                    "matching_feats_bhwc": matching_cur_feats}
        decoder_inputs = list(cur_feats[: self.matching_scale]) + cv_feats

        outputs = dict(self.depth_decoder(decoder_inputs))
        for key in list(outputs.keys()):
            log_depth = _maybe_flip(outputs[key].astype(jnp.float32), flip, 2)
            outputs[key] = log_depth
            outputs[key.replace("log_", "")] = jnp.exp(log_depth)

        outputs["lowest_cost_bhw"] = lowest_cost_bhw
        outputs["overall_mask_bhw"] = overall_mask_bhw
        # expose the cur frame's matching features so sequential callers can
        # cache them as src features for later frames (see docstring) —
        # unflipped passes only: under flip TTA these are features of the
        # mirrored image and must never enter the feature cache
        if isinstance(flip, bool) and not flip:
            outputs["matching_feats_bhwc"] = matching_cur_feats
        return outputs


class DepthModelCVHint(DepthModel):
    """DoubleTake: DepthModel with the mesh-hint feature volume."""

    feature_volume_type: str = "mlp_mesh_hint_feature_volume"

    def __call__(self, cur_data, src_data, train=False, flip=False, return_mask=False,
                 hint=None, src_matching_feats=None, cur_feats=None,
                 cur_matching_feats=None, stop_after=None):
        if hint is None:
            # empty hints: invalid everywhere (reference feeds all-invalid
            # hint tensors when no mesh exists yet). Without images (feature
            # pipelines) build it at matching res — the volume nearest-resizes
            # the hint there anyway, so this is exactly equivalent.
            if "image_bhw3" in cur_data:
                b, h, w, _ = cur_data["image_bhw3"].shape
            else:
                b, h, w = (cur_matching_feats.shape[0],) + tuple(
                    cur_matching_feats.shape[1:3])
            zero = jnp.zeros((b, h, w, 1), jnp.float32)
            hint = {
                "depth_hint_bhw1": zero,
                "hint_mask_bhw1": zero.astype(bool),
                "sampled_weights_bhw1": zero,
            }
        return super().__call__(
            cur_data, src_data, train=train, flip=flip, return_mask=return_mask,
            hint=hint, src_matching_feats=src_matching_feats,
            cur_feats=cur_feats, cur_matching_feats=cur_matching_feats,
            stop_after=stop_after,
        )


def get_model_class(model_type: str):
    """Model registry (reference utils/model_utils.py:10-17)."""
    return {
        "depth_model": DepthModel,
        "cv_hint_depth_model": DepthModelCVHint,
    }[model_type]
