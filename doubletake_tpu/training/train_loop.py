"""Training: sharded train step, optimizer/schedule, and the train loop.

Capability parity with the reference training stack (train.py +
sr_depth_model.py:528-689): AdamW lr 1e-4 wd 1e-4 with x0.1 steps at 70k
and 80k, the full loss cocktail, flip/color augmentation, periodic
validation over multiple val sets, checkpointing with resume, and
TensorBoard scalars.

TPU-native design: data parallelism is a ``jax.sharding.Mesh`` over a
('data',) axis — an explicit shard_map step: the batch is sharded,
parameters are replicated, and grads/losses/BN running stats are averaged
in one fused all-reduce (the analogue of the reference's 2-GPU DDP/NCCL,
train.py:279-290). Batch-norm batch statistics are per-device, matching
torch DDP semantics (measured vs the single-device global-batch run in
tests/test_training.py::test_bn_sharding_deviation).

Mixed precision (opts.precision == 16, the reference's fp16-AMP analogue —
train.py:321, configs/models/doubletake_model.yaml): master params,
optimizer state and BN running stats stay fp32; the forward/backward
compute in bf16 via a param cast at loss entry (the model must be built
with compute_dtype="bfloat16" so images cast to match — train() does
this). bf16 needs no loss scaling (fp32-range exponent), so there is no
GradScaler analogue. Gradients come out fp32 (the cast's transpose
upcasts), and flax BatchNorm computes batch statistics in fp32 regardless
of input dtype, so running stats do not degrade.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from doubletake_tpu import losses as losses_mod
from doubletake_tpu.options import Options
from doubletake_tpu.runners import common
from doubletake_tpu.training.augmentation import color_jitter
from doubletake_tpu.utils.geometry import normals_from_depth
from doubletake_tpu.utils.metrics import compute_depth_metrics_batched


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(opts: Options):
    """AdamW + stepped LR (x0.1 at lr_steps) — optimizer parity."""
    boundaries = {int(s): 0.1 for s in opts.lr_steps}
    schedule = optax.piecewise_constant_schedule(opts.lr, boundaries)
    return optax.adamw(schedule, weight_decay=opts.wd), schedule


def train_model_for(opts: Options):
    """Model instance for the TRAIN step: with opts.precision == 16 the
    compute dtype is forced to bf16 (reference fp16-AMP analogue) while
    params/optimizer/eval stay fp32 — see make_train_step(precision=16)."""
    if opts.precision == 16 and opts.compute_dtype == "float32":
        import dataclasses

        opts = dataclasses.replace(opts, compute_dtype="bfloat16")
    return common.build_model(opts)


def data_mesh(num_devices: int = 0) -> Mesh:
    devices = jax.devices()
    n = num_devices or len(devices)
    return Mesh(np.array(devices[:n]), axis_names=("data",))


TRAIN_CUR_KEYS = common.CUR_KEYS + ("depth_bhw1", "mask_b_bhw1")
TRAIN_SRC_KEYS = common.SRC_KEYS + ("depth_bkhw1", "K_s0_bk44")


_HINT_KEYS = ("depth_hint_bhw1", "hint_mask_bhw1", "sampled_weights_bhw1")


def _train_batch(cur_np, src_np, dtype=jnp.float32):
    cur = {
        k: jnp.asarray(cur_np[k])
        for k in TRAIN_CUR_KEYS + _HINT_KEYS
        if k in cur_np
    }
    src = {k: jnp.asarray(src_np[k]) for k in TRAIN_SRC_KEYS if k in src_np}
    return cur, src


def make_train_step(model, tx, mesh: Optional[Mesh] = None,
                    use_hint_model: bool = False, precision: int = 32):
    """Build the jitted, sharded train step.

    Returns step(state, cur, src, rng, flip) -> (state, losses_dict).
    With a mesh, batch inputs are sharded over ('data',) and the state is
    replicated; gradients all-reduce automatically.

    precision == 16: bf16 compute with fp32 master params (see module
    docstring). The model must have compute_dtype == "bfloat16" so its
    image casts match the bf16 params (flax dtype promotion would
    otherwise upcast every layer back to fp32).
    """
    if precision == 16:
        assert jnp.dtype(model.compute_dtype) == jnp.bfloat16, (
            "precision=16 needs a compute_dtype='bfloat16' model; build it "
            "with training.train_loop.train_model_for(opts)"
        )

    def loss_fn(params, batch_stats, cur, src, rng):
        if precision == 16:
            from doubletake_tpu.checkpoints.io import cast_floating

            params = cast_floating(params, jnp.bfloat16)
        aug_rng, flip_rng = jax.random.split(rng)
        cur = dict(cur)
        src = dict(src)
        keys = jax.random.split(aug_rng, 1 + src["image_bkhw3"].shape[1])
        cur["image_bhw3"] = color_jitter(keys[0], cur["image_bhw3"])
        src_imgs = [
            color_jitter(keys[1 + i], src["image_bkhw3"][:, i])
            for i in range(src["image_bkhw3"].shape[1])
        ]
        src["image_bkhw3"] = jnp.stack(src_imgs, axis=1)

        # 50% horizontal flip around the cost volume (sr_depth_model.py:351-359)
        # — traced per-batch coin; the model flips images, un-flips matching
        # feats for correct MVS, re-flips the CV, and un-flips the outputs,
        # so GT stays unflipped here.
        do_flip = jax.random.bernoulli(flip_rng, 0.5)

        hint = None
        if use_hint_model:
            hint = {
                "depth_hint_bhw1": cur.get("depth_hint_bhw1"),
                "hint_mask_bhw1": cur.get("hint_mask_bhw1"),
                "sampled_weights_bhw1": cur.get("sampled_weights_bhw1"),
            }
            if hint["depth_hint_bhw1"] is None:
                hint = None

        outputs, mutated = model.apply(
            {"params": params, "batch_stats": batch_stats},
            cur, src, train=True, flip=do_flip, hint=hint,
            mutable=["batch_stats"],
        )

        depth_gt = cur["depth_bhw1"]
        invK_s0 = cur["invK_s0_b44"]
        normals_gt = normals_from_depth(
            jnp.where(jnp.isfinite(depth_gt), depth_gt, 0.0), invK_s0
        )
        normals_gt = jnp.where(
            jnp.isfinite(depth_gt), normals_gt, jnp.nan
        )
        normals_pred = normals_from_depth(outputs["depth_pred_s0_bhw1"], invK_s0)

        loss_dict = losses_mod.compute_losses(cur, src, outputs, normals_gt, normals_pred)
        return loss_dict["loss"], (loss_dict, mutated["batch_stats"], outputs)

    def apply_update(state, grads, new_stats, loss_dict):
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        return new_state, loss_dict

    def train_step(state: TrainState, cur, src, rng):
        (loss, (loss_dict, new_stats, outputs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, cur, src, rng)
        return apply_update(state, grads, new_stats, loss_dict)

    if mesh is None:
        return jax.jit(train_step, donate_argnums=(0,))

    # Data-parallel step as an explicit shard_map: each device runs the full
    # fwd+bwd on its batch shard, then grads + losses + batch stats are
    # averaged in ONE fused all-reduce (everything raveled into a single
    # vector) and the optimizer update runs replicated. One collective per
    # step is both the fastest layout on ICI and the only layout that stays
    # fast on hosts where XLA CPU cannot combine per-tensor all-reduces.
    # Batch-norm batch statistics are per-device (the reference's DDP
    # semantics) while the running stats are cross-device averaged.
    from jax.flatten_util import ravel_pytree

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size

    def sharded_step(state, cur, src, rng):
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        (loss, (loss_dict, new_stats, outputs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params, state.batch_stats, cur, src, rng)
        flat, unravel = ravel_pytree((grads, new_stats, loss_dict))
        flat = jax.lax.psum(flat, axis) / n_dev
        grads, new_stats, loss_dict = unravel(flat)
        return apply_update(state, grads, new_stats, loss_dict)

    mapped = jax.shard_map(
        sharded_step,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    replicated = NamedSharding(mesh, P())
    batch_sharding = NamedSharding(mesh, P(axis))
    return jax.jit(
        mapped,
        in_shardings=(replicated, batch_sharding, batch_sharding, replicated),
        out_shardings=(replicated, replicated),
        donate_argnums=(0,),
    )


def make_eval_step(model, use_hint_model: bool = False):
    @jax.jit
    def eval_step(params, batch_stats, cur, src):
        outputs = model.apply(
            {"params": params, "batch_stats": batch_stats}, cur, src, train=False,
        )
        depth_gt = cur["depth_bhw1"]
        b = depth_gt.shape[0]
        valid = jnp.isfinite(depth_gt).reshape(b, -1)
        metrics = compute_depth_metrics_batched(
            depth_gt.reshape(b, -1),
            outputs["depth_pred_s0_bhw1"].reshape(b, -1),
            valid,
        )
        return {k: jnp.nanmean(v) for k, v in metrics.items()}

    return eval_step


def init_train_state(opts: Options, model, tx, sample_batch, rng=None) -> TrainState:
    cur, src = _train_batch(*sample_batch)
    rng = rng if rng is not None else jax.random.PRNGKey(opts.random_seed)
    variables = jax.jit(partial(model.init, train=False))(rng, cur, src)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if opts.load_weights_from_checkpoint:
        from doubletake_tpu.checkpoints.io import lazy_load_params, load_params

        loaded = load_params(opts.load_weights_from_checkpoint)
        merged = lazy_load_params(
            {"params": params, "batch_stats": batch_stats}, loaded
        )
        params, batch_stats = merged["params"], merged["batch_stats"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def train(opts: Options):
    """Full training loop with validation, checkpointing and TB logging."""
    from doubletake_tpu.data.loader import DataLoader
    from doubletake_tpu.datasets.registry import dataset_from_opts

    log_dir = os.path.join(opts.log_dir, opts.name)
    os.makedirs(log_dir, exist_ok=True)
    writer = _make_writer(log_dir)

    # reproducibility snapshot: code + merged options (train.py:349-356)
    from doubletake_tpu.options import OptionsHandler
    from doubletake_tpu.utils.io import copy_code_state

    copy_code_state(os.path.join(log_dir, "code"))
    OptionsHandler.save_options_as_yaml(os.path.join(log_dir, "options.yaml"), opts)

    train_ds = dataset_from_opts(opts, split="train", disable_flip=True)
    train_loader = DataLoader(
        train_ds, opts.batch_size, shuffle=True, num_workers=opts.num_workers,
        drop_last=True, infinite=True, seed=opts.random_seed,
    )

    # Validation protocol (reference train.py:79-206): with depth hints, FOUR
    # val loaders at hint-aug 0.5 / 1.0 (all-empty) / 0.0 / 0.0; the first
    # (mixed hints) drives checkpoint selection via val_0_metrics/a5.
    if opts.fill_depth_hints:
        val_augs = [0.5, 1.0, 0.0, 0.0]
    else:
        val_augs = [opts.depth_hint_aug]
    val_loaders = []
    for aug in val_augs:
        ds = dataset_from_opts(opts, split="val", disable_flip=True,
                               depth_hint_aug=aug,
                               include_full_res_depth=opts.high_res_validation)
        val_loaders.append(
            DataLoader(ds, opts.val_batch_size, shuffle=False,
                       num_workers=max(opts.num_workers // 2, 1),
                       drop_last=True)
        )

    model = common.build_model(opts)
    train_model = train_model_for(opts)
    use_hint = "hint" in opts.feature_volume_type
    tx, schedule = make_optimizer(opts)

    mesh = data_mesh(opts.num_devices) if len(jax.devices()) > 1 else None
    train_step = make_train_step(train_model, tx, mesh,
                                 use_hint_model=use_hint,
                                 precision=opts.precision)
    # eval/val in fp32 master precision (the reference validates under AMP,
    # but fp32 val is strictly more accurate for checkpoint selection)
    eval_step = make_eval_step(model, use_hint_model=use_hint)

    it = iter(train_loader)
    first = next(it)
    state = init_train_state(opts, model, tx, first)

    ckpt_dir = os.path.join(log_dir, "checkpoints")
    start_step = 0
    if opts.resume:
        from doubletake_tpu.checkpoints.io import restore_train_state

        abstract = jax.tree_util.tree_map(np.asarray, state)
        restored, step = restore_train_state(opts.resume, abstract)
        if restored is not None:
            state = jax.tree_util.tree_map(jnp.asarray, restored)
            start_step = int(step)
            print(f"resumed from step {start_step}")

    rng = jax.random.PRNGKey(opts.random_seed + 1)
    t0 = time.time()
    step = start_step
    batch = first
    best_a5 = -1.0
    while step < opts.max_steps:
        cur, src = _train_batch(*batch)
        rng, step_rng = jax.random.split(rng)
        if opts.profile_dir and step - start_step == 20:
            jax.profiler.start_trace(opts.profile_dir)
        state, loss_dict = train_step(state, cur, src, step_rng)
        step += 1
        if opts.profile_dir and step - start_step == 25:
            jax.block_until_ready(loss_dict["loss"])
            jax.profiler.stop_trace()
            print(f"profiler trace written to {opts.profile_dir}")

        if step % opts.log_interval == 0:
            jax.block_until_ready(loss_dict["loss"])
            rate = opts.log_interval * opts.batch_size / (time.time() - t0)
            t0 = time.time()
            scalars = {f"train/{k}": float(v) for k, v in loss_dict.items()}
            scalars["train/samples_per_sec"] = rate
            scalars["train/lr"] = float(schedule(step))
            _write_scalars(writer, scalars, step)
            print(f"step {step}: loss {scalars['train/loss']:.4f} "
                  f"({rate:.1f} samples/s)")

        if step % opts.image_log_interval == 0:
            _log_image_panels(writer, model, state, batch, use_hint, step)

        if step % opts.val_interval == 0:
            scalars = {}
            for li, val_loader in enumerate(val_loaders):
                vmetrics: Dict[str, list] = {}
                for vi, vb in enumerate(val_loader):
                    if vi >= opts.val_batches:
                        break
                    vc, vs = _train_batch(*vb)
                    if opts.high_res_validation and "full_res_depth_bhw1" in vb[0]:
                        # metrics vs full-res GT (sr_depth_model.py:622-630)
                        outputs = model.apply(
                            {"params": state.params,
                             "batch_stats": state.batch_stats},
                            vc, vs, train=False,
                        )
                        fm = common.compute_frame_metrics(
                            outputs["depth_pred_s0_bhw1"],
                            vb[0]["full_res_depth_bhw1"],
                        )
                        m = {k: float(np.nanmean(np.asarray(v)))
                             for k, v in fm.items()}
                    else:
                        m = eval_step(state.params, state.batch_stats, vc, vs)
                    for k, v in m.items():
                        vmetrics.setdefault(k, []).append(float(v))
                scalars.update({
                    f"val_{li}_metrics/{k}": float(np.mean(v))
                    for k, v in vmetrics.items()
                })
            _write_scalars(writer, scalars, step)
            print(f"step {step} val: " + ", ".join(
                f"{k.rsplit('/', 1)[0].split('_')[1]}:{k.split('/')[-1]}={v:.4f}"
                for k, v in scalars.items()
                if k.endswith(("a5", "abs_diff"))
            ))
            from doubletake_tpu.checkpoints.io import save_train_state

            save_train_state(ckpt_dir, step, jax.tree_util.tree_map(np.asarray, state))
            # best-checkpoint selection on val_0_metrics/a5 (train.py:223-230)
            a5 = scalars.get("val_0_metrics/a5")
            if a5 is not None and a5 > best_a5:
                best_a5 = a5
                save_train_state(
                    os.path.join(log_dir, "best"), step,
                    jax.tree_util.tree_map(np.asarray, state),
                )

        batch = next(it)

    from doubletake_tpu.checkpoints.io import save_params, save_train_state

    save_train_state(ckpt_dir, step, jax.tree_util.tree_map(np.asarray, state))
    save_params(
        os.path.join(log_dir, "final_params.npz"),
        {"params": state.params, "batch_stats": state.batch_stats},
    )
    return state


def _log_image_panels(writer, model, state, batch, use_hint, step):
    """TB image panels: depth pred/gt, normals, lowest-cost argmax, hints
    (reference doubletake_model.py:566-630)."""
    if writer is None:
        return
    from doubletake_tpu.utils.visualization import colormap_image

    cur, src = _train_batch(*batch)
    hint = None
    if use_hint and "depth_hint_bhw1" in cur:
        hint = {k: cur[k] for k in _HINT_KEYS}
    outputs = model.apply(
        {"params": state.params, "batch_stats": state.batch_stats},
        cur, src, train=False, hint=hint,
    )
    panels = {
        "image": np.asarray(cur["image_bhw3"][:1]),
        "depth_pred": colormap_image(
            np.asarray(outputs["depth_pred_s0_bhw1"][0, ..., 0])
        )[None],
        "depth_gt": colormap_image(np.asarray(cur["depth_bhw1"][0, ..., 0]))[None],
        "lowest_cost": colormap_image(
            np.asarray(outputs["lowest_cost_bhw"][0])
        )[None],
    }
    if hint is not None:
        panels["depth_hint"] = colormap_image(
            np.nan_to_num(np.asarray(hint["depth_hint_bhw1"][0, ..., 0]))
        )[None]
        panels["hint_weights"] = colormap_image(
            np.asarray(hint["sampled_weights_bhw1"][0, ..., 0])
        )[None]

    import tensorflow as tf

    with writer.as_default():
        for name, img in panels.items():
            tf.summary.image(f"train_images/{name}", img, step=step)


def _make_writer(log_dir):
    try:
        import tensorflow as tf

        return tf.summary.create_file_writer(log_dir)
    except Exception:
        return None


def _write_scalars(writer, scalars: Dict[str, float], step: int):
    if writer is None:
        return
    import tensorflow as tf

    with writer.as_default():
        for k, v in scalars.items():
            tf.summary.scalar(k, v, step=step)
