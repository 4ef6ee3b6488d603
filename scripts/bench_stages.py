"""In-graph marginal stage costs on the real TPU (slope method).

Per PERF_NOTES.md: standalone dispatch timing lies on this platform (fixed
per-dispatch overhead scales with program size), so each stage is timed as
d(time)/d(iterations) inside ONE jitted program, chained so XLA cannot
dead-code or parallelize the repeats, with a hard fetch at the end.

Usage: python scripts/bench_stages.py [cv raycast table integrate forward]
"""

import os as _os
import sys
import time
from functools import partial

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def _cache():
    import os

    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def _fetch(out):
    """Hard fetch of one element — block_until_ready alone has been seen
    returning in ~1 ms on repeat dispatches over the axon tunnel. The
    element is sliced out ON DEVICE first: np.asarray on the full leaf
    would pull the whole array (50-150 MB at b=8) over the tunnel and
    drown the slope in transfer time (measured: negative marginals)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[0])


def _time(fn, *args, trials=3):
    """Min over trials after one warmup — per-dispatch noise on the axon
    tunnel is tens of ms, which otherwise drowns the slope method."""
    out = fn(*args)
    _fetch(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        out = fn(*args)
        _fetch(out)
        best = min(best, time.perf_counter() - t0)
    return best


import os as _os

_KS = tuple(int(x) for x in _os.environ.get("BENCH_KS", "1,4").split(","))


def marginal(make_fn, ks=None):
    """Build fn(k) repeating the stage k times chained; return per-iter cost."""
    ks = ks or _KS
    times = {}
    for k in ks:
        fn = make_fn(k)
        times[k] = _time(fn)
    k0, k1 = ks
    return (times[k1] - times[k0]) / (k1 - k0), times


def bench_cv(use_pallas: bool, use_hint: bool = True):
    from doubletake_tpu.models.cost_volume import FeatureMeshHintVolume

    h, w, c, k = 96, 128, 16, 7
    rng = np.random.RandomState(0)
    cur = jnp.asarray(rng.randn(1, h, w, c), jnp.float32)
    src = jnp.asarray(rng.randn(1, k, h, w, c), jnp.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (1, k, 1, 1))
    poses[:, :, 0, 3] = rng.randn(1, k) * 0.1
    poses[:, :, 2, 3] = rng.randn(1, k) * 0.05
    src_T_cur = jnp.asarray(poses)
    cur_T_src = jnp.linalg.inv(src_T_cur)
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 64.0
    K[0, 2], K[1, 2] = w / 2, h / 2
    Kb = jnp.asarray(np.tile(K, (1, k, 1, 1)))
    invK = jnp.asarray(np.linalg.inv(K))[None]
    hint = {
        "depth_hint_bhw1": jnp.full((1, h, w, 1), 2.0),
        "hint_mask_bhw1": jnp.ones((1, h, w, 1), bool),
        "sampled_weights_bhw1": jnp.full((1, h, w, 1), 0.5),
    }

    vol = FeatureMeshHintVolume(use_pallas=use_pallas)
    vars_ = vol.init(jax.random.PRNGKey(0), cur, src, src_T_cur, cur_T_src,
                     Kb, invK, 0.25, 5.0, hint=hint)

    def make_fn(reps):
        @jax.jit
        def fn(cur_in):
            x = cur_in
            outs = None
            for _ in range(reps):
                outs = vol.apply(vars_, x, src, src_T_cur, cur_T_src, Kb,
                                 invK, 0.25, 5.0, hint=hint)
                x = x + outs[0][..., :1] * 1e-30  # chain
            return outs[0]

        return lambda: fn(cur)

    m, times = marginal(make_fn)
    print(f"cv pallas={use_pallas}: marginal {m*1e3:.1f} ms  (times {times})")


def _make_tsdf():
    from doubletake_tpu.tools.tsdf import TSDF

    return TSDF.from_bounds(
        dict(xmin=-4.0, xmax=4.0, ymin=-3.0, ymax=3.0, zmin=0.0, zmax=3.0), 0.02
    )


def bench_raycast(num_samples: int = 256, use_mip: bool = False):
    from doubletake_tpu.tools.tsdf import raycast

    tsdf = _make_tsdf()
    # fuse something so rays find crossings
    tsdf = tsdf.replace(
        values=tsdf.values.at[:, :, 100:].set(1.0).at[:, :, :100].set(-0.5),
        weights=tsdf.weights + 0.5,
    )
    pose = jnp.eye(4)
    invK = jnp.asarray(np.linalg.inv(
        np.array([[64, 0, 64, 0], [0, 64, 48, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
                 np.float32)))

    def make_fn(reps):
        @jax.jit
        def fn(vol_vals):
            t = tsdf.replace(values=vol_vals)
            d = None
            for _ in range(reps):
                d, wt, v = raycast(t, pose, invK, 96, 128, min_depth=0.5,
                                   max_depth=3.5, num_samples=num_samples,
                                   use_mip=use_mip)
                vol_vals = vol_vals + d[0, 0] * 1e-30
                t = tsdf.replace(values=vol_vals)
            return d

        return lambda: fn(tsdf.values)

    m, times = marginal(make_fn)
    print(f"raycast ns={num_samples} mip={use_mip}: "
          f"marginal {m*1e3:.1f} ms  (times {times})")


def bench_table():
    from doubletake_tpu.tools.tsdf import _build_ray_table

    tsdf = _make_tsdf()

    def make_fn(reps):
        @jax.jit
        def fn(vals):
            t = tsdf.replace(values=vals)
            out = None
            for _ in range(reps):
                out, _ = _build_ray_table(t)
                vals = vals + out.ravel()[0].astype(vals.dtype) * 1e-30
                t = tsdf.replace(values=vals)
            return out

        return lambda: fn(tsdf.values)

    m, times = marginal(make_fn)
    print(f"ray table build: marginal {m*1e3:.1f} ms  (times {times})")


def bench_integrate(cull=False, frac=0.5, use_pallas=None, look_away=False):
    """look_away=True points the camera away from the volume: every Pallas
    sub-tile takes the flag==0 skip path, so the marginal is the kernel's
    pure streaming + grid/branch overhead — the floor the active-tile work
    sits on. (The volume is z in [0, 3]; a camera at z=-5 looking toward
    -z sees none of it.)"""
    from doubletake_tpu.tools.tsdf import FusionConfig, integrate_depth

    tsdf = _make_tsdf()
    cfg = FusionConfig(min_depth=0.5, max_depth=3.5, extended_neg_truncation=True)
    rng = np.random.RandomState(0)
    K = jnp.asarray(
        np.array([[128, 0, 128, 0], [0, 128, 96, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
                 np.float32))
    # per-rep DIFFERENT frames: with one fixed (depth, pose) XLA hoists the
    # entire loop-invariant projection+gather out of the chain and the
    # marginal reads ~0 (measured) — production integrates a new frame each
    # step, so the bench must too
    max_reps = max(_KS)
    depths = jnp.asarray(
        rng.rand(max_reps, 192, 256, 1).astype(np.float32) * 2 + 0.8)
    poses = np.tile(np.eye(4, dtype=np.float32), (max_reps, 1, 1))
    poses[:, 0, 3] = rng.randn(max_reps) * 0.05
    if look_away:
        # cam_T_world: rotate pi about x (cam +z -> world -z), centered at
        # world z=-5 -> frustum entirely below the volume's z in [0, 3]
        flip = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
        for i in range(max_reps):
            w_T_c = np.eye(4, dtype=np.float32) @ flip
            w_T_c[2, 3] = -5.0
            poses[i] = np.linalg.inv(w_T_c)
    poses = jnp.asarray(poses)
    v0 = jax.block_until_ready(tsdf.values)
    w0 = jax.block_until_ready(tsdf.weights)

    def make_fn(reps):
        # no donation: inputs are reused across trials; the extra output
        # copy is bandwidth-bound (~0.5 ms) and cancels in the slope
        @jax.jit
        def fn(vals, wts, ds, ps):
            t = tsdf.replace(values=vals, weights=wts)
            for i in range(reps):
                t = integrate_depth(t, ds[i], ps[i], K, cfg, cull=cull,
                                    cull_max_fraction=frac,
                                    use_pallas=use_pallas)
            return t.values

        return lambda: fn(v0, w0, depths, poses)

    m, times = marginal(make_fn)
    print(f"integrate cull={cull} frac={frac} pallas={use_pallas} "
          f"away={look_away}: marginal {m*1e3:.1f} ms  (times {times})")


def bench_forward(compute_dtype="float32", batch=1, compare=False):
    """Marginal full-model forward cost; optionally the bf16-vs-fp32 s0
    depth delta (the VERDICT-asked parity measurement)."""
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _example_batch
    from doubletake_tpu.checkpoints.io import cast_floating
    from doubletake_tpu.models.depth_model import DepthModelCVHint

    H, W = 384, 512
    model = DepthModelCVHint(fast_cost_volume=True, compute_dtype=compute_dtype)
    cur, src = _example_batch(batch, H, W, model.model_num_views)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), cur, src)
    if compute_dtype == "bfloat16":
        variables = cast_floating(variables, jnp.bfloat16)

    def make_fn(reps):
        # variables/src as REAL ARGUMENTS: closed-over device arrays embed
        # in the HLO as constants and overflow the axon remote-compile
        # request limit at b=8 (HTTP 413; PERF_NOTES round 3)
        @jax.jit
        def fn(v, c, s):
            out = None
            for _ in range(reps):
                out = model.apply(v, c, s)
                c = dict(c, image_bhw3=c["image_bhw3"]
                         + out["depth_pred_s0_bhw1"][:, :1, :1] * 1e-30)
            return out["depth_pred_s0_bhw1"]

        ctr = [0]

        def call():
            # a FRESH input buffer per trial: repeat dispatches on identical
            # buffers are served in ~1 ms regardless of work (axon illusion)
            ctr[0] += 1
            c2 = dict(cur, image_bhw3=cur["image_bhw3"] * (1.0 + ctr[0] * 1e-7))
            return fn(variables, c2, src)

        return call

    m, times = marginal(make_fn)
    print(f"forward b={batch} {compute_dtype}: marginal {m*1e3:.1f} ms "
          f"({m*1e3/batch:.1f} ms/map)  (times {times})")

    if compare:
        model32 = DepthModelCVHint(fast_cost_volume=True)
        v32 = jax.jit(model32.init)(jax.random.PRNGKey(0), cur, src)
        d32 = np.asarray(jax.jit(
            lambda c: model32.apply(v32, c, src)["depth_pred_s0_bhw1"])(cur))
        dlo = np.asarray(jax.jit(
            lambda c: model.apply(variables, c, src)["depth_pred_s0_bhw1"])(cur))
        diff = np.abs(d32 - dlo)
        rel = diff / np.maximum(np.abs(d32), 1e-6)
        print(f"bf16 vs fp32 s0 depth: mean |d| {diff.mean():.2e} "
              f"p99 {np.percentile(diff, 99):.2e} max rel {rel.max():.2e}")


def bench_forward_parts(compute_dtype="float32", batch=1):
    """Marginal cost of each forward submodule (encoder / matching encoder /
    cost volume / CVEncoder+decoder) — the non-CV ~19 ms of the forward
    needs attribution before optimization (PERF_NOTES round-3 bf16 finding)."""
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _example_batch
    from doubletake_tpu.checkpoints.io import cast_floating
    from doubletake_tpu.models.depth_model import DepthModelCVHint

    H, W = 384, 512
    model = DepthModelCVHint(fast_cost_volume=True, compute_dtype=compute_dtype)
    cur, src = _example_batch(batch, H, W, model.model_num_views)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), cur, src)
    if compute_dtype == "bfloat16":
        variables = cast_floating(variables, jnp.bfloat16)
    dtype = jnp.dtype(compute_dtype)

    img = cur["image_bhw3"].astype(dtype)
    b, k1 = batch, model.model_num_views
    all_imgs = jnp.concatenate(
        [img[:, None], src["image_bkhw3"].astype(dtype)], axis=1
    ).reshape((b * k1, H, W, 3))

    def part(name, fn, x, extra=None):
        def make_fn(reps):
            @jax.jit
            def f(v, xx, ex):
                out = None
                for _ in range(reps):
                    out = fn(v, xx) if ex is None else fn(v, xx, ex)
                    leaf = out[0] if isinstance(out, (list, tuple)) else out
                    xx = xx + leaf.reshape(-1)[0].astype(xx.dtype) * 1e-30
                return out

            ctr = [0]

            def call():
                ctr[0] += 1  # fresh buffer per trial (axon dedupe illusion)
                return f(variables, x * (1.0 + ctr[0] * 1e-7), extra)

            return call

        m, times = marginal(make_fn)
        print(f"forward part {name} b={batch} {compute_dtype}: "
              f"marginal {m*1e3:.2f} ms  (times {times})")

    part("image encoder (512x384)",
         lambda v, x: model.apply(v, x, method=lambda m, xx: m.encoder(xx)),
         img)
    part(f"matching encoder ({b * k1}x512x384)",
         lambda v, x: model.apply(
             v, x, method=lambda m, xx: m.matching_model(xx)),
         all_imgs)

    # CVEncoder + decoder: cur_feats fixed, chain over the cost volume input
    cur_feats = jax.jit(
        lambda x: model.apply(variables, x, method=lambda m, xx: m.encoder(xx))
    )(img)
    cv_in = jnp.asarray(
        np.random.RandomState(0).randn(b, H // 4, W // 4, 64), dtype)

    def cvnet_dec(v, x, feats):
        def run(m, xx):
            cv_feats = m.cost_volume_net(xx, feats[m.matching_scale:])
            dec_in = list(feats[: m.matching_scale]) + cv_feats
            return m.depth_decoder(dec_in)["log_depth_pred_s0_bhw1"]

        return model.apply(v, x, method=run)

    part("cv_encoder+decoder", cvnet_dec, cv_in, extra=tuple(cur_feats))


def bench_encode(compute_dtype="bfloat16", batch=1):
    """Marginal cost of encode_frame (image-prior encoder + matching
    encoder, the image-only per-frame work) at a given batch — sizes the
    encode-ahead win: serial cost at b=1 vs amortized cost at the bench's
    group size (b=12)."""
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from doubletake_tpu.checkpoints.io import cast_floating
    from doubletake_tpu.models.depth_model import DepthModelCVHint

    H, W = 384, 512
    model = DepthModelCVHint(fast_cost_volume=True, compute_dtype=compute_dtype)
    rng = np.random.RandomState(0)
    from __graft_entry__ import _example_batch
    cur, src = _example_batch(1, H, W, model.model_num_views)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), cur, src)
    if compute_dtype == "bfloat16":
        variables = cast_floating(variables, jnp.bfloat16)
    imgs = jnp.asarray(rng.randn(batch, H, W, 3), jnp.float32)

    def make_fn(reps):
        @jax.jit
        def f(v, x):
            out = None
            for _ in range(reps):
                out = model.apply(v, x, method=lambda m, xx: m.encode_frame(xx))
                x = x + out[1].reshape(-1)[0].astype(x.dtype) * 1e-30
            return out

        ctr = [0]

        def call():
            ctr[0] += 1
            return f(variables, imgs * (1.0 + ctr[0] * 1e-7))

        return call

    m, times = marginal(make_fn)
    print(f"encode_frame b={batch} {compute_dtype}: marginal {m*1e3:.2f} ms "
          f"({m*1e3/batch:.2f} ms/map)  (times {times})")


def bench_cv_pieces(batch=8):
    """Decompose the fused cost-volume path at the flagship shape:
    geometry precompute (XLA) vs the pallas_call vs the full module apply
    (wrapper transposes, hint resize, argmax). The VERDICT round-3 gap —
    parts-sum vs full-forward — lives somewhere in here."""
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from doubletake_tpu.models.cost_volume import FeatureMeshHintVolume
    from doubletake_tpu.ops.pallas.fused_volume import (
        _precompute_geometry, fused_feature_volume, pad_mlp_weights,
    )

    b, h, w, c, k = batch, 96, 128, 16, 7
    rng = np.random.RandomState(0)
    cur = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
    src = jnp.asarray(rng.randn(b, k, h, w, c), jnp.float32)
    poses = np.tile(np.eye(4, dtype=np.float32), (b, k, 1, 1))
    poses[:, :, 0, 3] = rng.randn(b, k) * 0.1
    poses[:, :, 2, 3] = rng.randn(b, k) * 0.05
    src_T_cur = jnp.asarray(poses)
    cur_T_src = jnp.linalg.inv(src_T_cur)
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 64.0
    K[0, 2], K[1, 2] = w / 2, h / 2
    Kb = jnp.asarray(np.tile(K, (b, k, 1, 1)))
    invK = jnp.asarray(np.tile(np.linalg.inv(K), (b, 1, 1)))
    hint = {
        "depth_hint_bhw1": jnp.full((b, h, w, 1), 2.0),
        "hint_mask_bhw1": jnp.ones((b, h, w, 1), bool),
        "sampled_weights_bhw1": jnp.full((b, h, w, 1), 0.5),
    }
    hint_bhw3 = jnp.concatenate(
        [hint["depth_hint_bhw1"],
         hint["hint_mask_bhw1"].astype(jnp.float32),
         hint["sampled_weights_bhw1"]], axis=-1)

    vol = FeatureMeshHintVolume(use_pallas=True)
    vars_ = vol.init(jax.random.PRNGKey(0), cur[:1], src[:1], src_T_cur[:1],
                     cur_T_src[:1], Kb[:1], invK[:1], 0.25, 5.0,
                     hint={k_: v[:1] for k_, v in hint.items()})
    weights = jax.jit(
        lambda p: pad_mlp_weights(p["mlp"], p["hint_mlp"])
    )(vars_["params"])

    planes = jnp.exp(jnp.log(0.25) + jnp.log(5.0 / 0.25)
                     * jnp.linspace(0.0, 1.0, 64))

    def chain(fn):
        """make_fn factory: rep-chain on the cur features."""
        def make_fn(reps):
            @jax.jit
            def f(x, s):
                out = None
                for _ in range(reps):
                    out = fn(x)
                    x = x + jax.tree_util.tree_leaves(out)[0].reshape(-1)[0] * 1e-30
                return out
            ctr = [0]

            def call():
                ctr[0] += 1
                return f(cur * (1.0 + ctr[0] * 1e-7), jnp.float32(ctr[0]))
            return call
        return make_fn

    geo_fn = jax.vmap(
        lambda sk, st, ct, ik: _precompute_geometry(sk, st, ct, ik, planes, h, w)
    )

    m, times = marginal(chain(
        lambda x: geo_fn(Kb, src_T_cur + x.reshape(-1)[0] * 1e-30,
                         cur_T_src, invK)["meta_rows"]))
    print(f"cv geometry precompute b={batch}: marginal {m*1e3:.2f} ms  (times {times})")

    m, times = marginal(chain(
        lambda x: fused_feature_volume(
            x, src, src_T_cur, cur_T_src, Kb, invK, 0.25, 5.0, weights,
            hint_bhw3=hint_bhw3, use_hint=True)[0]))
    print(f"cv fused total (geo+kernel) b={batch}: marginal {m*1e3:.2f} ms  (times {times})")

    m, times = marginal(chain(
        lambda x: vol.apply(vars_, x, src, src_T_cur, cur_T_src, Kb, invK,
                            0.25, 5.0, hint=hint)[0]))
    print(f"cv module apply b={batch}: marginal {m*1e3:.2f} ms  (times {times})")


def bench_train(batch=4):
    """First-ever training perf row (VERDICT r2 weak #3): in-graph marginal
    cost of one flagship train step (fwd+bwd, XLA volume path) on the chip,
    reported as steps/sec and samples/sec (scale to the reference's
    2xA100 fp16 bs16 protocol by samples/sec)."""
    import os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from doubletake_tpu.options import Options
    from doubletake_tpu.runners import common
    from doubletake_tpu.training import train_loop

    opts = Options()
    opts.model_type = "cv_hint_depth_model"
    opts.feature_volume_type = "mlp_mesh_hint_feature_volume"
    opts.image_encoder_name = "efficientnet"
    opts.depth_decoder_name = "unet_pp"
    opts.matching_encoder_type = "resnet"
    model = common.build_model(opts)
    tx, _ = train_loop.make_optimizer(opts)

    b, h, w = batch, 384, 512
    k = opts.model_num_views - 1
    rng = np.random.RandomState(0)
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 0.58 * w
    K[0, 2], K[1, 2] = w / 2, h / 2
    K1 = K.copy(); K1[:2] /= 4.0
    K0 = K.copy(); K0[:2] /= 2.0
    eye = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    eyek = np.tile(np.eye(4, dtype=np.float32), (b, k, 1, 1))
    cur = {
        "image_bhw3": jnp.asarray(rng.randn(b, h, w, 3), jnp.float32),
        "cam_T_world_b44": jnp.asarray(eye), "world_T_cam_b44": jnp.asarray(eye),
        "invK_s1_b44": jnp.asarray(np.tile(np.linalg.inv(K1), (b, 1, 1))),
        "K_s0_b44": jnp.asarray(np.tile(K0, (b, 1, 1))),
        "invK_s0_b44": jnp.asarray(np.tile(np.linalg.inv(K0), (b, 1, 1))),
        "depth_bhw1": jnp.asarray(
            rng.rand(b, h // 2, w // 2, 1) + 0.5, jnp.float32),
        "mask_b_bhw1": jnp.ones((b, h // 2, w // 2, 1), bool),
        "depth_hint_bhw1": jnp.asarray(
            rng.rand(b, h // 2, w // 2, 1) + 0.5, jnp.float32),
        "hint_mask_bhw1": jnp.ones((b, h // 2, w // 2, 1), bool),
        "sampled_weights_bhw1": jnp.asarray(
            rng.rand(b, h // 2, w // 2, 1), jnp.float32),
    }
    src = {
        "image_bkhw3": jnp.asarray(rng.randn(b, k, h, w, 3), jnp.float32),
        "cam_T_world_bk44": jnp.asarray(eyek), "world_T_cam_bk44": jnp.asarray(eyek),
        "K_s1_bk44": jnp.asarray(np.tile(K1, (b, k, 1, 1))),
        "K_s0_bk44": jnp.asarray(np.tile(K0, (b, k, 1, 1))),
        "depth_bkhw1": jnp.asarray(
            rng.rand(b, k, h // 2, w // 2, 1) + 0.5, jnp.float32),
    }

    # init directly (init_train_state wants a host batch tuple)
    variables = jax.jit(partial(model.init, train=False))(
        jax.random.PRNGKey(0), cur, src)
    state = train_loop.TrainState(
        step=jnp.zeros((), jnp.int32), params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=tx.init(variables["params"]),
    )
    step_fn = train_loop.make_train_step(model, tx, None, use_hint_model=True)

    def make_fn(reps):
        def fn():
            s = state
            ld = None
            for i in range(reps):
                s, ld = step_fn(s, cur, src, jax.random.PRNGKey(i))
            jax.block_until_ready(ld["loss"])
            return ld

        return fn

    m, times = marginal(make_fn)
    print(f"train step b={batch} flagship 512x384: marginal {m*1e3:.1f} ms "
          f"-> {1.0/m:.2f} steps/s, {batch/m:.2f} samples/s  (times {times})")


def main():
    _cache()
    which = sys.argv[1:] or ["cv", "raycast", "table", "integrate"]
    if "cv" in which:
        bench_cv(use_pallas=True)
        bench_cv(use_pallas=False)
    if "cv_pallas" in which:
        bench_cv(use_pallas=True)
    if "raycast_mip" in which:
        bench_raycast(int(_os.environ.get("RAYCAST_NS", "160")), use_mip=True)
        bench_raycast(int(_os.environ.get("RAYCAST_NS", "160")), use_mip=False)
    if "raycast" in which:
        bench_raycast()
    if "raycast_sweep" in which:
        for ns in (256, 192, 128, 96):
            bench_raycast(ns)
    if "table" in which:
        bench_table()
    if "integrate" in which:
        bench_integrate()
    if "integrate_pallas" in which:
        bench_integrate(use_pallas=True)
    if "integrate_away" in which:
        bench_integrate(use_pallas=True, look_away=True)
    if "integrate_xla" in which:
        bench_integrate(use_pallas=False)
    if "integrate_cull" in which:
        from doubletake_tpu.tools.tsdf import FusionConfig, choose_cull_fraction
        t = _make_tsdf()
        cfg = FusionConfig(min_depth=0.5, max_depth=3.5,
                           extended_neg_truncation=True)
        import numpy as _np
        K44 = _np.array([[128, 0, 128, 0], [0, 128, 96, 0],
                         [0, 0, 1, 0], [0, 0, 0, 1]], _np.float32)
        poses = _np.tile(_np.eye(4, dtype=_np.float32), (4, 1, 1))
        poses[:, 0, 3] = _np.random.RandomState(0).randn(4) * 0.05
        f = choose_cull_fraction(t, poses, jnp.asarray(K44), cfg, 192, 256)
        print(f"chosen cull fraction: {f:.3f}")
        bench_integrate(cull=True, frac=f)
        bench_integrate(cull=True, frac=0.5)
    if "forward" in which:
        bench_forward()
    if "forward_bf16" in which:
        bench_forward("bfloat16", compare=True)
    if "forward_batch" in which:
        bench_forward(batch=8)
    if "forward_batch_bf16" in which:
        bench_forward("bfloat16", batch=8)
    if "cv_pieces" in which:
        bench_cv_pieces()
    if "encode" in which:
        bench_encode(batch=1)
        bench_encode(batch=12)
    if "forward_parts" in which:
        bench_forward_parts()
    if "forward_parts_bf16" in which:
        bench_forward_parts("bfloat16")
    if "train" in which:
        bench_train(batch=int(sys.argv[sys.argv.index("train") + 1])
                    if len(sys.argv) > sys.argv.index("train") + 1
                    and sys.argv[sys.argv.index("train") + 1].isdigit() else 4)


if __name__ == "__main__":
    main()
