"""Decompose bench.py's incremental scan: which stage owns the 115 ms/frame?

Standalone stage marginals (bench_stages.py) sum to ~75 ms/frame but the
real scanned loop runs ~115 ms/frame (8.68 maps/s, BENCH after e44c2e6).
This script re-times bench.py's EXACT frame_group scan with stage subsets:

  full        hint raycast + forward + integrate   (the bench loop)
  fwd_fuse    fixed hint   + forward + integrate   -> full - this = hint
  hint_fuse   hint raycast + GT fuse (no forward)  -> full - this = forward
  fuse_only   GT fuse only                          -> hint_fuse - this = hint
  hint_fwd    hint raycast + forward (no fuse)     -> full - this = fuse

Cross-checks: the two hint estimates should agree; the three stage costs
should sum to ~the full cost (the residual is scan/dispatch overhead).

Methodology follows PERF_NOTES: chained dispatches, scan (never unroll),
hard element fetch, per-frame cost = group time / frames with the flat
~5-7 ms/dispatch amortized over 12 frames.
"""

import os as _os
import sys
import time
from functools import partial

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

FRAMES_PER_DISPATCH = 12
NUM_GROUPS = 2


def _note(msg):
    print(f"[parts {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    cache_dir = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".jax_cache"
    )
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from doubletake_tpu.checkpoints.io import cast_floating
    from doubletake_tpu.data.loader import DataLoader
    from doubletake_tpu.datasets.synthetic import SyntheticDataset
    from doubletake_tpu.models.depth_model import DepthModelCVHint
    from doubletake_tpu.runners import incremental
    from doubletake_tpu.tools.tsdf import (
        TSDF, FusionConfig, auto_raycast_samples, integrate_depth, raycast,
    )

    H, W = 384, 512
    model = DepthModelCVHint(fast_cost_volume=True, compute_dtype="bfloat16")
    model_xla = DepthModelCVHint(fast_cost_volume=False)

    ds = SyntheticDataset(
        split="test", image_height=H, image_width=W,
        num_frames=FRAMES_PER_DISPATCH * (NUM_GROUPS + 1) + 8,
        tuple_size=model.model_num_views, pass_frame_id=True,
    )
    loader = DataLoader(ds, batch_size=1, shuffle=False, num_workers=4)
    frames = []
    for cur_np, src_np in loader:
        frames.append((cur_np, src_np))
        if len(frames) >= FRAMES_PER_DISPATCH * (NUM_GROUPS + 1):
            break

    def dev(d, keys):
        return {k: jnp.asarray(d[k]) for k in keys if k in d}

    CUR = ("image_bhw3", "cam_T_world_b44", "world_T_cam_b44", "invK_s1_b44",
           "K_s0_b44", "invK_s0_b44")
    SRC = ("image_bkhw3", "cam_T_world_bk44", "world_T_cam_bk44", "K_s1_bk44")
    cur0, src0 = dev(frames[0][0], CUR), dev(frames[0][1], SRC)
    _note("init params")
    variables32 = jax.jit(model_xla.init)(jax.random.PRNGKey(0), cur0, src0)
    variables = cast_floating(variables32, jnp.bfloat16)

    tsdf0 = TSDF.from_bounds(
        dict(xmin=-3.2, xmax=3.2, ymin=-2.2, ymax=2.2, zmin=-0.1, zmax=3.1), 0.02
    )
    cfg = FusionConfig(min_depth=0.5, max_depth=3.5, extended_neg_truncation=True)
    fuse_gt = jax.jit(
        lambda v, d, c, k: integrate_depth(v, d, c, k, cfg), donate_argnums=0
    )
    _note("fusing GT volume")
    for _ in range(3):
        for cur_np, _ in frames:
            tsdf0 = fuse_gt(
                tsdf0,
                jnp.asarray(np.nan_to_num(cur_np["depth_bhw1"][0])),
                jnp.asarray(cur_np["cam_T_world_b44"][0]),
                jnp.asarray(cur_np["K_s0_b44"][0]),
            )

    hint_h, hint_w = H // 4, W // 4
    n_samples = auto_raycast_samples(
        tsdf0.voxel_size, 0.5, 3.5, cfg.extended_neg_truncation
    )

    def make_hint(tsdf, cur):
        hint_d, hint_wt, hint_v = raycast(
            tsdf, cur["world_T_cam_b44"][0], cur["invK_s0_b44"][0],
            hint_h, hint_w, min_depth=0.5, max_depth=3.5,
            num_samples=n_samples,
        )
        valid = hint_v & (hint_wt >= incremental.HINT_WEIGHT_THRESHOLD)
        return {
            "depth_hint_bhw1": jnp.where(valid, hint_d, jnp.nan)[None, ..., None],
            "hint_mask_bhw1": valid[None, ..., None],
            "sampled_weights_bhw1": jnp.where(valid, hint_wt, 0.0)[None, ..., None],
        }

    K_SRC = model.model_num_views - 1

    # fixed hint for the fwd_fuse variant (realistic mask pattern)
    fixed_hint = jax.jit(make_hint)(tsdf0, cur0)
    fixed_hint = jax.tree_util.tree_map(jax.block_until_ready, fixed_hint)

    # ---- scan body variants ------------------------------------------------
    def body_full(variables, tsdf, ring, cur, src, ridx, gt):
        hint = make_hint(tsdf, cur)
        out = model.apply(
            variables, cur, src, hint=hint, src_matching_feats=ring[ridx][None]
        )
        depth = out["depth_pred_s0_bhw1"]
        ring = jnp.concatenate([ring[1:], out["matching_feats_bhwc"]], axis=0)
        tsdf = integrate_depth(
            tsdf, depth[0], cur["cam_T_world_b44"][0], cur["K_s0_b44"][0], cfg
        )
        return tsdf, ring, depth[0, 0, 0, 0]

    def body_fwd_fuse(variables, tsdf, ring, cur, src, ridx, gt):
        out = model.apply(
            variables, cur, src, hint=fixed_hint,
            src_matching_feats=ring[ridx][None],
        )
        depth = out["depth_pred_s0_bhw1"]
        ring = jnp.concatenate([ring[1:], out["matching_feats_bhwc"]], axis=0)
        tsdf = integrate_depth(
            tsdf, depth[0], cur["cam_T_world_b44"][0], cur["K_s0_b44"][0], cfg
        )
        return tsdf, ring, depth[0, 0, 0, 0]

    def body_hint_fuse(variables, tsdf, ring, cur, src, ridx, gt):
        hint = make_hint(tsdf, cur)
        # fuse GT, perturbed by the FULL hint (mean): the raycast is
        # per-pixel independent, so consuming one pixel lets XLA
        # slice-propagate the whole raycast down to that pixel and the
        # variant times nothing (measured: hint_fuse == fuse_only)
        d = gt + jnp.nanmean(hint["depth_hint_bhw1"]) * 1e-30
        tsdf = integrate_depth(
            tsdf, d, cur["cam_T_world_b44"][0], cur["K_s0_b44"][0], cfg
        )
        return tsdf, ring, d[0, 0, 0]

    def body_cheap_hint(variables, tsdf, ring, cur, src, ridx, gt):
        """Per-frame VARYING hint built elementwise from GT (no raycast, no
        table build): full - this = the raycast+table cost in full's exact
        context — discriminates between 'the hint-path delta is the table
        build' and 'it is the model consuming a varying hint'."""
        gh = gt[:: gt.shape[0] // hint_h, :: gt.shape[1] // hint_w, 0]
        gh = gh[:hint_h, :hint_w] + tsdf.values[0, 0, 0] * 1e-30
        valid = gh > 0.5
        hint = {
            "depth_hint_bhw1": jnp.where(valid, gh, jnp.nan)[None, ..., None],
            "hint_mask_bhw1": valid[None, ..., None],
            "sampled_weights_bhw1": jnp.where(valid, 0.5, 0.0)[None, ..., None],
        }
        out = model.apply(
            variables, cur, src, hint=hint, src_matching_feats=ring[ridx][None]
        )
        depth = out["depth_pred_s0_bhw1"]
        ring = jnp.concatenate([ring[1:], out["matching_feats_bhwc"]], axis=0)
        tsdf = integrate_depth(
            tsdf, depth[0], cur["cam_T_world_b44"][0], cur["K_s0_b44"][0], cfg
        )
        return tsdf, ring, depth[0, 0, 0, 0]

    def body_noop(variables, tsdf, ring, cur, src, ridx, gt):
        # nothing but the TSDF carry: times the scan/carry/dispatch base
        # cost every other variant sits on
        tsdf = tsdf.replace(
            values=tsdf.values.at[0, 0, 0].add(gt[0, 0, 0] * 1e-30)
        )
        return tsdf, ring, gt[0, 0, 0]

    def body_fuse_only(variables, tsdf, ring, cur, src, ridx, gt):
        tsdf = integrate_depth(
            tsdf, gt, cur["cam_T_world_b44"][0], cur["K_s0_b44"][0], cfg
        )
        return tsdf, ring, gt[0, 0, 0]

    def body_hint_fwd(variables, tsdf, ring, cur, src, ridx, gt):
        hint = make_hint(tsdf, cur)
        out = model.apply(
            variables, cur, src, hint=hint, src_matching_feats=ring[ridx][None]
        )
        depth = out["depth_pred_s0_bhw1"]
        ring = jnp.concatenate([ring[1:], out["matching_feats_bhwc"]], axis=0)
        # touch the volume so the carry isn't loop-invariant (else the
        # raycast table build hoists out of the scan and under-reports)
        tsdf = tsdf.replace(
            values=tsdf.values.at[0, 0, 0].add(depth[0, 0, 0, 0] * 1e-30)
        )
        return tsdf, ring, depth[0, 0, 0, 0]

    def body_full_ea(variables, tsdf, ring, cur, src, ridx, ea):
        """Encode-ahead: cur's encoders were batch-precomputed OUTSIDE the
        scan (but inside the same timed dispatch); the serial body runs only
        the hint-dependent part (CV -> CVEncoder -> decoder) + fuse."""
        cf, mf = ea
        hint = make_hint(tsdf, cur)
        out = model.apply(
            variables, cur, src, hint=hint,
            src_matching_feats=ring[ridx][None],
            cur_feats=tuple(f[None] for f in cf),
            cur_matching_feats=mf[None],
        )
        depth = out["depth_pred_s0_bhw1"]
        ring = jnp.concatenate([ring[1:], mf[None]], axis=0)
        tsdf = integrate_depth(
            tsdf, depth[0], cur["cam_T_world_b44"][0], cur["K_s0_b44"][0], cfg
        )
        return tsdf, ring, depth[0, 0, 0, 0]

    def _make_body_ea_stop(stop_after):
        """Encode-ahead body with the forward truncated at `stop_after`
        (see DepthModel.__call__): full_ea - ea_cvenc = decoder,
        ea_cvenc - ea_cv = CVEncoder, ea_cv - hint_fuse ~= cost volume —
        each in the REAL scanned context (same hint raycast, same fuse)."""
        def body(variables, tsdf, ring, cur, src, ridx, ea):
            cf, mf = ea
            hint = make_hint(tsdf, cur)
            out = model.apply(
                variables, cur, src, hint=hint,
                src_matching_feats=ring[ridx][None],
                cur_feats=tuple(f[None] for f in cf),
                cur_matching_feats=mf[None],
                stop_after=stop_after,
            )
            leaf = jax.tree_util.tree_leaves(out)[0]
            ring = jnp.concatenate([ring[1:], mf[None]], axis=0)
            # fuse a constant-depth frame perturbed by the partial forward:
            # the truncated model cannot be dead-coded and the fuse stage
            # stays shape-identical to full_ea's
            perturb = jnp.sum(leaf.astype(jnp.float32)) * 1e-30
            tsdf = integrate_depth(
                tsdf,
                jnp.full((H // 2, W // 2, 1), 2.0, jnp.float32) + perturb,
                cur["cam_T_world_b44"][0], cur["K_s0_b44"][0], cfg,
            )
            return tsdf, ring, perturb
        return body

    BODIES = {
        "full": (body_full, False),
        "full_ea": (body_full_ea, "ea"),
        "ea_cv": (_make_body_ea_stop("cost_volume"), "ea"),
        "ea_cvenc": (_make_body_ea_stop("cv_encoder"), "ea"),
        "fwd_fuse": (body_fwd_fuse, False),
        "hint_fuse": (body_hint_fuse, True),
        "fuse_only": (body_fuse_only, True),
        "hint_fwd": (body_hint_fwd, False),
        "noop": (body_noop, True),
        "cheap_hint": (body_cheap_hint, True),
    }

    def make_group(body, with_gt):
        if with_gt == "ea":
            @partial(jax.jit, donate_argnums=(1, 2))
            def frame_group(variables, tsdf, ring, curs, srcs, ridxs, gts):
                del gts
                # batched image-only encoders for the whole group (amortized
                # MXU-efficient work), sliced per frame by the scan
                imgs = curs["image_bhw3"][:, 0]
                feats, mfeats = model.apply(
                    variables, imgs, method=lambda m, x: m.encode_frame(x))
                def sbody(carry, frame):
                    tsdf, ring = carry
                    cur, src, ridx, cf, mf = frame
                    tsdf, ring, d = body(variables, tsdf, ring, cur, src,
                                         ridx, (cf, mf))
                    return (tsdf, ring), d
                (tsdf, ring), d = jax.lax.scan(
                    sbody, (tsdf, ring), (curs, srcs, ridxs, feats, mfeats))
                return tsdf, ring, d
        elif with_gt:
            @partial(jax.jit, donate_argnums=(1, 2))
            def frame_group(variables, tsdf, ring, curs, srcs, ridxs, gts):
                def sbody(carry, frame):
                    tsdf, ring = carry
                    cur, src, ridx, gt = frame
                    tsdf, ring, d = body(variables, tsdf, ring, cur, src,
                                         ridx, gt)
                    return (tsdf, ring), d
                (tsdf, ring), d = jax.lax.scan(
                    sbody, (tsdf, ring), (curs, srcs, ridxs, gts))
                return tsdf, ring, d
        else:
            @partial(jax.jit, donate_argnums=(1, 2))
            def frame_group(variables, tsdf, ring, curs, srcs, ridxs, gts):
                del gts
                def sbody(carry, frame):
                    tsdf, ring = carry
                    cur, src, ridx = frame
                    tsdf, ring, d = body(variables, tsdf, ring, cur, src,
                                         ridx, None)
                    return (tsdf, ring), d
                (tsdf, ring), d = jax.lax.scan(
                    sbody, (tsdf, ring), (curs, srcs, ridxs))
                return tsdf, ring, d
        return frame_group

    def frame_ref(i):
        return int(frames[i][0]["frame_id_string"][0])

    def src_ids(i):
        return [int(s) for s in frames[i][1]["frame_id_string"][0]]

    def stack_group(i0):
        group = frames[i0: i0 + FRAMES_PER_DISPATCH]
        curs = {k: jnp.asarray(np.stack([f[0][k] for f in group])) for k in CUR}
        srcs = {k: jnp.asarray(np.stack([f[1][k] for f in group])) for k in SRC}
        ridxs = np.stack([
            np.asarray(src_ids(i0 + j), np.int32) - frame_ref(i0 + j) + K_SRC
            for j in range(FRAMES_PER_DISPATCH)
        ])
        gts = jnp.asarray(np.stack(
            [np.nan_to_num(f[0]["depth_bhw1"][0]) for f in group]))
        return curs, srcs, jnp.asarray(ridxs), gts

    encode = jax.jit(
        lambda v, x: model.apply(
            v, x.astype(jnp.bfloat16), method=lambda m, xx: m.matching_model(xx))
    )

    def ring_for(i0):
        r0 = frame_ref(i0)
        imgs = []
        for fid in range(r0 - K_SRC, r0):
            i = fid - frame_ref(0)
            if i >= 0:
                imgs.append(frames[i][0]["image_bhw3"][0])
            else:
                j = src_ids(0).index(fid)
                imgs.append(frames[0][1]["image_bkhw3"][0, j])
        return encode(variables, jnp.asarray(np.stack(imgs)))

    groups = [stack_group(i * FRAMES_PER_DISPATCH) for i in range(NUM_GROUPS + 1)]

    # The TSDF is CHAINED through every dispatch in the process (warmup ->
    # trials -> next variant): bisected on hardware (probe_f, 2026-08-19) —
    # after the first dispatch, passing a fresh non-chained volume copy into
    # the donating frame_group trips an opaque axon INVALID_ARGUMENT at
    # fetch. bench.py's pattern (donate + always chain) is the reliable one.
    # Timing consequence: the volume content drifts across variants
    # (extra fusions), which does not change any stage's cost structure.
    tsdf = jax.block_until_ready(tsdf0.replace(
        values=tsdf0.values + np.float32(1e-11),
        weights=tsdf0.weights + np.float32(1e-11),
    ))

    which = sys.argv[1:] or list(BODIES)
    results = {}
    for name in which:
        body, with_gt = BODIES[name]
        fg = make_group(body, with_gt)
        _note(f"{name}: compile+warmup")
        tsdf, ring, d = fg(variables, tsdf, ring_for(
            NUM_GROUPS * FRAMES_PER_DISPATCH), *groups[-1])
        np.asarray(d[0])
        best = float("inf")
        for trial in range(2):
            ring = ring_for(0)
            t0 = time.perf_counter()
            n = 0
            for g in groups[:NUM_GROUPS]:
                tsdf, ring, d = fg(variables, tsdf, ring, *g)
                n += FRAMES_PER_DISPATCH
            np.asarray(d[0])
            np.asarray(tsdf.values[0, 0, 0])
            best = min(best, time.perf_counter() - t0)
        per_frame = best / n
        results[name] = per_frame
        print(f"{name}: {per_frame*1e3:.1f} ms/frame  ({n/best:.2f} maps/s)")

    if all(k in results for k in BODIES):
        full = results["full"]
        print("\nderived stage costs (ms/frame):")
        print(f"  hint (full - fwd_fuse):      {(full - results['fwd_fuse'])*1e3:.1f}")
        print(f"  hint (hint_fuse - fuse_only):{(results['hint_fuse'] - results['fuse_only'])*1e3:.1f}")
        print(f"  forward (full - hint_fuse):  {(full - results['hint_fuse'])*1e3:.1f}")
        print(f"  fuse (full - hint_fwd):      {(full - results['hint_fwd'])*1e3:.1f}")
        print(f"  fuse (fuse_only):            {results['fuse_only']*1e3:.1f}")


if __name__ == "__main__":
    main()
