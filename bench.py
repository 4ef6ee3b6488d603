"""Benchmark: depth maps/sec/chip at 512x384 through the flagship model.

Measures BOTH production inference modes on one real TPU chip:
  * incremental (the flagship DoubleTake loop): hint raycast + forward +
    TSDF fusion, sequentially chained through the volume — latency-bound
    by the frame->frame dependency;
  * batched no-hint: b frames through one jitted forward (the
    offline/two-pass throughput shape; reference analog test_no_hint /
    pass 1 of test_offline_two_pass).

Before timing, one frame is pushed through BOTH the fused Pallas cost
volume and the XLA path and the s0 depths compared — every bench run
doubles as an on-hardware kernel parity gate (fails loudly on drift).

Inputs are a fused synthetic scene (GT depths of 12 posed frames), not
noise: raycast hit rates, hint validity patterns, and any data-dependent
branch costs are realistic.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "extra"}.
value = incremental maps/s (continuity with BENCH_r01/r02); extra carries
the batched throughput and the parity numbers.

Methodology (PERF_NOTES.md): timing is CHAINED with a hard fetch at the
end; frames are processed in in-graph groups because this platform charges
a per-dispatch overhead that scales with program size. vs_baseline is
against the >100 maps/sec/chip target from BASELINE.md.
"""

import json
import sys
import time
from functools import partial

import numpy as np

FRAMES_PER_DISPATCH = 24  # amortizes the ~58 ms dispatch+fetch floor
                          # (measured: scripts/probe_scan_carry.py 'hoist'
                          # = 4.8 ms/frame at F=12) to ~2.4 ms/frame
NUM_GROUPS = 2
BATCH = 8
BATCH_REPS = 4
PARITY_P99_LIMIT = 1e-2  # meters, s0 depth, fused-fp32 vs XLA-fp32
# ~1.5x the observed kernel-only p99 (6.4 mm, BENCH_r03); the old 5 cm
# gate was 8x looser than reality. bf16 production deltas are gated
# separately (loose bound) and reported in extra.
ABS_DIFF_DELTA_LIMIT = 5e-4  # meters: fused-vs-XLA |Abs Diff| metric delta
# budget — BASELINE.md demands score parity "within 0.001" vs reference
# checkpoints, so the kernel may consume at most half that budget.


def _note(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    import os

    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    import jax.numpy as jnp

    from doubletake_tpu.data.loader import DataLoader
    from doubletake_tpu.datasets.synthetic import SyntheticDataset
    from doubletake_tpu.models.depth_model import DepthModelCVHint
    from doubletake_tpu.runners import incremental
    from doubletake_tpu.tools.tsdf import (
        TSDF, FusionConfig, auto_raycast_samples, integrate_depth, raycast,
    )

    from doubletake_tpu.checkpoints.io import cast_floating

    H, W = 384, 512
    # production config: fused Pallas volume + bf16 compute — the TPU
    # analog of the reference's fp16 inference (train.py:321 precision=16).
    # The fp32 XLA-path model is the parity oracle.
    model = DepthModelCVHint(fast_cost_volume=True, compute_dtype="bfloat16")
    model_xla = DepthModelCVHint(fast_cost_volume=False)

    # ---- synthetic scene frames (real images/poses, not noise) ----
    ds = SyntheticDataset(
        split="test", image_height=H, image_width=W,
        num_frames=FRAMES_PER_DISPATCH * (NUM_GROUPS + 1) + 8,
        tuple_size=model.model_num_views,
        pass_frame_id=True,
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
    # bf16 weights for the production model (runners/common._maybe_cast
    # does the same at checkpoint load)
    variables = cast_floating(variables32, jnp.bfloat16)

    # ---- initial volume: fuse GT depth of the first 12 frames ----
    tsdf0 = TSDF.from_bounds(
        dict(xmin=-3.2, xmax=3.2, ymin=-2.2, ymax=2.2, zmin=-0.1, zmax=3.1),
        0.02,
    )
    cfg = FusionConfig(min_depth=0.5, max_depth=3.5, extended_neg_truncation=True)
    fuse_gt = jax.jit(
        lambda v, d, c, k: integrate_depth(v, d, c, k, cfg), donate_argnums=0
    )
    _note("fusing GT volume")
    # Fuse the GT of ALL loaded frames, three times: the hint mechanism only
    # engages above sampled fusion weight 0.025 (reference
    # test_incremental.py:244), which at per-observation weight
    # confidence*2.5/100 needs ~10-20 observations per surface point. A
    # 12-frame-young volume leaves hint coverage at 0.12 — unrepresentative
    # of mid-scan incremental conditions, where fusion sees every captured
    # frame (~4x the keyframe tuples) and weights saturate (VERDICT r3 #7).
    for _ in range(3):
        for cur_np, _ in frames:
            tsdf0 = fuse_gt(
                tsdf0,
                jnp.asarray(np.nan_to_num(cur_np["depth_bhw1"][0])),
                jnp.asarray(cur_np["cam_T_world_b44"][0]),
                jnp.asarray(cur_np["K_s0_b44"][0]),
            )

    hint_h, hint_w = H // 4, W // 4  # matching res (see runners/incremental.py)
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

    # NOTE: jitted fns take `variables` (and any big batch dicts) as REAL
    # ARGUMENTS. Closed-over device arrays are embedded in the HLO as
    # constants: the serialized program then carries ~100 MB of weights,
    # which (a) overflows the axon remote-compile request limit (HTTP 413
    # at b=8) and (b) inflates every dispatch on a tunnel whose per-dispatch
    # cost scales with program size (PERF_NOTES).

    # ---- hardware parity gates ----
    # 1) KERNEL gate (hard): fused Pallas fp32 vs XLA fp32 — isolates the
    #    kernel numerics against the BASELINE 0.001 score budget.
    # 2) bf16 delta (reported, soft-gated): production runs bf16 (the
    #    reference's fp16-inference analog, train.py:321) and its metric
    #    delta on RANDOM-INIT weights is pessimistic — untrained outputs
    #    amplify rounding ~an order of magnitude vs trained checkpoints —
    #    so it is gated only at the loose regression bound below.
    model_f32 = DepthModelCVHint(fast_cost_volume=True)

    @jax.jit
    def parity_triple(v16, v32, tsdf, cur, src):
        hint = make_hint(tsdf, cur)
        d_16 = model.apply(v16, cur, src, hint=hint)["depth_pred_s0_bhw1"]
        d_f32 = model_f32.apply(v32, cur, src, hint=hint)["depth_pred_s0_bhw1"]
        d_slow = model_xla.apply(v32, cur, src, hint=hint)["depth_pred_s0_bhw1"]
        return d_16, d_f32, d_slow, hint["hint_mask_bhw1"]

    _note("parity triple compile+run")
    d_16, d_fast, d_slow, hint_mask = parity_triple(
        variables, variables32, tsdf0, cur0, src0)
    d_16 = np.asarray(d_16)
    d_fast, d_slow = np.asarray(d_fast), np.asarray(d_slow)
    diff = np.abs(d_fast - d_slow)
    parity_p99 = float(np.percentile(diff, 99))
    parity_mean = float(diff.mean())
    # hint coverage over several trajectory poses (the first frame looks
    # into the least-fused part of the scene and under-reports)
    cov_frames = [0, FRAMES_PER_DISPATCH // 2, FRAMES_PER_DISPATCH - 1]
    covs = [float(np.asarray(hint_mask).mean())]
    hint_fn = jax.jit(lambda t, c: make_hint(t, c)["hint_mask_bhw1"])
    for i in cov_frames[1:]:
        covs.append(float(np.asarray(
            hint_fn(tsdf0, dev(frames[i][0], CUR))).mean()))
    hint_coverage = float(np.mean(covs))
    if parity_p99 > PARITY_P99_LIMIT:
        print(json.dumps({
            "metric": "PARITY FAILURE: fused Pallas vs XLA s0 depth p99 (m)",
            "value": parity_p99, "unit": "m", "vs_baseline": 0.0,
        }))
        sys.exit(1)

    # ---- METRIC-level parity: what the kernel numerics do to the scores.
    # |pred_a - pred_b| overstates the effect on |pred - gt|; the BASELINE
    # "within 0.001" budget is on Abs Diff / delta<1.05 vs GT (reference
    # eval protocol: nearest-upsample pred to GT res, valid GT > 0.5 m).
    # The weights are untrained, but both paths share them, so the DELTA
    # between the paths' metrics isolates exactly the kernel contribution.
    def depth_metrics(pred_b1hw1, gt_bhw1):
        gt = gt_bhw1[0, ..., 0]
        ph, pw = pred_b1hw1.shape[1:3]
        gh, gw = gt.shape
        pred = pred_b1hw1[0, ..., 0][
            (np.arange(gh) * ph) // gh][:, (np.arange(gw) * pw) // gw]
        valid = np.isfinite(gt) & (gt > 0.5)
        pred, gt = pred[valid], gt[valid]
        ratio = np.maximum(pred / gt, gt / pred)
        return float(np.abs(pred - gt).mean()), float((ratio < 1.05).mean())

    gt0 = np.nan_to_num(np.asarray(frames[0][0]["depth_bhw1"]))
    abs_fast, d105_fast = depth_metrics(d_fast, gt0)
    abs_slow, d105_slow = depth_metrics(d_slow, gt0)
    abs_diff_delta = abs(abs_fast - abs_slow)
    if abs_diff_delta > ABS_DIFF_DELTA_LIMIT:
        print(json.dumps({
            "metric": "PARITY FAILURE: fused-vs-XLA Abs Diff metric delta (m)",
            "value": abs_diff_delta, "unit": "m", "vs_baseline": 0.0,
        }))
        sys.exit(1)

    # bf16 production vs fp32 fused: reported + loose regression bound.
    # On RANDOM-INIT weights this delta is pessimistic (measured 1.3 mm
    # round 4); scored evals run compute_dtype=float32 by default
    # (options.py), so the 0.001 budget is carried by the kernel gate
    # above — this one only catches order-of-magnitude bf16 regressions.
    abs_16, d105_16 = depth_metrics(d_16, gt0)
    bf16_abs_delta = abs(abs_16 - abs_fast)
    bf16_p99 = float(np.percentile(np.abs(d_16 - d_fast), 99))
    if bf16_abs_delta > 1e-2:
        print(json.dumps({
            "metric": "PARITY FAILURE: bf16-vs-fp32 Abs Diff metric delta (m)",
            "value": bf16_abs_delta, "unit": "m", "vs_baseline": 0.0,
        }))
        sys.exit(1)

    if "--parity-only" in sys.argv:
        print(json.dumps({
            "metric": "parity probe (no timing)", "value": parity_p99,
            "unit": "m p99", "vs_baseline": 1.0,
            "extra": {
                "pallas_vs_xla_s0_depth_p99_m": round(parity_p99, 5),
                "pallas_vs_xla_s0_depth_mean_m": round(parity_mean, 6),
                "abs_diff_delta_m": round(abs_diff_delta, 6),
                "bf16_abs_diff_delta_m": round(bf16_abs_delta, 6),
                "bf16_vs_fp32_s0_depth_p99_m": round(bf16_p99, 5),
                "hint_coverage": round(hint_coverage, 3),
            },
        }))
        return

    # ---- incremental mode: chained raycast -> forward -> fuse ----
    # Pipelined TPU-native structure (measured piecewise in
    # scripts/bench_incremental_parts.py, round 5):
    #   * ENCODE-AHEAD: the image-prior encoder + matching encoder depend
    #     only on the image, so they run BATCHED over the whole group
    #     before the scan (inside the same timed dispatch) — b=1 serial
    #     encodes waste the MXU (-7.6 ms/frame measured);
    #   * the scan body runs only the hint-dependent part (raycast -> CV ->
    #     CVEncoder -> decoder -> fuse);
    #   * src matching features come from a ring buffer carried through the
    #     scan (bit-identical reuse — tests/test_depth_model.py), ridx maps
    #     each frame's DVMVS-sorted src order to ring slots;
    #   * scan xs carry NO images — the model accepts image-free dicts when
    #     features are precomputed, so xs hold ~5 MB/frame of features
    #     instead of ~230 MB of stacked images.
    K_SRC = model.model_num_views - 1
    CUR_NOIMG = [k for k in CUR if k != "image_bhw3"]
    SRC_NOIMG = [k for k in SRC if k != "image_bkhw3"]

    def one_frame(variables, tsdf, ring, cur, src, ridx, cf, mf):
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
        return tsdf, ring, depth

    # lax.scan over frames, NOT a Python unroll: the unrolled 12-frame
    # program is ~12x the HLO and takes many minutes to remote-compile on
    # this tunnel (it timed out the driver); scan compiles the body once
    # and costs ~30 us/iteration of fixed overhead (PERF_NOTES dispatch
    # investigation).
    @partial(jax.jit, donate_argnums=(1, 2))
    def frame_group(variables, tsdf, ring, imgs, curs, srcs, ridxs):
        feats, mfeats = model.apply(
            variables, imgs, method=lambda m, x: m.encode_frame(x)
        )

        def body(carry, frame):
            tsdf, ring = carry
            cur, src, ridx, cf, mf = frame
            tsdf, ring, depth = one_frame(
                variables, tsdf, ring, cur, src, ridx, cf, mf
            )
            return (tsdf, ring), depth[0, 0, 0, 0]
        (tsdf, ring), d = jax.lax.scan(
            body, (tsdf, ring), (curs, srcs, ridxs, feats, mfeats))
        return tsdf, ring, d

    def frame_ref(i):
        """Global frame id of frames[i]'s cur (sliding-window tuples)."""
        return int(frames[i][0]["frame_id_string"][0])

    def src_ids(i):
        return [int(s) for s in frames[i][1]["frame_id_string"][0]]

    def stack_group(i0):
        """Frames i0..i0+F: (F, H, W, 3) images for the batched encode +
        image-free (F, 1, ...) pose/K stacks for the scan."""
        group = frames[i0: i0 + FRAMES_PER_DISPATCH]
        imgs = jnp.asarray(np.stack([f[0]["image_bhw3"][0] for f in group]))
        curs = {k: jnp.asarray(np.stack([f[0][k] for f in group]))
                for k in CUR_NOIMG}
        srcs = {k: jnp.asarray(np.stack([f[1][k] for f in group]))
                for k in SRC_NOIMG}
        # ring slot of src id s when processing ref r: ring holds frames
        # r-K_SRC .. r-1 at positions 0..K_SRC-1
        ridxs = np.stack([
            np.asarray(src_ids(i0 + j), np.int32) - frame_ref(i0 + j) + K_SRC
            for j in range(FRAMES_PER_DISPATCH)
        ])
        assert ridxs.min() >= 0 and ridxs.max() < K_SRC, ridxs
        return imgs, curs, srcs, jnp.asarray(ridxs)

    encode = jax.jit(
        lambda v, x: model.apply(
            v, x.astype(jnp.bfloat16),  # model entry casts images likewise
            method=lambda m, xx: m.matching_model(xx))
    )

    def ring_for(i0):
        """Matching features of frames ref-K..ref-1 (ref = frames[i0] cur id),
        encoded one-off outside the timed loop — in production these were
        computed when each frame was the cur frame."""
        r0 = frame_ref(i0)
        imgs = []
        for fid in range(r0 - K_SRC, r0):
            i = fid - frame_ref(0)
            if i >= 0:
                imgs.append(frames[i][0]["image_bhw3"][0])
            else:  # pre-history frames only exist as srcs of frames[0]
                j = src_ids(0).index(fid)
                imgs.append(frames[0][1]["image_bkhw3"][0, j])
        return encode(variables, jnp.asarray(np.stack(imgs)))

    # ring_for/ridxs index ring slots by fid - frame_ref(0): the ring
    # advances one slot per scan step, so cur ids must be globally
    # consecutive across the whole frames list, not just within a group
    for i in range(len(frames) - 1):
        assert frame_ref(i + 1) == frame_ref(i) + 1, (i, frame_ref(i), frame_ref(i + 1))
    groups = [stack_group(i * FRAMES_PER_DISPATCH)
              for i in range(NUM_GROUPS + 1)]

    _note("frame_group compile+warmup")
    tsdf, ring, depth = frame_group(
        variables, tsdf0, ring_for(NUM_GROUPS * FRAMES_PER_DISPATCH),
        *groups[-1],
    )
    np.asarray(depth[0])

    _note("timing incremental")
    ring = ring_for(0)
    t0 = time.perf_counter()
    n = 0
    for g in groups[:NUM_GROUPS]:
        tsdf, ring, depth = frame_group(variables, tsdf, ring, *g)
        n += FRAMES_PER_DISPATCH
    np.asarray(depth[0])
    np.asarray(tsdf.values[0, 0, 0])
    dt = time.perf_counter() - t0
    incremental_mps = n / dt

    # ---- batched no-hint throughput (offline/two-pass shape) ----
    bloader = DataLoader(ds, batch_size=BATCH, shuffle=False, num_workers=4)
    bcur_np, bsrc_np = next(iter(bloader))
    bcur, bsrc = dev(bcur_np, CUR), dev(bsrc_np, SRC)

    # Single-rep program (the BATCH_REPS-unrolled variant exceeds the axon
    # remote-compile request limit — HTTP 413); reps are chained ACROSS
    # dispatches instead: each call's input depends on the previous call's
    # output, so the async-dispatch illusion cannot hide the real work, and
    # the per-dispatch overhead is honestly amortized over BATCH maps.
    @jax.jit
    def batched_forward(variables, cur, src):
        out = model.apply(variables, cur, src)
        return out["depth_pred_s0_bhw1"]

    # fp32 variant: scored evals default to compute_dtype=float32
    # (options.py), so the scored configuration gets its own measured
    # number alongside the bf16 production headline (ADVICE r4).
    @jax.jit
    def batched_forward_f32(variables, cur, src):
        out = model_f32.apply(variables, cur, src)
        return out["depth_pred_s0_bhw1"]

    def batched_chain(cur, fwd, var):
        d = None
        for _ in range(BATCH_REPS):
            d = fwd(var, cur, bsrc)
            cur = dict(cur, image_bhw3=cur["image_bhw3"] + d[:, :1, :1] * 1e-30)
        return d

    _note("batched compile+warmup")
    d = batched_chain(bcur, batched_forward, variables)
    np.asarray(d[0, 0, 0, 0])  # warmup
    t0 = time.perf_counter()
    d = batched_chain(bcur, batched_forward, variables)
    np.asarray(d[0, 0, 0, 0])
    dt = time.perf_counter() - t0
    batched_mps = BATCH * BATCH_REPS / dt

    _note("batched fp32 compile+warmup")
    d = batched_chain(bcur, batched_forward_f32, variables32)
    np.asarray(d[0, 0, 0, 0])
    t0 = time.perf_counter()
    d = batched_chain(bcur, batched_forward_f32, variables32)
    np.asarray(d[0, 0, 0, 0])
    dt = time.perf_counter() - t0
    batched_mps_f32 = BATCH * BATCH_REPS / dt

    # ---- MFU (VERDICT r4 #4): XLA's flop count for one full forward
    # (encoders + CV + decoder), against the v5e bf16 peak. The incremental
    # headline additionally raycasts + fuses, so its true utilization is
    # slightly higher than reported here.
    fwd_tflops = mfu_inc = mfu_batched = None
    try:
        ca = (
            jax.jit(lambda v, c, s: model.apply(v, c, s))
            .lower(variables, cur0, src0).compile().cost_analysis()
        )
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        fwd_tflops = float(ca["flops"]) / 1e12
        V5E_PEAK_TFLOPS = 197.0  # bf16
        mfu_inc = incremental_mps * fwd_tflops / V5E_PEAK_TFLOPS
        mfu_batched = batched_mps * fwd_tflops / V5E_PEAK_TFLOPS
    except Exception as e:  # cost_analysis is backend-dependent
        _note(f"cost_analysis unavailable: {e}")

    target = 100.0  # BASELINE.md: >100 depth maps/sec/chip at 512x384
    print(json.dumps({
        "metric": "depth maps/sec/chip (incremental pipeline, 512x384)",
        "value": round(incremental_mps, 2),
        "unit": "maps/s",
        "vs_baseline": round(incremental_mps / target, 3),
        "extra": {
            "batched_no_hint_maps_per_sec": round(batched_mps, 2),
            "batched_no_hint_maps_per_sec_fp32": round(batched_mps_f32, 2),
            "batch": BATCH,
            "pallas_vs_xla_s0_depth_p99_m": round(parity_p99, 5),
            "pallas_vs_xla_s0_depth_mean_m": round(parity_mean, 6),
            "abs_diff_fused_m": round(abs_fast, 5),
            "abs_diff_xla_m": round(abs_slow, 5),
            "abs_diff_delta_m": round(abs_diff_delta, 6),
            "delta105_fused": round(d105_fast, 4),
            "delta105_xla": round(d105_slow, 4),
            "bf16_abs_diff_delta_m": round(bf16_abs_delta, 6),
            "bf16_vs_fp32_s0_depth_p99_m": round(bf16_p99, 5),
            "compute_dtype_timed": "bfloat16",
            "hint_coverage": round(hint_coverage, 3),
            "frames_per_dispatch": FRAMES_PER_DISPATCH,
            "forward_tflops_per_map": (
                round(fwd_tflops, 4) if fwd_tflops else None
            ),
            "mfu_incremental": round(mfu_inc, 4) if mfu_inc else None,
            "mfu_batched": round(mfu_batched, 4) if mfu_batched else None,
        },
    }))


if __name__ == "__main__":
    main()
