"""Benchmark: depth maps/sec/chip at 512x384 through the flagship model.

Measures the incremental-mode device pipeline (hint raycast + DoubleTake
forward + TSDF fusion, sequentially chained through the TSDF) and prints
ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Methodology notes (see PERF_NOTES.md):
  * timing is CHAINED (each frame's TSDF feeds the next) and ends with a
    hard np.asarray fetch — unchained timing on the axon platform reports
    microseconds regardless of actual work;
  * this platform charges a large per-dispatch overhead that scales with
    program size (~1.3 s for the full model), so frames are processed in
    in-graph groups of FRAMES_PER_DISPATCH — the production pattern for
    offline/throughput processing. vs_baseline is against the >100
    maps/sec/chip target from BASELINE.md.
"""

import json
import time
from functools import partial

import numpy as np

FRAMES_PER_DISPATCH = 12
NUM_GROUPS = 2  # warmup group + 2 timed groups = 36 frames total


def main():
    import os

    import jax

    # persistent compile cache: repeat runs (and driver runs in this
    # container) skip the multi-minute first compile
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    import jax.numpy as jnp

    from doubletake_tpu.models.depth_model import DepthModelCVHint
    from doubletake_tpu.runners import incremental
    from doubletake_tpu.tools.tsdf import TSDF, FusionConfig, integrate_depth, raycast

    H, W = 384, 512
    model = DepthModelCVHint(fast_cost_volume=True)

    from __graft_entry__ import _example_batch

    cur, src = _example_batch(1, H, W, model.model_num_views)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), cur, src)

    tsdf0 = TSDF.from_bounds(
        dict(xmin=-4.0, xmax=4.0, ymin=-3.0, ymax=3.0, zmin=0.0, zmax=3.0), 0.02
    )
    cfg = FusionConfig(min_depth=0.5, max_depth=3.5, extended_neg_truncation=True)

    hint_h, hint_w = H // 4, W // 4  # matching res (see runners/incremental.py)

    def one_frame(tsdf, image):
        c = dict(cur)
        c["image_bhw3"] = image[None]
        hint_d, hint_wt, hint_v = raycast(
            tsdf, c["world_T_cam_b44"][0], c["invK_s0_b44"][0],
            hint_h, hint_w, min_depth=0.5, max_depth=3.5, num_samples=256,
        )
        valid = hint_v & (hint_wt >= incremental.HINT_WEIGHT_THRESHOLD)
        hint = {
            "depth_hint_bhw1": jnp.where(valid, hint_d, jnp.nan)[None, ..., None],
            "hint_mask_bhw1": valid[None, ..., None],
            "sampled_weights_bhw1": jnp.where(valid, hint_wt, 0.0)[None, ..., None],
        }
        out = model.apply(variables, c, src, hint=hint)
        depth = out["depth_pred_s0_bhw1"]
        tsdf = integrate_depth(
            tsdf, depth[0], c["cam_T_world_b44"][0], c["K_s0_b44"][0], cfg
        )
        return tsdf, depth

    @partial(jax.jit, donate_argnums=(0,))
    def frame_group(tsdf, images):
        depth = None
        for f in range(FRAMES_PER_DISPATCH):
            tsdf, depth = one_frame(tsdf, images[f])
        return tsdf, depth

    rng = np.random.RandomState(1)
    groups = [
        jnp.asarray(rng.randn(FRAMES_PER_DISPATCH, H, W, 3).astype(np.float32))
        for _ in range(NUM_GROUPS + 1)
    ]

    # warm up / compile
    tsdf, depth = frame_group(tsdf0, groups[-1])
    np.asarray(depth[0, 0, 0, 0])

    t0 = time.perf_counter()
    n = 0
    for g in groups[:NUM_GROUPS]:
        tsdf, depth = frame_group(tsdf, g)
        n += FRAMES_PER_DISPATCH
    np.asarray(depth[0, 0, 0, 0])
    np.asarray(tsdf.values[0, 0, 0])
    dt = time.perf_counter() - t0

    maps_per_sec = n / dt
    target = 100.0  # BASELINE.md: >100 depth maps/sec/chip at 512x384
    print(json.dumps({
        "metric": "depth maps/sec/chip (incremental pipeline, 512x384)",
        "value": round(maps_per_sec, 2),
        "unit": "maps/s",
        "vs_baseline": round(maps_per_sec / target, 3),
    }))


if __name__ == "__main__":
    main()
