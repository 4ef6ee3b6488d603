"""Benchmark: depth maps/sec/chip at 512x384 through the flagship model.

Measures the steady-state incremental-mode device pipeline (hint raycast +
DoubleTake forward + TSDF fusion as one fused step — the reference's
flagship online mode) on the default JAX device, with realistic synthetic
inputs, and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is measured against the >100 maps/sec/chip target from
BASELINE.md (the reference does not publish runtime numbers; see
BASELINE.md "Runtime").
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from doubletake_tpu.models.depth_model import DepthModelCVHint
    from doubletake_tpu.runners import incremental
    from doubletake_tpu.tools.tsdf import TSDF, FusionConfig

    H, W = 384, 512
    model = DepthModelCVHint()

    from __graft_entry__ import _example_batch

    cur, src = _example_batch(1, H, W, model.model_num_views)
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), cur, src)

    tsdf = TSDF.from_bounds(
        dict(xmin=-4.0, xmax=4.0, ymin=-3.0, ymax=3.0, zmin=0.0, zmax=3.0), 0.02
    )
    cfg = FusionConfig(min_depth=0.5, max_depth=3.5, extended_neg_truncation=True)
    step = incremental.make_step(model, cfg, H // 2, W // 2, 256, 3.5)

    # warm up + compile
    out, hint, tsdf = step(variables, tsdf, cur, src)
    jax.block_until_ready(out["depth_pred_s0_bhw1"])

    # steady state: new host inputs every frame (realistic transfer included)
    frames = []
    rng = np.random.RandomState(1)
    for i in range(20):
        c = dict(cur)
        c["image_bhw3"] = jnp.asarray(
            rng.randn(1, H, W, 3).astype(np.float32)
        )
        frames.append(c)

    t0 = time.perf_counter()
    n = 0
    for c in frames:
        out, hint, tsdf = step(variables, tsdf, c, src)
        n += 1
    # hard fetch: device_get defeats any asynchronous-dispatch illusions
    # (the TSDF chaining already serializes frames; this makes the final
    # sync unambiguous)
    np.asarray(out["depth_pred_s0_bhw1"])
    np.asarray(tsdf.values[0, 0, 0])
    dt = time.perf_counter() - t0

    maps_per_sec = n / dt
    target = 100.0  # BASELINE.md: >100 depth maps/sec/chip at 512x384
    print(json.dumps({
        "metric": "depth maps/sec/chip (incremental step, 512x384)",
        "value": round(maps_per_sec, 2),
        "unit": "maps/s",
        "vs_baseline": round(maps_per_sec / target, 3),
    }))


if __name__ == "__main__":
    main()
