"""Decompose fused_integrate's ~23 ms/frame marginal on-chip.

Variants (18.5M-voxel volume, 192x256 depth, realistic near-identity poses,
chained marginals per bench_stages method):

  sparse      production: block-sparse grid, realistic pose
  dense       identity-order grid, realistic pose (sparse win = dense-sparse)
  away_dense  camera looks away: EVERY sub-tile takes the flag==0 skip path
              but every block is still visited -> streaming + skip-path
              update + per-sub-tile branch floor
  away_sparse away + sparse: ~no blocks visited -> host flag precompute +
              pallas pipeline fixed cost

Derived: active-tile sampling work = dense - away_dense;
         skip/update/streaming floor = away_dense - away_sparse;
         host precompute + pipeline = away_sparse.
"""

import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench_stages import _cache, marginal  # noqa: E402

from doubletake_tpu.tools.tsdf import TSDF, FusionConfig  # noqa: E402
from doubletake_tpu.ops.pallas.integrate import fused_integrate  # noqa: E402


def _note(m):
    print(f"[ip {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def main():
    _cache()
    tsdf = TSDF.from_bounds(
        dict(xmin=-3.2, xmax=3.2, ymin=-2.2, ymax=2.2, zmin=-0.1, zmax=3.1),
        0.02,
    )
    X, Y, Z = tsdf.values.shape
    _note(f"dims {X}x{Y}x{Z} = {X*Y*Z/1e6:.1f}M voxels")
    cfg = FusionConfig(min_depth=0.5, max_depth=3.5, extended_neg_truncation=True)
    trunc = cfg.truncation_voxels * tsdf.voxel_size
    K = jnp.asarray(np.array(
        [[128, 0, 128, 0], [0, 128, 96, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32))
    rng = np.random.RandomState(0)
    max_reps = 4
    depths = jnp.asarray(
        rng.rand(max_reps, 192, 256).astype(np.float32) * 2 + 0.8)

    def poses_for(away):
        poses = np.tile(np.eye(4, dtype=np.float32), (max_reps, 1, 1))
        poses[:, 0, 3] = rng.randn(max_reps) * 0.05
        if away:
            flip = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
            for i in range(max_reps):
                w_T_c = np.eye(4, dtype=np.float32) @ flip
                w_T_c[2, 3] = -5.0
                poses[i] = np.linalg.inv(w_T_c)
        return jnp.asarray(poses)

    v0 = jax.block_until_ready(tsdf.values.reshape(X, Y, Z))
    w0 = jax.block_until_ready(tsdf.weights)

    which = sys.argv[1:] or ["sparse", "dense", "away_dense", "away_sparse"]
    for name in which:
        away = name.startswith("away")
        sparse = name.endswith("sparse")
        poses = poses_for(away)

        def mk(reps, sparse=sparse, poses=poses):
            @jax.jit
            def fn(vals, wts, ds, ps):
                v, w = vals, wts
                for i in range(reps):
                    P_34 = jnp.matmul(
                        K, ps[i], precision=jax.lax.Precision.HIGHEST)[:3]
                    v, w = fused_integrate(
                        v, w, ds[i], P_34, tsdf.origin,
                        voxel_size=tsdf.voxel_size, min_depth=cfg.min_depth,
                        max_depth=cfg.max_depth, truncation=trunc,
                        trunc_check=-trunc * 1.5,
                        w_rate=cfg.update_rate / cfg.max_weight,
                        sparse=sparse)
                return v
            return lambda: fn(v0, w0, depths, poses)

        m, times = marginal(mk)
        _note(f"{name}: marginal {m*1e3:.1f} ms {times}")


if __name__ == "__main__":
    main()
