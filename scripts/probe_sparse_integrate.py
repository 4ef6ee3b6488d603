"""On-chip parity probe for the block-sparse fused integrate.

Chains 3 realistic-pose frames through fused_integrate with sparse=True
(compacted block ids + trailing repeats — exercises the TPU pipeline's
revisit elision) and sparse=False (identity ids), plus the XLA dense path,
and compares all three. sparse-vs-dense fused must be ~bit-identical: the
same blocks run the same math, only the visit order differs.
"""
import sys, time
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from doubletake_tpu.tools.tsdf import TSDF, FusionConfig, integrate_depth
from doubletake_tpu.ops.pallas.integrate import fused_integrate


def main():
    tsdf = TSDF.from_bounds(
        dict(xmin=-3.2, xmax=3.2, ymin=-3.2, ymax=3.2, zmin=0.0, zmax=2.88),
        0.04,
    )
    X, Y, Z = tsdf.values.shape
    print(f"dims {X}x{Y}x{Z} = {X*Y*Z/1e6:.1f}M voxels", flush=True)
    cfg = FusionConfig(min_depth=0.5, max_depth=3.5, extended_neg_truncation=True)
    K = jnp.asarray(np.array(
        [[128, 0, 128, 0], [0, 128, 96, 0], [0, 0, 1, 0], [0, 0, 0, 1]],
        np.float32))
    rng = np.random.RandomState(0)
    H, W = 192, 256

    trunc = cfg.truncation_voxels * tsdf.voxel_size
    frames = []
    for f in range(3):
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        d = (1.6 + 0.4 * np.sin(xs / 23.0 + f) + 0.3 * np.cos(ys / 17.0 - f))
        # irrational-ish pose components: an axis-aligned camera over a
        # grid-aligned volume puts voxel projections exactly on half-pixel
        # rint ties (XLA-vs-Mosaic fma noise then flips ~3% of samples —
        # measured); realistic poses have ~1e-5 tie rates.
        pose = np.eye(4, dtype=np.float32)
        th = 0.15 * f + 0.0731
        ph = 0.0417 - 0.03 * f
        Ry = np.array([[np.cos(th), 0, np.sin(th)], [0, 1, 0],
                       [-np.sin(th), 0, np.cos(th)]], np.float32)
        Rx = np.array([[1, 0, 0], [0, np.cos(ph), -np.sin(ph)],
                       [0, np.sin(ph), np.cos(ph)]], np.float32)
        pose[:3, :3] = Ry @ Rx
        pose[0, 3] = 0.1 * f + 0.0137
        pose[1, 3] = 0.00791
        pose[2, 3] = -0.0213
        frames.append((jnp.asarray(d.astype(np.float32)),
                       jnp.asarray(np.linalg.inv(pose))))

    def run_fused(sparse):
        vals, wts = tsdf.values, tsdf.weights
        for d, c_T_w in frames:
            # precision=HIGHEST, matching tsdf.integrate_depth (_PREC):
            # a default-precision matmul bf16-rounds the projection matrix
            # itself, which flips ~4% of nearest-pixel samples vs the XLA
            # reference (measured on-chip) — a probe artifact, not kernel drift.
            P_34 = jnp.matmul(K, c_T_w, precision=jax.lax.Precision.HIGHEST)[:3]
            vals, wts = fused_integrate(
                vals, wts, d, P_34, tsdf.origin,
                voxel_size=tsdf.voxel_size, min_depth=cfg.min_depth,
                max_depth=cfg.max_depth, truncation=trunc,
                trunc_check=-trunc * 1.5,
                w_rate=cfg.update_rate / cfg.max_weight, sparse=sparse)
        return np.asarray(jax.block_until_ready(vals)), np.asarray(wts)

    t0 = time.time()
    vd, wd = run_fused(False)
    print(f"dense fused done {time.time()-t0:.0f}s", flush=True)
    t0 = time.time()
    vs, ws = run_fused(True)
    print(f"sparse fused done {time.time()-t0:.0f}s", flush=True)

    t = tsdf
    for d, c_T_w in frames:
        t = integrate_depth(t, d[..., None], c_T_w, K, cfg, use_pallas=False)
    vx = np.asarray(jax.block_until_ready(t.values))

    dv = np.abs(vs - vd)
    print(f"sparse vs dense fused: max {dv.max():.3e}  mismatch "
          f"{(dv > 1e-6).mean():.2e}", flush=True)
    dxl = np.abs(vs - vx)
    print(f"sparse vs XLA: mean {dxl.mean():.3e}  p99.9 "
          f"{np.percentile(dxl, 99.9):.3e}  mismatch>1e-3 "
          f"{(dxl > 1e-3).mean():.2e}", flush=True)
    wmax = np.abs(ws - wd).max()
    print(f"weights sparse vs dense max {wmax:.3e}", flush=True)
    ok = dv.max() < 1e-5 and np.percentile(dxl, 99.9) < 1e-3
    print("OK" if ok else "FAIL", flush=True)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
