"""Why does carrying the TSDF through a lax.scan cost ~16.5 ms/frame?

bench_incremental_parts 'noop' (body: one .at[0,0,0].add on values) measured
16.5 ms/frame — pure carry overhead every pipeline variant sits on. This
probe isolates the mechanics on volume-shaped arrays (71680, 160) f32:

  hoist      carry untouched (XLA hoists; floor)
  scatter    v.at[0,0].add(eps)        — scatter forces a full copy
  elemwise   v + eps                    — full elementwise pass
  pallas     fused_integrate on flat arrays (no TSDF/reshape)
  pallas3d   integrate_depth on the TSDF pytree (reshape path, production)
  z256       elemwise at Z=256 (lane-aligned) — lane-padding tax probe

Chained dispatches, hard fetch, 12-iteration scans, min of 2 trials.
"""

import os as _os
import sys
import time
from functools import partial

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

F = 12


def _note(m):
    print(f"[carry {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def main():
    cache_dir = _os.path.join(
        _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from doubletake_tpu.tools.tsdf import TSDF, FusionConfig, integrate_depth
    from doubletake_tpu.ops.pallas.integrate import fused_integrate

    X, Y, Z = 320, 224, 160
    N = X * Y
    cfg = FusionConfig(min_depth=0.5, max_depth=3.5, extended_neg_truncation=True)
    rng = np.random.RandomState(0)
    K = np.array([[0.58 * 512, 0, 256, 0], [0, 0.58 * 512, 192, 0],
                  [0, 0, 1, 0], [0, 0, 0, 1]], np.float32)
    K44 = jnp.asarray(K)
    depths = jnp.asarray(rng.rand(F, 192, 256, 1).astype(np.float32) * 2 + 0.8)
    poses = np.tile(np.eye(4, dtype=np.float32), (F, 1, 1))
    poses[:, 0, 3] = rng.randn(F) * 0.05
    poses = jnp.asarray(poses)
    origin = jnp.asarray([-3.2, -2.24, -0.1], jnp.float32)
    trunc = 3.0 * 0.02 * 1.5

    def scanner(body, carry):
        @partial(jax.jit, donate_argnums=(0,))
        def run(carry, ds, ps):
            def sbody(c, frame):
                d, p = frame
                c = body(c, d, p)
                return c, d[0, 0, 0]
            c, out = jax.lax.scan(sbody, carry, (ds, ps))
            return c, out
        return run

    def timeit(name, body, carry0):
        run = scanner(body, carry0)
        _note(f"{name}: compile+warmup")
        carry, out = run(carry0, depths, poses)
        np.asarray(out[0])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            carry, out = run(carry, depths + np.float32(1e-9), poses)
            np.asarray(out[0])
            leaf = jax.tree_util.tree_leaves(carry)[0]
            np.asarray(leaf.reshape(-1)[0])
            best = min(best, time.perf_counter() - t0)
        print(f"{name}: {best / F * 1e3:.2f} ms/frame")
        return carry

    which = sys.argv[1:] or ["hoist", "scatter", "elemwise", "pallas",
                             "pallas3d", "z256"]

    def flat(z=Z):
        v = jnp.full((N, z), -1.0, jnp.float32)
        w = jnp.zeros((N, z), jnp.float32)
        return jax.block_until_ready((v, w))

    if "hoist" in which:
        timeit("hoist (carry untouched)",
               lambda c, d, p: c, flat())
    if "scatter" in which:
        timeit("scatter .at[0,0].add",
               lambda c, d, p: (c[0].at[0, 0].add(d[0, 0, 0] * 1e-30), c[1]),
               flat())
    if "elemwise" in which:
        timeit("elemwise v + eps",
               lambda c, d, p: (c[0] + d[0, 0, 0] * 1e-30, c[1]), flat())
    if "z256" in which:
        timeit("elemwise v + eps (Z=256)",
               lambda c, d, p: (c[0] + d[0, 0, 0] * 1e-30, c[1]), flat(256))
    if "pallas" in which:
        def body(c, d, p):
            v, w = c
            P34 = jnp.matmul(K44, p)[:3]
            nv, nw = fused_integrate(
                v.reshape(X, Y, Z), w.reshape(X, Y, Z), d[..., 0], P34,
                origin, voxel_size=0.02, min_depth=0.5, max_depth=3.5,
                truncation=trunc, trunc_check=-trunc * 1.5, w_rate=2.5 / 100.0,
            )
            return (nv.reshape(N, Z), nw.reshape(N, Z))
        timeit("pallas fused_integrate (flat carry)", body, flat())
    if "pallas3d" in which:
        t0_ = TSDF(values=jnp.full((X, Y, Z), -1.0), weights=jnp.zeros((X, Y, Z)),
                   origin=origin, voxel_size=0.02)
        t0_ = jax.block_until_ready(t0_)
        def body3(c, d, p):
            return integrate_depth(c, d, p, K44, cfg)
        timeit("integrate_depth (TSDF carry, production path)", body3, t0_)
    if "trajectory" in which:
        # the EXACT frames bench_incremental_parts fuses (synthetic
        # trajectory GT + poses + its K): isolates whether the 42 ms/frame
        # in-scan integrate comes from the pose-dependent flag distribution
        from doubletake_tpu.data.loader import DataLoader
        from doubletake_tpu.datasets.synthetic import SyntheticDataset
        ds = SyntheticDataset(split="test", image_height=384, image_width=512,
                              num_frames=F + 8, tuple_size=8,
                              pass_frame_id=True)
        loader = DataLoader(ds, batch_size=1, shuffle=False, num_workers=4)
        fr = []
        for cur_np, _src in loader:
            fr.append(cur_np)
            if len(fr) >= F:
                break
        gts = jnp.asarray(np.stack(
            [np.nan_to_num(f["depth_bhw1"][0]) for f in fr]))
        tposes = jnp.asarray(np.stack([f["cam_T_world_b44"][0] for f in fr]))
        tK = jnp.asarray(fr[0]["K_s0_b44"][0])
        t0_ = TSDF.from_bounds(
            dict(xmin=-3.2, xmax=3.2, ymin=-2.2, ymax=2.2,
                 zmin=-0.1, zmax=3.1), 0.02)
        t0_ = jax.block_until_ready(t0_)

        def body4(c, d, p):
            return integrate_depth(c, d, p, tK, cfg)

        imgs = jnp.asarray(np.stack([f["image_bhw3"] for f in fr]))
        simgs = jnp.asarray(np.concatenate(
            [np.stack([f["image_bhw3"]] * 7, 1) for f in fr])[:, None][:, 0]
        )[:, None].reshape(F, 1, 7, 384, 512, 3)

        def run_traj(name, body_xtra):
            @partial(jax.jit, donate_argnums=(0,))
            def run(carry, ds, ps, im, sim):
                def sbody(c, frame):
                    d, p, i1, i2 = frame
                    c, d = body_xtra(c, d, p, i1, i2)
                    return c, d[0, 0, 0]
                c, out = jax.lax.scan(sbody, carry, (ds, ps, im, sim))
                return c, out
            t0_l = jax.block_until_ready(TSDF.from_bounds(
                dict(xmin=-3.2, xmax=3.2, ymin=-2.2, ymax=2.2,
                     zmin=-0.1, zmax=3.1), 0.02))
            _note(f"{name}: compile+warmup")
            carry, out = run(t0_l, gts, tposes, imgs, simgs)
            np.asarray(out[0])
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                carry, out = run(carry, gts + np.float32(1e-9), tposes,
                                 imgs, simgs)
                np.asarray(out[0])
                np.asarray(carry.values.reshape(-1)[0])
                best = min(best, time.perf_counter() - t0)
            print(f"{name}: {best / F * 1e3:.2f} ms/frame")

        def plain(c, d, p, i1, i2):
            return integrate_depth(c, d, p, tK, cfg), d

        def used(c, d, p, i1, i2):
            d = d + (i1[0, 0, 0, 0] + i2[0, 0, 0, 0, 0]) * 1e-30
            return integrate_depth(c, d, p, tK, cfg), d

        run_traj("trajectory integrate", plain)          # baseline, F=12
        run_traj("trajectory + unused image xs", plain)  # DCE test: same
        run_traj("trajectory + used image xs", used)     # slicing cost test


if __name__ == "__main__":
    main()
