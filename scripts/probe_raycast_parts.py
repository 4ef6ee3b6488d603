"""Decompose raycast_table's ~17-18 ms/frame on-chip: gathers vs VPU vs
table build vs reductions.

Variants (all at bench shapes: 96x128 hint, ns=160 -> Sc=40, 11.3M-voxel
volume), each timed as an in-graph chained marginal (bench_stages method):

  table     build_ray_table alone (volume repack, bandwidth-bound)
  full      raycast_table (dense coarse)
  gathers   coarse-pass gathers ONLY (take + sum of rows; no trilinear)
  vpu       trilinear math on CONTIGUOUS rows (gather replaced by a cheap
            arange-mod index): isolates the VPU/layout cost
  coarse20  raycast with num_samples=80 (Sc=20): slope vs sample count
            separates per-sample cost from fixed cost

Interpretation: if (full - vpu) ~ (gathers - contiguous-take baseline),
gathers dominate and a Pallas/mip attack on sampling pays; if full ~ vpu,
the cost is the elementwise lane math and the fix is restructuring
_trilinear_from_row (fewer passes, bf16 lanes).
"""

import os as _os
import sys
import time

sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from bench_stages import _cache, marginal  # noqa: E402  (scripts/ sibling)

from doubletake_tpu.tools.tsdf import (  # noqa: E402
    TSDF, FusionConfig, build_ray_table, integrate_depth, raycast_table,
    _trilinear_from_row,
)

HINT_H, HINT_W = 96, 128
NS = 160


def _note(m):
    print(f"[rc {time.strftime('%H:%M:%S')}] {m}", file=sys.stderr, flush=True)


def main():
    _cache()
    tsdf = TSDF.from_bounds(
        dict(xmin=-3.2, xmax=3.2, ymin=-2.2, ymax=2.2, zmin=-0.1, zmax=3.1),
        0.02,
    )
    cfg = FusionConfig(min_depth=0.5, max_depth=3.5, extended_neg_truncation=True)
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 0.6 * HINT_W
    K[0, 2], K[1, 2] = HINT_W / 2, HINT_H / 2
    invK = jnp.asarray(np.linalg.inv(K))
    rng = np.random.RandomState(0)

    # fuse a few frames so rays actually cross surfaces
    d = (1.6 + 0.4 * np.sin(np.arange(HINT_W * 2)[None, :] / 23.0)
         + 0.3 * np.cos(np.arange(HINT_H * 2)[:, None] / 17.0)).astype(np.float32)
    _note("fusing warm volume")
    for f in range(4):
        pose = np.eye(4, dtype=np.float32)
        pose[0, 3] = 0.1 * f + 0.013
        Kf = np.eye(4, dtype=np.float32)
        Kf[0, 0] = Kf[1, 1] = 0.6 * HINT_W * 2
        Kf[0, 2], Kf[1, 2] = HINT_W, HINT_H
        tsdf = integrate_depth(
            tsdf, jnp.asarray(d)[..., None], jnp.asarray(np.linalg.inv(pose)),
            jnp.asarray(Kf), cfg)
    tsdf = jax.block_until_ready(tsdf)

    max_reps = 4
    poses = np.tile(np.eye(4, dtype=np.float32), (max_reps, 1, 1))
    poses[:, 0, 3] = rng.randn(max_reps) * 0.05
    poses = jnp.asarray(poses)

    which = sys.argv[1:] or ["table", "full", "gathers", "vpu", "coarse20"]

    if "table" in which:
        def mk(reps):
            @jax.jit
            def fn(vals):
                acc = jnp.float32(0)
                v = vals
                for i in range(reps):
                    rt = build_ray_table(tsdf.replace(values=v))
                    acc = acc + rt.table[0, 0].astype(jnp.float32)
                    v = v + acc * 1e-30  # chain
                return acc
            return lambda: fn(tsdf.values)
        m, times = marginal(mk)
        _note(f"table build marginal {m*1e3:.1f} ms {times}")

    rt0 = jax.block_until_ready(build_ray_table(tsdf))

    def chain_pose(i, acc):
        p = poses[i]
        return p.at[0, 3].add(acc * 1e-30)

    if "full" in which or "coarse20" in which:
        for ns, tag in [(NS, "full"), (80, "coarse20")]:
            if tag not in which:
                continue
            def mk(reps, ns=ns):
                @jax.jit
                def fn(table):
                    rt = rt0.replace(table=table)
                    acc = jnp.float32(0)
                    for i in range(reps):
                        dep, w, v = raycast_table(
                            rt, chain_pose(i, acc), invK, HINT_H, HINT_W,
                            min_depth=0.5, max_depth=3.5, num_samples=ns)
                        acc = acc + jnp.nansum(dep) * 1e-9
                    return acc
                return lambda: fn(rt0.table)
            m, times = marginal(mk)
            _note(f"raycast ns={ns} marginal {m*1e3:.1f} ms {times}")

    n = HINT_H * HINT_W
    Sc = max(2, NS // 4)
    X, Y, Z = rt0.dims
    zrows = rt0.zbp // 2
    nrows = X * Y * zrows

    if "gathers" in which:
        # coarse-pass-sized random row gather + row sum (no trilinear)
        idx = jnp.asarray(
            rng.randint(0, nrows, size=(Sc * n,)).astype(np.int32))
        def mk(reps):
            @jax.jit
            def fn(table):
                acc = jnp.float32(0)
                ix = idx
                for _ in range(reps):
                    rows = jnp.take(table, ix, axis=0)
                    s = jnp.sum(rows.astype(jnp.float32))
                    acc = acc + s * 1e-20
                    ix = (ix + acc.astype(jnp.int32) + 1) % nrows  # chain
                return acc
            return lambda: fn(rt0.table)
        m, times = marginal(mk)
        _note(f"gather-only (Sc*n={Sc*n} rows) marginal {m*1e3:.1f} ms {times}")

    if "vpu" in which:
        # trilinear lane math on CONTIGUOUS rows: same op mix, ~free "gather"
        f1 = jnp.asarray(rng.rand(Sc * n, 3).astype(np.float32))
        zoff = jnp.asarray(rng.randint(0, 4, size=(Sc * n,)).astype(np.int32))
        seg = jnp.asarray(rng.randint(0, 2, size=(Sc * n,)).astype(np.int32))
        def mk(reps):
            @jax.jit
            def fn(table):
                acc = jnp.float32(0)
                base = jnp.arange(Sc * n, dtype=jnp.int32) % nrows
                for _ in range(reps):
                    rows = jax.lax.dynamic_slice_in_dim(
                        table, 0, Sc * n if Sc * n <= nrows else nrows, axis=0)
                    if Sc * n > nrows:
                        rows = jnp.tile(rows, (-(-Sc * n // nrows), 1))[: Sc * n]
                    val, wt, wm = _trilinear_from_row(
                        rows, f1[:, 0] + acc * 1e-30, f1[:, 1], f1[:, 2],
                        zoff, seg)
                    acc = acc + jnp.sum(val) * 1e-20 + jnp.sum(wm == 0) * 0.0
                return acc
            return lambda: fn(rt0.table)
        m, times = marginal(mk)
        _note(f"trilinear-vpu (contiguous rows) marginal {m*1e3:.1f} ms {times}")


if __name__ == "__main__":
    main()
