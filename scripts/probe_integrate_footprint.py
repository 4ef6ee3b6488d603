"""Design probe for the slice-warp Pallas integrate kernel (PERF_NOTES r3).

The kernel will replace the per-voxel depth gather with one-hot-matmul
sampling restricted to a per-block image band. Its cost and feasibility
hinge on the image-space footprint of each (8 sublane, L lane) voxel block:
the y-span (BY) and x-span (BX) of the projected pixels of the block's
*needed* voxels (in-image, 0 < z_cam < max_depth). This script measures
those spans on the bench's actual geometry (synthetic trajectory + bench
volume) for every choice of lane axis / sublane axis / L, and prints the
band-size distribution, active-block fraction, and the estimated MXU FLOPs
per frame for candidate static band sizes.

CPU-only (numpy); no chip needed.
"""

import itertools
import sys

import numpy as np

sys.path.insert(0, ".")

from doubletake_tpu.datasets.synthetic import SyntheticDataset  # noqa: E402

H, W = 192, 256  # s0 depth resolution (integrate consumes s0 depth maps)
MAX_DEPTH = 3.5
VS = 0.02
BOUNDS = dict(xmin=-3.2, xmax=3.2, ymin=-2.2, ymax=2.2, zmin=-0.1, zmax=3.1)


def volume_dims():
    dims = []
    for a in ("x", "y", "z"):
        ext = BOUNDS[f"{a}max"] - BOUNDS[f"{a}min"]
        dims.append(int(np.ceil(ext / VS / 8)) * 8)
    return tuple(dims)


def main():
    ds = SyntheticDataset(split="test", image_height=H, image_width=W,
                          num_frames=24, tuple_size=8)
    K = np.asarray(ds.load_intrinsics("synth0", 0)["K_s0_b44"], np.float32)
    if K.ndim == 3:
        K = K[0]
    poses = [np.asarray(ds.poses("synth0")[i]) for i in range(16)]

    dims = volume_dims()
    origin = np.array([BOUNDS["xmin"], BOUNDS["ymin"], BOUNDS["zmin"]], np.float32)
    X, Y, Z = dims
    print(f"volume dims {dims} = {X*Y*Z/1e6:.1f}M voxels, K diag {K[0,0]:.0f}/{K[1,1]:.0f}")

    # world coordinate grids per axis
    coords = [origin[i] + np.arange(dims[i], dtype=np.float32) * VS for i in range(3)]

    results = {}
    for lane_ax, sub_ax in itertools.permutations(range(3), 2):
        for L in (32, 64, 128):
            if volume_dims()[lane_ax] % L or volume_dims()[sub_ax] % 8:
                continue
            key = (lane_ax, sub_ax, L)
            spans = []
            active_frac = []
            for T in poses[:8]:
                P = (K @ np.linalg.inv(T))[:3]  # cam_T_world then project
                # build per-voxel projections blockwise to bound memory:
                # iterate over the remaining axis
                rem_ax = 3 - lane_ax - sub_ax
                la, sa, ra = coords[lane_ax], coords[sub_ax], coords[rem_ax]
                # grid (rem, sub, lane)
                g = np.zeros((len(ra), len(sa), len(la), 3), np.float32)
                g[..., rem_ax] = ra[:, None, None]
                g[..., sub_ax] = sa[None, :, None]
                g[..., lane_ax] = la[None, None, :]
                cam = g @ P[:, :3].T + P[:, 3]
                z = cam[..., 2]
                with np.errstate(divide="ignore", invalid="ignore"):
                    px = cam[..., 0] / z
                    py = cam[..., 1] / z
                ix = np.rint(px - 0.5)
                iy = np.rint(py - 0.5)
                need = (z > 0) & (z < MAX_DEPTH) & (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)

                nb_r, nb_s, nb_l = len(ra), len(sa) // 8, len(la) // L
                need_b = need.reshape(nb_r, nb_s, 8, nb_l, L)
                ixb = ix.reshape(need_b.shape)
                iyb = iy.reshape(need_b.shape)
                act = need_b.any(axis=(2, 4))  # (nb_r, nb_s, nb_l)
                big = np.where(need_b, ixb, -np.inf).max(axis=(2, 4))
                small = np.where(need_b, ixb, np.inf).min(axis=(2, 4))
                bx = np.where(act, big - small + 1, 0)
                bigy = np.where(need_b, iyb, -np.inf).max(axis=(2, 4))
                smally = np.where(need_b, iyb, np.inf).min(axis=(2, 4))
                by = np.where(act, bigy - smally + 1, 0)
                spans.append(np.stack([by[act], bx[act]], -1))
                active_frac.append(act.mean())
            spans = np.concatenate(spans)
            af = float(np.mean(active_frac))
            by, bx = spans[:, 0], spans[:, 1]
            results[key] = (af, by, bx)
            names = "XYZ"
            print(
                f"lane={names[lane_ax]} sub={names[sub_ax]} L={L:3d}: "
                f"active {af*100:5.1f}%  "
                f"BY p50/p90/p99/max {np.percentile(by,50):4.0f}/{np.percentile(by,90):4.0f}/"
                f"{np.percentile(by,99):4.0f}/{by.max():4.0f}  "
                f"BX p50/p90/p99/max {np.percentile(bx,50):4.0f}/{np.percentile(bx,90):4.0f}/"
                f"{np.percentile(bx,99):4.0f}/{bx.max():4.0f}"
            )

    # FLOP estimates for the most promising layouts: contract the smaller
    # band via one-hot matmul against the full other dimension
    print("\nper-frame MXU GFLOP (2*V*B*full, hi/lo x2) for static bands:")
    for key, (af, by, bx) in sorted(results.items()):
        lane_ax, sub_ax, L = key
        names = "XYZ"
        n_blocks = volume_dims()[0] * volume_dims()[1] * volume_dims()[2] // (8 * L)
        V = 8 * L
        for BY in (16, 32, 64):
            ok = float(np.mean(by <= BY))
            if ok < 0.98:
                continue
            gflop = 2 * V * BY * W * n_blocks * af * 2 / 1e9
            print(f"  lane={names[lane_ax]} sub={names[sub_ax]} L={L:3d} "
                  f"BY={BY:3d} (covers {ok*100:5.1f}% blocks): {gflop:6.1f} GFLOP")


if __name__ == "__main__":
    main()
