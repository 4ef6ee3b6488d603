"""TSDF volume, fusion, sampling and raycasting — on-device, static shapes.

TPU-native redesign of the reference's scene-state stack
(reference: src/doubletake/tools/tsdf.py):

  * The volume is a dense, bounded (X, Y, Z) array pair (values init -1,
    weights init 0) held on device as a pytree — the analogue of
    tsdf.py:53-154 with the Open3D CUDA hashset dropped: active-voxel
    tracking is implicit in weights > 0, and frustum culling is replaced by
    masked full-volume updates (XLA fuses project+sample+update into one
    elementwise pass over the volume; no dynamic shapes anywhere).
  * ``integrate_depth`` matches TSDFFuser.integrate_depth math exactly
    (tsdf.py:414-558): nearest depth sampling, InfiniTAM confidence,
    truncation 3 voxels with optional 1.5x extended negative truncation,
    update_rate 2.5 / maxW 100, weights clamped to 1.
  * ``sample_tsdf`` is trilinear/nearest with align_corners=True semantics
    (tsdf.py:277-339).
  * ``raycast`` replaces the marching-cubes -> PyTorch3D-rasterize hint
    path (test_incremental.py:187-258): sphere-free fixed-step ray marching
    along camera z with linear zero-crossing refinement gives the same
    information (hint depth where the observed surface crosses zero, plus
    the trilinearly sampled confidence weight) without building a dynamic-
    shape mesh. Marching cubes remains only for host-side mesh export.
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from doubletake_tpu.ops.grid_sample import grid_sample_3d

_PREC = jax.lax.Precision.HIGHEST

VOX_MOD = 8  # volume dims rounded up to multiples of 8 (tsdf.py:59)


@struct.dataclass
class TSDF:
    """Dense TSDF volume. values/weights: (X, Y, Z); origin: world min corner.

    colors (optional, (X, Y, Z, 3) in [0, 1]) enables color fusion — the
    capability of the reference's Open3DFuser/CustomOpen3dFuser color path
    (fusers_helper.py:110-211) without the Open3D dependency."""

    values: jnp.ndarray
    weights: jnp.ndarray
    origin: jnp.ndarray  # (3,) float32
    voxel_size: float = struct.field(pytree_node=False)
    colors: jnp.ndarray | None = None

    @property
    def dims(self):
        return self.values.shape

    @classmethod
    def from_bounds(cls, bounds: dict, voxel_size: float, dtype=jnp.float32,
                    with_color: bool = False):
        """Create a volume covering bounds (tsdf.py:122-154)."""
        dims = []
        for axis in ("x", "y", "z"):
            extent = bounds[f"{axis}max"] - bounds[f"{axis}min"]
            dims.append(int(np.ceil(extent / voxel_size / VOX_MOD)) * VOX_MOD)
        origin = jnp.asarray(
            [bounds["xmin"], bounds["ymin"], bounds["zmin"]], jnp.float32
        )
        values = -jnp.ones(tuple(dims), dtype)
        weights = jnp.zeros(tuple(dims), dtype)
        colors = (
            jnp.zeros(tuple(dims) + (3,), jnp.float16) if with_color else None
        )
        return cls(values=values, weights=weights, origin=origin,
                   voxel_size=voxel_size, colors=colors)

    @classmethod
    def from_mesh_bounds(cls, verts_min, verts_max, voxel_size: float, dtype=jnp.float32):
        """Bounds from mesh vertices with a 3-voxel buffer (tsdf.py:100-120)."""
        b = {}
        for i, axis in enumerate(("x", "y", "z")):
            b[f"{axis}min"] = float(verts_min[i]) - 3 * voxel_size
            b[f"{axis}max"] = float(verts_max[i]) + 3 * voxel_size
        return cls.from_bounds(b, voxel_size, dtype)

    def save(self, path: str):
        arrays = dict(
            tsdf_values=np.asarray(self.values, np.float16),
            tsdf_weights=np.asarray(self.weights, np.float16),
            origin=np.asarray(self.origin, np.float32),
            voxel_size=self.voxel_size,
        )
        if self.colors is not None:
            arrays["tsdf_colors"] = np.asarray(self.colors, np.float16)
        np.savez_compressed(path, **arrays)

    @classmethod
    def load(cls, path: str, dtype=jnp.float32):
        data = np.load(path)
        return cls(
            values=jnp.asarray(data["tsdf_values"], dtype),
            weights=jnp.asarray(data["tsdf_weights"], dtype),
            origin=jnp.asarray(data["origin"], jnp.float32),
            voxel_size=float(data["voxel_size"]),
            colors=(
                jnp.asarray(data["tsdf_colors"], jnp.float16)
                if "tsdf_colors" in data else None
            ),
        )


def voxel_world_coords(tsdf: TSDF):
    """World coordinates of every voxel center-corner, (X, Y, Z, 3)."""
    dims = tsdf.dims
    grids = jnp.meshgrid(*[jnp.arange(d, dtype=jnp.float32) for d in dims], indexing="ij")
    return tsdf.origin + jnp.stack(grids, axis=-1) * tsdf.voxel_size


@dataclasses.dataclass(frozen=True)
class FusionConfig:
    """Fusion hyperparameters (TSDFFuser defaults, tsdf.py:347-363)."""

    min_depth: float = 0.5
    max_depth: float = 5.0
    truncation_voxels: float = 3.0
    max_weight: float = 100.0
    update_rate: float = 2.5
    extended_neg_truncation: bool = False


def _voxel_update(
    coords_n3,
    old_vals,
    old_wts,
    depth_hw1,
    P_34,
    config: FusionConfig,
    truncation: float,
    old_colors_n3=None,
    image_hw3=None,
):
    """The per-voxel fusion update (TSDFFuser.integrate_depth math,
    reference tsdf.py:414-558) on a flat voxel set.

    Shared by the dense full-volume pass and the frustum-culled pass so the
    two run the identical math on every voxel both process (outputs agree to
    XLA fma/reassociation noise, ~1e-6). Returns
    (new_vals, new_wts, new_colors | None)."""
    h, w = depth_hw1.shape[:2]

    cam = (
        jnp.einsum("ij,nj->ni", P_34[:, :3], coords_n3, precision=_PREC) + P_34[:, 3]
    )  # (N, 3)
    vox_depth = cam[:, 2]
    px = cam[:, :2] / vox_depth[:, None]  # reference divides by z directly

    # nearest-sample the depth map (grid_sample align_corners=False zeros
    # semantics, inlined). The gather is a 2-lane ROW gather: on this TPU a
    # width-1 gather takes a ~3.5x slower scalar path (135 ms vs 39 ms for
    # the 18M-voxel volume — measured, see PERF_NOTES.md round 2).
    ix = jnp.rint(px[:, 0] - 0.5).astype(jnp.int32)  # round half-to-even,
    iy = jnp.rint(px[:, 1] - 0.5).astype(jnp.int32)  # = torch nearbyint
    in_img = (ix >= 0) & (ix < w) & (iy >= 0) & (iy < h) & (vox_depth > 0)
    flat = jnp.clip(iy * w + ix, 0, h * w - 1)
    table = jnp.concatenate(
        [depth_hw1.reshape(-1, 1)] * 2, axis=1
    )  # (h*w, 2): duplicate lane forces the fast row-gather path
    sampled = jnp.take(table, flat, axis=0)[:, 0]
    sampled = jnp.where(in_img, sampled, 0.0)

    confidence = (
        jnp.clip(
            1.0 - (sampled - config.min_depth) / (config.max_depth - config.min_depth),
            0.25,
            1.0,
        )
        ** 2
    )

    dist = sampled - vox_depth
    tsdf_vals = jnp.clip(dist / truncation, -1.0, 1.0)

    trunc_check = -truncation * (1.5 if config.extended_neg_truncation else 1.0)
    valid = (
        (vox_depth > 0)
        & (dist > trunc_check)
        & (sampled > 0)
        & (vox_depth < config.max_depth)
        & (confidence > 0)
    )

    new_wts = confidence * config.update_rate / config.max_weight
    total = old_wts + new_wts.astype(old_wts.dtype)

    fused_vals = (old_vals * old_wts + tsdf_vals.astype(old_vals.dtype) * new_wts) / total
    out_vals = jnp.where(valid, fused_vals, old_vals)
    out_wts = jnp.where(valid, jnp.clip(total, max=1.0), old_wts)

    out_colors = None
    if old_colors_n3 is not None and image_hw3 is not None:
        # color fusion: same running weighted mean, same validity, nearest
        # image sample (Open3D ScalableTSDFVolume fetches the projected
        # pixel's color, fusers_helper.py:110-211). The table is padded to
        # 8 lanes: XLA lays width-3 gather outputs out as (N, 128)-tiled
        # (42x padding, OOM at volume scale) but handles 8-lane rows fine.
        rgb_table = jnp.pad(
            image_hw3.reshape(-1, 3).astype(jnp.float32), ((0, 0), (0, 5))
        )
        rgb = jnp.take(rgb_table, flat, axis=0)[:, :3]
        rgb = jnp.where(in_img[:, None], rgb, 0.0)
        old_c = old_colors_n3.astype(jnp.float32)
        fused_c = (
            old_c * old_wts[:, None] + rgb * new_wts[:, None]
        ) / total[:, None]
        out_colors = jnp.where(valid[:, None], fused_c, old_c)

    return out_vals, out_wts, out_colors


def _frustum_chunk_mask(tsdf: TSDF, P_34, h: int, w: int, max_depth: float, cz: int):
    """Conservative per-chunk camera-frustum mask, (X*Y*(Z//cz),) bool.

    A chunk is a z-run of ``cz`` voxel sample points at one (i, j) — i.e. a
    contiguous row of the volume's natural (X*Y*(Z//cz), cz) reshape. A
    voxel can only receive a fusion update if 0 < z_cam < max_depth and its
    projected pixel is inside the image (``_voxel_update``'s ``in_img`` and
    depth bounds — the only data-independent parts of ``valid``). All five
    constraints are linear in homogeneous world coordinates, so the exact
    test "no point of the chunk's AABB satisfies all of them" reduces to
    per-plane min-corner (p-vertex) tests; any plane whose minimum over the
    8 corners is positive proves the whole chunk invalid (convexity). One
    pixel of margin guards nearest-rounding ties.

    The plane functionals come straight from P = (K @ cam_T_world)[:3]:
      L0 = -z                  (behind camera)
      L1 =  z - max_depth      (beyond max fusion depth)
      L2 = -(r1·p) - z         (px < -1)
      L3 =  (r1·p) - (w+1) z   (px > w+1)
      L4/L5 = same for py with h.
    L2..L5 are only meaningful at z > 0, but culling on them is still
    conservative for mixed-sign chunks: points at z <= 0 are invalid via
    the z > 0 requirement regardless.
    """
    X, Y, Z = tsdf.dims
    nzc = Z // cz
    vs = tsdf.voxel_size

    r1, r2, r3 = P_34[0], P_34[1], P_34[2]  # rows, (4,) each

    def lin(row):  # a·p + b with p = origin + (i, j, k) * vs
        a = row[:3]
        b = row[3] + jnp.dot(a, tsdf.origin)
        return a * vs, b

    planes = []
    a3, b3 = lin(r3)
    planes.append((-a3, -b3 - vs))                   # L0: z >= -vs margin
    planes.append((a3, b3 - (max_depth + vs)))       # L1: z <= max_depth (+margin)
    a1, b1 = lin(r1)
    planes.append((-a1 - a3, -b1 - b3))              # L2: px >= -1
    planes.append((a1 - (w + 1) * a3, b1 - (w + 1) * b3))  # L3: px <= w+1
    a2, b2 = lin(r2)
    planes.append((-a2 - a3, -b2 - b3))              # L4: py >= -1
    planes.append((a2 - (h + 1) * a3, b2 - (h + 1) * b3))  # L5: py <= h+1

    ii = jnp.arange(X, dtype=jnp.float32)[:, None, None]
    jj = jnp.arange(Y, dtype=jnp.float32)[None, :, None]
    kk = (jnp.arange(nzc, dtype=jnp.float32) * cz)[None, None, :]

    # chunk AABB of SAMPLE points: lo = (i, j, k0), extent = (0, 0, cz - 1)
    keep = jnp.ones((X, Y, nzc), bool)
    ext_k = float(cz - 1)
    for a, b in planes:
        # min over the AABB corners of a·(lo + t*ext) + b, t in {0, 1}^3
        min_corner = (
            a[0] * ii + a[1] * jj + a[2] * kk + jnp.minimum(a[2] * ext_k, 0.0) + b
        )
        keep &= min_corner <= 0.0
    return keep.reshape(-1)


def _pick_cz(Z: int) -> int:
    """Chunk length along z: the divisor of Z closest to 32 (in [8, 64]).

    Longer chunks mean fewer compaction rows (row gathers are latency-bound
    at ~11 ns each); shorter chunks cull tighter. Z is always a multiple of
    8 (VOX_MOD)."""
    cands = [d for d in range(8, 65) if Z % d == 0]
    return min(cands, key=lambda d: abs(d - 32)) if cands else 8


def frustum_chunk_fraction(
    tsdf: TSDF, cam_T_world_44, K_44, config: FusionConfig, h: int, w: int,
):
    """Fraction of volume chunks intersecting the camera frustum (diagnostic
    for choosing ``cull_max_fraction``)."""
    cz = _pick_cz(tsdf.dims[2])
    P_34 = jnp.matmul(K_44, cam_T_world_44, precision=_PREC)[:3]
    mask = _frustum_chunk_mask(tsdf, P_34, h, w, config.max_depth, cz)
    return jnp.mean(mask.astype(jnp.float32))


def choose_cull_fraction(
    tsdf: TSDF, cam_T_world_n44, K_44, config: FusionConfig, h: int, w: int,
    margin: float = 1.25, floor: float = 0.05,
):
    """Pick ``cull_max_fraction`` from a trajectory's known poses: the max
    per-frame frustum chunk fraction times a safety margin. The culled
    integrate's cost scales with the cap, so the cap should be as tight as
    the trajectory allows (overflow degrades to the dense pass via
    lax.cond, so a miss costs speed, never correctness)."""
    frac = jax.jit(
        jax.vmap(lambda p: frustum_chunk_fraction(tsdf, p, K_44, config, h, w))
    )(jnp.asarray(cam_T_world_n44))
    return float(min(1.0, max(floor, float(jnp.max(frac)) * margin)))


def integrate_depth(
    tsdf: TSDF,
    depth_hw1,
    cam_T_world_44,
    K_44,
    config: FusionConfig,
    depth_mask_hw1=None,
    image_hw3=None,
    cull: bool | None = None,
    cull_max_fraction: float = 0.5,
    use_pallas: bool | None = None,
):
    """Fuse one depth map into the volume. Pure, jittable; returns a new TSDF.

    Math parity with TSDFFuser.integrate_depth (tsdf.py:414-558). Two
    execution strategies, identical math (same update on the same voxel
    set; outputs agree to XLA fma/reassociation noise):

      * dense: the update is computed for every voxel and masked — one
        fused elementwise pass (the reference's frustum-bound
        gather/compact replaced by masking).
      * frustum-culled (``cull=True``; OFF by default — see below): chunks
        of ~32 z-consecutive voxels that provably cannot update
        (conservative plane tests, ``_frustum_chunk_mask``) are culled; the
        survivors are compacted to a static-size buffer
        (``jnp.nonzero(size=...)``), updated with the identical math, and
        row-scattered back.

    ``cull_max_fraction`` bounds the static compaction buffer. Overflow is
    SAFE: if the frustum covers more chunks than the cap, the whole frame
    falls back to the dense pass via ``lax.cond`` — never dropped updates.
    Choose the fraction from scene geometry (``frustum_chunk_fraction``).

    MEASURED ON TPU (round 3, 18M voxels, 512x384): dense 56 ms, culled
    102 ms at frac 0.33, 209 ms at frac 0.5 — XLA row *scatter* of the
    compacted chunks back into the volume costs far more per row than the
    per-voxel depth gathers the cull saves, and the cost scales with the
    cap. The cull therefore defaults OFF; it remains available (and
    parity-tested) for a future backend where scatter is vectorized. The
    principled TPU fix for the integrate stage is a slice-warp Pallas
    kernel (PERF_NOTES round-3 sketch), not compaction."""
    h, w = depth_hw1.shape[:2]
    dims = tsdf.dims
    truncation = config.truncation_voxels * tsdf.voxel_size

    if depth_mask_hw1 is not None:
        depth_hw1 = jnp.where(depth_mask_hw1, depth_hw1, -1.0)

    P_34 = jnp.matmul(K_44, cam_T_world_44, precision=_PREC)[:3]

    cz = _pick_cz(dims[2])
    n_chunks = dims[0] * dims[1] * (dims[2] // cz)
    if cull is None:
        cull = False  # measured slower on TPU (scatter-bound); see docstring
    with_color = tsdf.colors is not None and image_hw3 is not None

    # Fused Pallas integrate (ops/pallas/integrate.py): the depth sample as
    # one-hot matmuls instead of 11-18M serialized row gathers. Auto-enabled
    # on TPU for the shapes it supports; identical _voxel_update math.
    if use_pallas is None:
        from doubletake_tpu.ops.pallas.integrate import ROWS as _INT_ROWS

        # gate must mirror fused_integrate's own asserts: row groups of
        # ROWS flattened X*Y rows (not a per-dim %8 — an X*Y=40 volume
        # satisfies dims%8 but not the row-group contract) and Z%8 lanes
        use_pallas = (
            jax.default_backend() not in ("cpu",)
            and not cull
            and not with_color
            and (dims[0] * dims[1]) % _INT_ROWS == 0
            and dims[2] % 8 == 0
            and tsdf.values.dtype == jnp.float32
        )
    if use_pallas:
        from doubletake_tpu.ops.pallas.integrate import fused_integrate

        new_vals, new_wts = fused_integrate(
            tsdf.values, tsdf.weights, depth_hw1[..., 0], P_34, tsdf.origin,
            voxel_size=tsdf.voxel_size,
            min_depth=config.min_depth, max_depth=config.max_depth,
            truncation=truncation,
            trunc_check=-truncation
            * (1.5 if config.extended_neg_truncation else 1.0),
            w_rate=config.update_rate / config.max_weight,
        )
        return tsdf.replace(values=new_vals, weights=new_wts)

    def dense(_):
        coords = voxel_world_coords(tsdf).reshape(-1, 3)  # (N, 3)
        out_vals, out_wts, out_colors = _voxel_update(
            coords, tsdf.values.reshape(-1), tsdf.weights.reshape(-1),
            depth_hw1, P_34, config, truncation,
            tsdf.colors.reshape(-1, 3).astype(jnp.float32) if with_color else None,
            image_hw3,
        )
        return (
            out_vals.reshape(dims),
            out_wts.reshape(dims),
            out_colors.reshape(dims + (3,)).astype(tsdf.colors.dtype)
            if with_color else tsdf.colors,
        )

    if not cull:
        out_vals, out_wts, out_colors = dense(None)
        return tsdf.replace(values=out_vals, weights=out_wts, colors=out_colors)

    X, Y, Z = dims
    nzc = Z // cz
    cap = max(1, min(n_chunks, int(n_chunks * cull_max_fraction)))
    keep = _frustum_chunk_mask(tsdf, P_34, h, w, config.max_depth, cz)

    def culled(keep):
        (idx,) = jnp.nonzero(keep, size=cap, fill_value=n_chunks)
        live = idx < n_chunks  # fill entries gather clamped rows; drop on scatter

        vrows = tsdf.values.reshape(n_chunks, cz)
        wrows = tsdf.weights.reshape(n_chunks, cz)
        old_vals = jnp.take(vrows, idx, axis=0)  # (cap, cz) row gathers
        old_wts = jnp.take(wrows, idx, axis=0)

        # voxel indices of the gathered chunks
        ij = idx // nzc
        vi = (ij // Y).astype(jnp.float32)
        vj = (ij % Y).astype(jnp.float32)
        vk = (idx % nzc)[:, None].astype(jnp.float32) * cz + jnp.arange(
            cz, dtype=jnp.float32
        )[None, :]
        coords = tsdf.origin + jnp.stack(
            [
                jnp.broadcast_to(vi[:, None], (cap, cz)),
                jnp.broadcast_to(vj[:, None], (cap, cz)),
                vk,
            ],
            axis=-1,
        ).reshape(-1, 3) * tsdf.voxel_size

        old_colors = None
        if with_color:
            crows = tsdf.colors.reshape(n_chunks, cz * 3)
            old_colors = (
                jnp.take(crows, idx, axis=0).reshape(-1, 3).astype(jnp.float32)
            )

        new_vals, new_wts, new_colors = _voxel_update(
            coords, old_vals.reshape(-1), old_wts.reshape(-1),
            depth_hw1, P_34, config, truncation, old_colors, image_hw3,
        )

        scatter_idx = jnp.where(live, idx, n_chunks)  # OOB rows drop
        out_vals = vrows.at[scatter_idx].set(
            new_vals.reshape(cap, cz), mode="drop"
        ).reshape(dims)
        out_wts = wrows.at[scatter_idx].set(
            new_wts.reshape(cap, cz), mode="drop"
        ).reshape(dims)
        out_colors = tsdf.colors
        if with_color:
            out_colors = crows.at[scatter_idx].set(
                new_colors.reshape(cap, cz * 3).astype(tsdf.colors.dtype),
                mode="drop",
            ).reshape(dims + (3,))
        return out_vals, out_wts, out_colors

    if cap == n_chunks:
        out_vals, out_wts, out_colors = dense(None)
    else:
        out_vals, out_wts, out_colors = jax.lax.cond(
            jnp.sum(keep.astype(jnp.int32)) <= cap, culled, dense, keep
        )
    return tsdf.replace(values=out_vals, weights=out_wts, colors=out_colors)


def integrate_batch(tsdf: TSDF, depth_bhw1, cam_T_world_b44, K_b44, config: FusionConfig,
                    depth_mask_bhw1=None):
    """Sequentially fuse a batch of depth maps via lax.scan (order matters —
    the running weighted mean is order-dependent, like the reference's
    per-batch loop at tsdf.py:444)."""

    def step(vol, frame):
        if depth_mask_bhw1 is not None:
            depth, cam_T_world, K, mask = frame
        else:
            (depth, cam_T_world, K), mask = frame, None
        return integrate_depth(vol, depth, cam_T_world, K, config, mask), None

    frames = (depth_bhw1, cam_T_world_b44, K_b44)
    if depth_mask_bhw1 is not None:
        frames = frames + (depth_mask_bhw1,)
    out, _ = jax.lax.scan(step, tsdf, frames)
    return out


def world_to_sample_coords(tsdf: TSDF, world_points_n3):
    """World points -> [-1, 1] sample coords, align_corners=True convention
    (tsdf.py:300-312)."""
    vox = (world_points_n3 - tsdf.origin) / tsdf.voxel_size
    dims = jnp.asarray(tsdf.dims, jnp.float32)
    return (vox / (dims - 1.0)) * 2.0 - 1.0


def sample_tsdf(tsdf: TSDF, world_points_n3, what: str = "tsdf", method: str = "bilinear"):
    """Sample values/weights/colors at world points (tsdf.py:277-339 parity)."""
    if what == "colors":
        pts = world_to_sample_coords(tsdf, world_points_n3)
        return grid_sample_3d(tsdf.colors.astype(jnp.float32), pts, mode=method)
    vol = tsdf.values if what == "tsdf" else tsdf.weights
    pts = world_to_sample_coords(tsdf, world_points_n3)
    return grid_sample_3d(vol[..., None], pts, mode=method)[:, 0]


def _build_ray_table(tsdf: TSDF):
    """Pack (values, weights) into a gather-friendly row table.

    Logical unit: a 64-lane bf16 block per (x, y, z-block-of-4) holding
    that column's values and weights over 8 consecutive z levels starting
    at 4*zb, for the full 2x2 (x, y) neighbor footprint:
      [v_x0y0(8) w_x0y0(8) v_x1y0(8) w_x1y0(8)  same for y1 (32)]
    A trilinear sample whose floor cell is (x0, y0, z0 in [4*zb, 4*zb+3])
    gathers ONE row — x, y and z interpolation all live inside the block.
    Gathers on this platform are latency-bound (~11-14 ns/row from HBM
    regardless of width), so baking the whole 8-corner footprint into one
    row halves the raycast sampling cost vs the y-pair variant; the 2x
    bigger table costs ~4 ms extra build at volume scale.

    TWO consecutive z-blocks are packed per physical 128-lane row (a pure
    reshape): TPU HBM arrays are (8, 128)-tiled, so a sub-128-lane-minor
    table would be lane-padded and the per-frame full-volume rebuild would
    write padding. The sampler selects the 64-lane segment by lane
    arithmetic (lane//64 == zblk%2).

    Returns (table (X*Y*(zbp//2), 128) bf16, zbp) with zbp the padded
    z-block count (multiple of 2).
    """
    X, Y, Z = tsdf.dims
    zb = -(-max(Z - 1, 1) // 4)  # blocks covering z0 in [0, Z-2]
    zbp = -(-zb // 2) * 2        # 2 blocks per 128-lane physical row
    zpad = zbp * 4 + 4

    def blocks(vol):
        v = jnp.pad(vol, ((0, 0), (0, 0), (0, zpad - Z))).astype(jnp.bfloat16)
        lo = v[:, :, : zbp * 4].reshape(X, Y, zbp, 4)
        hi = v[:, :, 4: zbp * 4 + 4].reshape(X, Y, zbp, 4)
        return jnp.concatenate([lo, hi], axis=-1)  # (X, Y, zbp, 8)

    v8, w8 = blocks(tsdf.values), blocks(tsdf.weights)
    vw = jnp.concatenate([v8, w8], axis=-1)  # (X, Y, zbp, 16)
    x1 = jnp.pad(vw[1:], ((0, 1), (0, 0), (0, 0), (0, 0)))
    vwx = jnp.concatenate([vw, x1], axis=-1)  # (X, Y, zbp, 32)
    y1 = jnp.pad(vwx[:, 1:], ((0, 0), (0, 1), (0, 0), (0, 0)))
    table = jnp.concatenate([vwx, y1], axis=-1)  # (X, Y, zbp, 64)
    return table.reshape(X * Y * (zbp // 2), 128), zbp


def _trilinear_from_row(row, fx, fy, fz, zoff, seg):
    """Trilinear (value, weight, min corner weight) from ONE packed row.

    row: (N, 128) = two 64-lane z-block segments, each laid out
    [v_x0y0(8) w_x0y0(8) v_x1y0(8) w_x1y0(8) v_x0y1(8) ... w_x1y1(8)];
    fx/fy/fz fractional parts; zoff = z0 - 4*zblk in [0, 3]; seg = zblk % 2
    selects the live segment.

    ``wmin`` is the minimum fusion weight over the CONTRIBUTING corners
    (trilinear coefficient > 1e-3). Unobserved voxels hold value -1 at
    weight 0 (the reference's init, tsdf.py:122-154), so interpolated
    values at observed/unobserved boundaries (e.g. the camera-frustum
    edge) blend toward -1 and fake a zero crossing while the interpolated
    weight can still exceed epsilon — raycast must gate crossings on wmin,
    not on the blended weight, or it reports phantom surfaces there.
    """
    lanes = jnp.arange(128, dtype=jnp.int32)
    zl = lanes % 8
    grp = (lanes // 8) % 4    # 0: v@x0, 1: w@x0, 2: v@x1, 3: w@x1
    ypart = (lanes // 32) % 2  # 0: y0, 1: y1
    blk = lanes // 64         # which z-block segment of the physical row
    is_weight = (grp % 2) == 1
    is_x1 = grp >= 2

    zo = zoff[:, None]
    live = blk[None] == seg[:, None]
    wz = (
        jnp.where(zl[None] == zo, 1.0 - fz[:, None], 0.0)
        + jnp.where(zl[None] == zo + 1, fz[:, None], 0.0)
    ) * live
    wx = jnp.where(is_x1[None], fx[:, None], (1.0 - fx)[:, None])
    wy = jnp.where(ypart[None] == 1, fy[:, None], (1.0 - fy)[:, None])
    coef = wz * wx * wy
    rf = row.astype(jnp.float32)
    r = rf * coef
    val = jnp.sum(jnp.where(is_weight[None], 0.0, r), axis=-1)
    wt = jnp.sum(jnp.where(is_weight[None], r, 0.0), axis=-1)
    contributing = is_weight[None] & (coef > 1e-3)
    wmin = jnp.min(jnp.where(contributing, rf, jnp.inf), axis=-1)
    return val, wt, wmin


MIP_FACTOR = 4  # voxels per mip cell edge (candidate-block acceleration)
MIP_WINDOW_VOXELS = 10  # forward full-res window per candidate, in voxels:
# covers the worst-case axis-aligned early-flag distance (f + 1 = 5 voxels
# from a sample to its cell's halo) with ~2x slack for oblique incidence;
# steeper grazing rays degrade to hint misses


def _build_mip_table(tsdf: TSDF, weight_epsilon: float = 1e-4):
    """Conservative observed-negative mip for candidate-block raycasting.

    Each mip cell holds the MIN of ``where(weight > eps, value, +1)`` over
    its MIP_FACTOR^3 voxel block, further min-pooled over the 3^3 mip
    neighborhood. The halo guarantees: if a trilinear sample's contributing
    corners include an observed voxel with value <= 0 (the condition for a
    full-res coarse-march crossing at that sample), then the mip cell
    CONTAINING the sample reads <= 0 — corners live at most 1 voxel from
    the sample, inside the halo. So a mip march at the same step detects a
    superset of the full-res march's crossing samples; false positives are
    resolved by full-res window checks (see raycast_table).

    Packed one (x, y) mip column per 128-lane row (Zm <= 128 z cells in
    lanes): the table is ~64^3 x smaller than the volume, so its gathers
    run at the measured small-table rate (~2.2 ns/row vs ~11 from HBM).
    """
    X, Y, Z = tsdf.dims
    f = MIP_FACTOR
    assert X % f == 0 and Y % f == 0, (X, Y)
    Zp = -(-Z // f) * f
    Xm, Ym, Zm = X // f, Y // f, Zp // f
    assert Zm <= 128, Zm
    v = jnp.where(tsdf.weights > weight_epsilon, tsdf.values, 1.0)
    v = jnp.pad(v, ((0, 0), (0, 0), (0, Zp - Z)), constant_values=1.0)

    def pool_axis(x, ax, n_out):
        """Exact (f+2)-window stride-f min pool along ax (1-voxel halo):
        min(block_min[i], last[i-1], first[i+1]) — all reshape/slice based."""
        x = jnp.moveaxis(x, ax, -1)
        blocks = x.reshape(x.shape[:-1] + (n_out, f))
        m0 = blocks.min(axis=-1)
        first = blocks[..., 0]
        last = blocks[..., f - 1]
        prev_last = jnp.concatenate([last[..., :1], last[..., :-1]], axis=-1)
        next_first = jnp.concatenate([first[..., 1:], first[..., -1:]], axis=-1)
        m = jnp.minimum(m0, jnp.minimum(prev_last, next_first))
        return jnp.moveaxis(m, -1, ax)

    m = pool_axis(v, 0, Xm)
    m = pool_axis(m, 1, Ym)
    m = pool_axis(m, 2, Zm)
    table = jnp.pad(m, ((0, 0), (0, 0), (0, 128 - Zm)), constant_values=1.0)
    return table.reshape(Xm * Ym, 128).astype(jnp.bfloat16), Zm


@struct.dataclass
class RayTable:
    """Prebuilt gather table for raycasting (see _build_ray_table).

    For a STATIC volume (offline pass-2 / revisit hint meshes) build once
    per scan with ``build_ray_table`` and raycast many cameras against it —
    the full-volume repack is the table cost, not the per-camera cost.

    ``mip`` (optional) enables the candidate-block coarse march (see
    _build_mip_table / raycast_table)."""

    table: jnp.ndarray
    origin: jnp.ndarray
    voxel_size: float = struct.field(pytree_node=False)
    zbp: int = struct.field(pytree_node=False)
    dims: tuple = struct.field(pytree_node=False)
    mip: jnp.ndarray | None = None
    mip_zm: int = struct.field(pytree_node=False, default=0)


def build_ray_table(tsdf: TSDF, with_mip: bool = False) -> RayTable:
    table, zbp = _build_ray_table(tsdf)
    mip, mip_zm = (None, 0)
    if with_mip:
        mip, mip_zm = _build_mip_table(tsdf)
    return RayTable(table=table, origin=tsdf.origin,
                    voxel_size=tsdf.voxel_size, zbp=zbp,
                    dims=tuple(tsdf.dims), mip=mip, mip_zm=mip_zm)


def auto_raycast_samples(
    voxel_size: float,
    min_depth: float,
    max_depth: float,
    extended_neg_truncation: bool = True,
    truncation_voxels: float = 3.0,
    safety: float = 0.85,
) -> int:
    """Smallest raycast sample budget that cannot step over a surface.

    The coarse pass (num_samples // 4 samples over the per-pixel clipped
    segment, worst case the full [min_depth, max_depth] range) detects a
    crossing as long as one sample lands in the observed-negative band
    behind the surface — ``truncation_voxels`` (x1.5 extended) wide. Fixing
    the coarse step at ``safety`` x that band gives the same detection
    guarantee as an oversampled march at a fraction of the gathers
    (sampling is the entire raycast cost — see raycast()).
    """
    band = truncation_voxels * (1.5 if extended_neg_truncation else 1.0)
    band_m = band * voxel_size
    sc = int(np.ceil((max_depth - min_depth) / (safety * band_m)))
    return 4 * max(8, sc)


@functools.partial(
    jax.jit,
    static_argnames=(
        "height", "width", "min_depth", "max_depth", "num_samples",
        "weight_epsilon", "use_mip",
    ),
)
def raycast(
    tsdf: TSDF,
    world_T_cam_44,
    invK_44,
    height: int,
    width: int,
    min_depth: float = 0.1,
    max_depth: float = 5.0,
    num_samples: int = 256,
    weight_epsilon: float = 1e-4,
    use_mip: bool = False,
):
    """Render hint depth + confidence by ray-marching the TSDF.

    Coarse-to-fine march: each pixel's ray is clipped to its intersection
    with the volume's interior box, marched at ``num_samples // 4`` coarse
    z-depths to bracket the first observed + -> - zero crossing of the
    TSDF, then the bracketing interval is re-marched with 8 fine samples
    and the crossing refined by linear interpolation (the same rule
    marching cubes uses on edges, so depths agree with the reference's
    MC+rasterize hints up to sampling). The coarse pass cannot step over a
    surface as long as the coarse step stays below the negative truncation
    band (3 voxels, 4.5 with extended truncation) — with volume-clipped
    segments and the default budget the step is ~2-3 voxels. Effective
    depth resolution is coarse*fine = 2x the single-pass budget at ~3.5x
    fewer samples. Sampling is one packed-row gather per sample (see
    _build_ray_table) instead of gather-per-corner trilinear — gathers
    serialize per row on this platform, so sample count is the cost.

    Replaces the reference's mesh+rasterize hint render
    (src/doubletake/utils/rendering_utils.py:21-53, test_incremental.py:187-258).

    Returns (depth_hw, weight_hw, valid_hw):
      depth  — z-depth of the surface (matches PyTorch3D zbuf semantics),
      weight — trilinearly sampled fusion weight at the surface point,
      valid  — crossing found.
    """
    return raycast_table(
        build_ray_table(tsdf, with_mip=use_mip), world_T_cam_44, invK_44,
        height, width, min_depth=min_depth, max_depth=max_depth,
        num_samples=num_samples, weight_epsilon=weight_epsilon,
    )


def raycast_table(
    rt: RayTable,
    world_T_cam_44,
    invK_44,
    height: int,
    width: int,
    min_depth: float = 0.1,
    max_depth: float = 5.0,
    num_samples: int = 256,
    weight_epsilon: float = 1e-4,
):
    """raycast() against a prebuilt RayTable (static-volume amortization;
    vmap-safe over (world_T_cam, invK) for batched offline/revisit hints)."""
    # a raw opts.raycast_samples == 0 (auto) must be resolved by the caller
    # (runners/common.resolve_raycast_samples) — Sc = max(2, S // 4) would
    # otherwise silently coarse-march at 2 samples and return empty hints
    assert num_samples >= 16, (
        f"num_samples={num_samples}; resolve auto (0) via "
        "runners.common.resolve_raycast_samples before calling raycast"
    )
    X, Y, Z = rt.dims
    n = height * width
    S = num_samples
    ys, xs = jnp.meshgrid(
        jnp.arange(height, dtype=jnp.float32), jnp.arange(width, dtype=jnp.float32),
        indexing="ij",
    )
    pix = jnp.stack([xs + 0.5, ys + 0.5, jnp.ones_like(xs)], axis=0).reshape(3, n)
    rays_cam = jnp.matmul(invK_44[:3, :3], pix, precision=_PREC)  # (3, N) unit-z rays
    R = world_T_cam_44[:3, :3]
    t = world_T_cam_44[:3, 3]
    rays_world = jnp.matmul(R, rays_cam, precision=_PREC)  # (3, N)

    # ray in voxel coordinates: v(s) = ov + s * dv (s is camera z-depth)
    ov = ((t - rt.origin) / rt.voxel_size)[:, None]              # (3, 1)
    dv = rays_world / rt.voxel_size                              # (3, N)
    dims = jnp.asarray([X - 1, Y - 1, Z - 1], jnp.float32)[:, None]

    # slab clip against the interior box [0, dims-1] (trilinear support)
    safe_dv = jnp.where(jnp.abs(dv) > 1e-12, dv, 1e-12)
    ta = (0.0 - ov) / safe_dv
    tb = (dims - ov) / safe_dv
    t_lo = jnp.minimum(ta, tb)
    t_hi = jnp.maximum(ta, tb)
    parallel = jnp.abs(dv) <= 1e-12
    inside = (ov >= 0.0) & (ov <= dims)
    t_lo = jnp.where(parallel, jnp.where(inside, -jnp.inf, jnp.inf), t_lo)
    t_hi = jnp.where(parallel, jnp.where(inside, jnp.inf, -jnp.inf), t_hi)
    t_enter = jnp.maximum(jnp.max(t_lo, axis=0), min_depth)      # (N,)
    t_exit = jnp.minimum(jnp.min(t_hi, axis=0), max_depth)
    hit_box = t_exit > t_enter
    t_exit = jnp.maximum(t_exit, t_enter)

    Sc = max(2, S // 4)                                          # coarse budget
    Sf = 8                                                       # fine refine
    u = jnp.linspace(0.0, 1.0, Sc)                               # (Sc,)
    zs = t_enter[None] + u[:, None] * (t_exit - t_enter)[None]   # (Sc, N)
    dz = (t_exit - t_enter) / (Sc - 1)                           # (N,)

    table, zbp = rt.table, rt.zbp
    zrows = zbp // 2  # physical rows per (x, y) column

    def sample(zs_flat):
        """Trilinear (tsdf, weight, min corner weight) at depths zs_flat."""
        m = zs_flat.shape[0] // n
        v = ov[None] + zs_flat.reshape(m, 1, n) * dv[None]       # (m, 3, N)
        v = jnp.clip(
            v.transpose(0, 2, 1).reshape(-1, 3),
            0.0,
            jnp.asarray([X - 1, Y - 1, Z - 1], jnp.float32) - 1e-4,
        )
        v0 = jnp.floor(v)
        f = v - v0
        i = v0.astype(jnp.int32)
        zblk = i[:, 2] // 4
        # ONE gather per trilinear sample: the row packs the full 2x2
        # (x, y) neighbor footprint; the clip above guarantees
        # x0+1 <= X-1 and y0+1 <= Y-1, and the table pads past the edges
        base = (i[:, 0] * Y + i[:, 1]) * zrows + zblk // 2
        row = jnp.take(table, base, axis=0)
        return _trilinear_from_row(
            row, f[:, 0], f[:, 1], f[:, 2], i[:, 2] - zblk * 4, zblk % 2
        )

    if rt.mip is not None:
        # ---- candidate-block coarse march on the mip (VERDICT r3 #2) ----
        # Detection guarantee: if the dense coarse march crosses at pair
        # (s, s+1), sample s+1 reads an observed-negative corner, so its
        # containing mip cell flags (see _build_mip_table) — the first flag
        # c of that run satisfies c <= s+1, i.e. the crossing is never
        # BEFORE a run. But the mip min-pools a (f+2)^3 voxel neighborhood,
        # so a run starts up to ~(f+1) voxels (more at oblique incidence)
        # before the crossing: each candidate (= flag RUN START) gets a
        # FORWARD window long enough to cover that early-flag distance at
        # the nominal step, and the full-res crossing rule runs on the
        # window's consecutive zs pairs — bit-identical depths to the dense
        # march wherever both detect. Losses (graceful hint miss): >3
        # false-positive runs before the true crossing, grazing incidence
        # beyond MIP_WINDOW_VOXELS, clip-shortened steps.
        Ym_ = Y // MIP_FACTOR

        def mip_sample(zs_flat):
            m_ = zs_flat.shape[0] // n
            v = ov[None] + zs_flat.reshape(m_, 1, n) * dv[None]
            v = jnp.clip(
                v.transpose(0, 2, 1).reshape(-1, 3),
                0.0,
                jnp.asarray([X - 1, Y - 1, Z - 1], jnp.float32) - 1e-4,
            )
            cell = jnp.floor(v).astype(jnp.int32) // MIP_FACTOR
            row = jnp.take(rt.mip, cell[:, 0] * Ym_ + cell[:, 1], axis=0)
            lane = jnp.arange(128, dtype=jnp.int32)
            return jnp.sum(
                jnp.where(lane[None] == cell[:, 2:3],
                          row.astype(jnp.float32), 0.0),
                axis=-1,
            )

        mvals = mip_sample(zs.reshape(-1)).reshape(Sc, n)
        flags = (mvals <= 0.0) & hit_box[None]
        # candidates = flag run starts (a run's interior samples are the
        # same surface's halo — separate candidates there would waste the
        # budget inside one run, as the r4 bisection of the all-invalid
        # failure showed)
        runs = flags & ~jnp.concatenate(
            [jnp.zeros((1, n), bool), flags[:-1]], axis=0
        )
        sidx = jnp.arange(Sc, dtype=jnp.int32)[:, None]
        c1 = jnp.argmax(runs, axis=0)
        a1 = jnp.any(runs, axis=0)
        m2 = runs & (sidx > c1[None])
        c2 = jnp.argmax(m2, axis=0)
        a2 = jnp.any(m2, axis=0)
        m3 = m2 & (sidx > c2[None])
        c3 = jnp.argmax(m3, axis=0)
        a3 = jnp.any(m3, axis=0)

        # forward window: early-flag distance (MIP_WINDOW_VOXELS) at the
        # nominal (unclipped) step, one sample of back-slack, pairs across
        # consecutive window samples. Static shape; reuses the zs grid.
        dz_nom = (max_depth - min_depth) / (Sc - 1)
        fwd = int(np.ceil(MIP_WINDOW_VOXELS * rt.voxel_size / dz_nom)) + 1
        Wn = min(Sc, fwd + 2)                               # samples/window
        cand = jnp.stack([c1, c2, c3], axis=0)              # (3, N)
        offs = jnp.arange(-1, Wn - 1, dtype=jnp.int32)
        widx = jnp.clip(
            cand[:, None] + offs[None, :, None], 0, Sc - 1
        ).reshape(3 * Wn, n)
        zw = jnp.take_along_axis(zs, widx, axis=0)          # (3*Wn, N)
        wvals_flat, _, wwm_flat = sample(zw.reshape(-1))
        wvals = wvals_flat.reshape(3 * Wn, n)
        wobs = wwm_flat.reshape(3 * Wn, n) > weight_epsilon

        # pair starts: consecutive offsets within each candidate's window
        p0 = jnp.asarray(
            [c * Wn + j for c in range(3) for j in range(Wn - 1)], jnp.int32
        )
        pv0 = wvals[p0]
        pv1 = wvals[p0 + 1]                                 # (3*(Wn-1), N)
        pobs = wobs[p0] & wobs[p0 + 1]
        cand_ok = jnp.concatenate(
            [jnp.broadcast_to(a[None], (Wn - 1, n)) for a in (a1, a2, a3)],
            axis=0,
        )
        # a clipped window index duplicates a sample (pair of equal index):
        # (v > 0) & (v <= 0) is then False by construction, no extra mask
        pcross = (pv0 > 0) & (pv1 <= 0) & pobs & cand_ok & hit_box[None]

        pfirst = jnp.argmax(pcross, axis=0)                 # windows are in
        valid = jnp.any(pcross, axis=0)                     # ray order
        start = jnp.take(p0, pfirst)                        # (N,)
        v0 = jnp.take_along_axis(wvals, start[None], axis=0)[0]
        v1 = jnp.take_along_axis(wvals, start[None] + 1, axis=0)[0]
        z_lo = jnp.take_along_axis(zw, start[None], axis=0)[0]
    else:
        # ---- dense coarse pass: bracket the first crossing ----
        vals_flat, _, wmins_flat = sample(zs.reshape(-1))
        vals = vals_flat.reshape(Sc, n)
        wts = wmins_flat.reshape(Sc, n)

        # gate on the min CONTRIBUTING corner weight: blended weights fake
        # observedness at observed/unobserved boundaries (_trilinear_from_row)
        observed = wts > weight_epsilon
        prev_vals, cur_vals = vals[:-1], vals[1:]
        crossing = (prev_vals > 0) & (cur_vals <= 0) & observed[:-1] & observed[1:]
        crossing = crossing & hit_box[None]

        first = jnp.argmax(crossing, axis=0)  # (N,) first True (0 if none)
        valid = jnp.any(crossing, axis=0)

        v0 = jnp.take_along_axis(prev_vals, first[None], axis=0)[0]
        v1 = jnp.take_along_axis(cur_vals, first[None], axis=0)[0]
        z_lo = jnp.take_along_axis(zs, first[None], axis=0)[0]  # (N,)

    frac = v0 / jnp.maximum(v0 - v1, 1e-12)
    depth_coarse = z_lo + frac * dz

    # ---- fine pass: re-march the bracketing interval ----
    uf = jnp.linspace(0.0, 1.0, Sf)
    zf = z_lo[None] + uf[:, None] * dz[None]                    # (Sf, N)
    fvals_flat, _, fwmins_flat = sample(zf.reshape(-1))
    fvals = fvals_flat.reshape(Sf, n)
    fobs = fwmins_flat.reshape(Sf, n) > weight_epsilon
    fcross = (fvals[:-1] > 0) & (fvals[1:] <= 0) & fobs[:-1] & fobs[1:]
    ffirst = jnp.argmax(fcross, axis=0)
    fvalid = jnp.any(fcross, axis=0)
    fv0 = jnp.take_along_axis(fvals[:-1], ffirst[None], axis=0)[0]
    fv1 = jnp.take_along_axis(fvals[1:], ffirst[None], axis=0)[0]
    ffrac = fv0 / jnp.maximum(fv0 - fv1, 1e-12)
    depth_fine = (
        jnp.take_along_axis(zf, ffirst[None], axis=0)[0] + ffrac * dz / (Sf - 1)
    )
    # coarse endpoints bracketed a sign change, so the fine pass almost
    # always re-finds it; fall back to the coarse interpolation otherwise
    depth = jnp.where(fvalid, depth_fine, depth_coarse)

    _, surf_w, _ = sample(depth)

    depth = jnp.where(valid, depth, jnp.nan)
    return (
        depth.reshape(height, width),
        jnp.where(valid, surf_w, 0.0).reshape(height, width),
        valid.reshape(height, width),
    )
