"""Fused TSDF-integrate Pallas kernel — depth sampling as one-hot matmuls.

Replaces the gather-bound XLA integrate path (``tools/tsdf.py``
``integrate_depth`` dense strategy; reference math:
src/doubletake/tools/tsdf.py:414-558 TSDFFuser.integrate_depth) for the
production volume shapes. The XLA path's cost is one serialized row gather
per voxel (~2.5 ns/row x 11-18M voxels = 30-45 ms/frame, PERF_NOTES); this
kernel reformulates the per-voxel nearest depth sample as MXU work:

  * the volume is processed as (8, Z) row blocks of its natural
    (X*Y, Z) layout — no transposes of the 46 MB volume;
  * each block is split into 32-lane z sub-tiles. Measured on the bench
    trajectory (scripts/probe_integrate_footprint.py): a sub-tile's needed
    samples (in-image, 0 < z_cam < max_depth) span a narrow image-x band
    (p99 = 37 px) but a wide image-y range — so the kernel one-hot-selects
    the x coordinate by a stacked (256, BX) @ (BX, 2*Hp) matmul against a
    BX=64 x-band of the TRANSPOSED depth image, keeping the full image-y
    extent in lanes, then selects y with a VPU one-hot reduce;
  * sub-tiles whose x span exceeds the band fall back IN-KERNEL to the
    same matmul against the full image width (per-tile, no whole-frame
    fallback); sub-tiles with no needed samples skip the matmuls entirely
    (~55% of the volume outside the frustum);
  * nearest sampling is EXACT in f32: the depth image is pre-split into
    bf16 hi/lo halves ([hi | lo] along lanes, one matmul selects both) and
    recombined in f32 — a plain bf16 matmul would cost ~1 cm of depth
    error inside a 6 cm truncation band;
  * the fusion update (InfiniTAM confidence, truncation clamp, running
    weighted mean — the exact ``_voxel_update`` math) runs elementwise on
    the block in VMEM and writes the updated values/weights in place
    (input_output_aliases), so integrate costs one volume read + write.

The depth image is grid-invariant: it is DMA'd to VMEM once at the first
grid step (the VMEM-blocked alternative would re-copy it every step —
the round-1 fused-volume pitfall).

Association caveat: cam = P @ (origin + idx * voxel_size) is computed in
the same operation order as the XLA path, but fma/reassociation noise can
flip ``rint`` ties on exact half-pixel boundaries, so a voxel may rarely
sample the neighboring pixel. Tests therefore assert parity on smooth
depth + a bounded mismatch fraction on random depth.

Measured on the chip (round 3, 18.5M voxels, 192x256 depth): 29 ms/frame
in-graph marginal vs 56 ms for the XLA gather path; parity vs XLA over 3
chained realistic-pose frames: mean |dv| 2.7e-6, p99.9 3.0e-4, mismatch
fraction 1.3e-5 (rint ties), weight mass equal to 1e-5 relative.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LSUB = 32   # z sub-tile lanes (band statistics measured at this width)
ROWS = 32   # volume rows (consecutive in the flattened X*Y order) per
            # sampling sub-block. The x-band span of a sub-tile is driven
            # by its z extent, not its row count (rows in a group share x
            # and step only in y): measured spans at the bench pose are
            # p99 = 56 px at 8 rows vs 61 px at 32 — so 4x taller groups
            # cost almost no extra full-width fallbacks while cutting the
            # sub-tile count (branch sets, small-matmul issues, VMEM
            # round-trips) 4x: 24.3 -> ~? ms (round 4)
BLOCK_ROWS = 64  # volume rows per GRID STEP (ROWS-row sub-blocks inside):
            # the per-step fixed cost (sync + block DMA latency) dominated
            # the round-3 kernel at 8 rows/step (X*Y/8 ~ 14k steps for the
            # bench volume ~= most of its 29 ms); 64 rows/step cuts the
            # step count 8x at unchanged per-row compute
BX = 64     # static image-x band width (covers p99 spans with the
            # 16-alignment slack; wider tiles fall back to full width)


def _transpose(mat_rc, identity_cc):
    """(R, C) -> (C, R) via an identity matmul (Mosaic-friendly; the
    dim-0-contracted dot_general alternative forces per-call operand
    transposes — the round-1 fused-volume pitfall)."""
    return jax.lax.dot_general(
        identity_cc, mat_rc, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _sample_tile(ix, iy, needf, x0, bxn, depth_vmem, consts, hp, wp):
    """Nearest-sample the depth image at (iy, ix) for one (ROWS, L)
    sub-tile via stacked one-hot matmuls. needf gates contributions (0/1);
    gated-out voxels sample 0 (the XLA path's where(in_img, ., 0)).

    Returns (ROWS, L) f32 samples.
    """
    id_l, id_r, y_iota = consts
    L, R = ix.shape[1], ROWS

    cat = jnp.concatenate([ix, iy, needf], axis=0)        # (3R, L)
    cols = _transpose(cat, id_l)                          # (L, 3R)
    ix_c, iy_c, m_c = cols[:, :R], cols[:, R:2 * R], cols[:, 2 * R:]

    # stacked x one-hots, the need mask folded into the weight. The iota is
    # built at width bxn directly: a static lane-slice of a wider iota
    # crashes Mosaic layout inference on this toolchain (array.h CHECK,
    # limits 4 vs 1) whenever bxn < wp — found by bisection, round 3.
    u = jax.lax.broadcasted_iota(jnp.int32, (ix_c.shape[0], bxn), 1).astype(
        jnp.float32)
    Wx = jnp.concatenate(
        [
            jnp.where(
                u == ix_c[:, r:r + 1] - x0,
                m_c[:, r:r + 1], 0.0,
            )
            for r in range(R)
        ],
        axis=0,
    ).astype(jnp.bfloat16)                                # (RL, bxn)

    # hi/lo recombination INSIDE the matmul: the depth stack holds the bf16
    # hi rows at [0, wp) and the lo rows at [wp, 2wp) (same x layout), so
    # contracting [Wx | Wx] against the two sublane bands sums the exact
    # products in the MXU's f32 accumulator — one matmul of K=2*bxn (128 at
    # the default band: full systolic depth vs 50% at K=64), HALF the
    # output lanes of the former [hi | lo]-along-lanes form, and no
    # (RL, hp)+(RL, hp) VPU recombination pass afterwards.
    x0i = x0.astype(jnp.int32)
    band = jnp.concatenate(
        [depth_vmem[pl.ds(pl.multiple_of(x0i, 16), bxn), :],
         depth_vmem[pl.ds(pl.multiple_of(x0i + wp, 16), bxn), :]], axis=0,
    )
    Wx2 = jnp.concatenate([Wx, Wx], axis=1)               # (RL, 2*bxn)
    R1 = jnp.dot(Wx2, band, preferred_element_type=jnp.float32)  # (RL, Hp)

    import os as _os
    if _os.environ.get("DT_SKIP_YSEL"):
        # Timing ablation ONLY (trace-time, like DT_FORCE_FLAG): skip the
        # per-row y-select loop, returning garbage of the right shape —
        # isolates the loop's cost from the sampling matmul's. Corrupts
        # results; never set outside scripts/probe_integrate_parts.py.
        return _transpose(R1[:L, :R], id_r) * 0.0 + _transpose(
            R1[L:2 * L, :R] if 2 * L <= R1.shape[0] else R1[:L, :R], id_r)

    # y-select per row -> (L, R), then one transpose back to (R, L). The
    # transpose matmul runs at bf16 operand precision on the MXU, which
    # would cost ~2^-8 relative on the sampled depths (~8 mm — enough to
    # flip `valid` near the truncation boundary; measured 1% voxel
    # mismatch on hardware, round 3) — so the depths are split hi/lo and
    # transposed in two exact passes (the identity operand is exact bf16).
    parts = []
    for r in range(R):
        # select-then-reduce (no separate one-hot multiply: the where IS the
        # mask, one fewer VPU pass over the hp lanes)
        parts.append(
            jnp.sum(
                jnp.where(y_iota == iy_c[:, r:r + 1],
                          R1[r * L:(r + 1) * L, :], 0.0),
                axis=1, keepdims=True,
            )
        )
    samp_cols = jnp.concatenate(parts, axis=1)            # (L, R)
    bits = jax.lax.bitcast_convert_type(samp_cols, jnp.int32)
    s_hi = jax.lax.bitcast_convert_type(bits & jnp.int32(-65536), jnp.float32)
    return _transpose(s_hi, id_r) + _transpose(samp_cols - s_hi, id_r)


def _kernel(
    ids_ref, vals_ref, wts_ref, depth_any_ref, scal_ref, x0_ref, flags_ref,
    outv_ref, outw_ref,
    depth_vmem, samp_vmem, copy_sem,
    *, Y: int, Z: int, H: int, W: int, hp: int, wp: int, block_rows: int,
    min_depth: float, max_depth: float, truncation: float,
    trunc_check: float, w_rate: float, debug_out: bool = False,
):
    b = pl.program_id(0)
    # The BLOCK this step processes: ids_ref[b], NOT the grid step index —
    # the block-sparse grid visits blocks out of order (active first), and
    # the voxel coordinates below must be those of the block actually in
    # VMEM (the index maps deliver vals/wts/x0/flags for ids_ref[b]).
    blk = ids_ref[b]

    @pl.when(b == 0)
    def _copy_depth():
        copy = pltpu.make_async_copy(depth_any_ref, depth_vmem, copy_sem)
        copy.start()
        copy.wait()

    R = ROWS
    id_r = (
        jax.lax.broadcasted_iota(jnp.int32, (R, R), 0)
        == jax.lax.broadcasted_iota(jnp.int32, (R, R), 1)
    ).astype(jnp.float32)

    # sub-tile sizes: LSUB lanes each plus one 8-multiple tail (volume dims
    # are only guaranteed multiples of VOX_MOD=8)
    tiles = [LSUB] * (Z // LSUB)
    if Z % LSUB:
        tiles.append(Z % LSUB)

    def consts_for(L):
        id_l = (
            jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
        ).astype(jnp.float32)
        y_iota = jax.lax.broadcasted_iota(jnp.int32, (L, hp), 1).astype(
            jnp.float32)
        return (id_l, id_r, y_iota)

    tile_consts = {L: consts_for(L) for L in set(tiles)}

    # P @ (origin + idx * vs): same op order as the XLA path
    p = [scal_ref[0, n] for n in range(12)]
    ox, oy, oz, vs = (scal_ref[0, 12 + n] for n in range(4))

    for g in range(block_rows // R):
        _row_group(
            g, blk * block_rows + g * R, vals_ref, wts_ref, outv_ref, outw_ref,
            depth_vmem, samp_vmem, x0_ref, flags_ref, tiles, tile_consts, p,
            (ox, oy, oz, vs), Y=Y, H=H, W=W, hp=hp, wp=wp,
            min_depth=min_depth, max_depth=max_depth, truncation=truncation,
            trunc_check=trunc_check, w_rate=w_rate, debug_out=debug_out,
        )


def _row_group(
    g, row0, vals_ref, wts_ref, outv_ref, outw_ref, depth_vmem, samp_vmem,
    x0_ref, flags_ref, tiles, tile_consts, p, origin_vs,
    *, Y, H, W, hp, wp, min_depth, max_depth, truncation, trunc_check,
    w_rate, debug_out,
):
    """One ROWS-row sampling sub-block (its own x-band) of a grid block.

    Rows are consecutive in the flattened X*Y order and may straddle an x
    boundary (row -> (x, y) is recovered per row via //Y and %Y), so grid
    blocks need no divisibility relation with Y."""
    R = ROWS
    ox, oy, oz, vs = origin_vs

    vparts, wparts = [], []
    z_off = 0
    for t_idx, L in enumerate(tiles):
        consts = tile_consts[L]
        sub_i = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0) + row0
        i_f = (sub_i // Y).astype(jnp.float32)
        j_f = (sub_i % Y).astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (R, L), 1).astype(
            jnp.float32) + float(z_off)
        cx = ox + i_f * vs
        cy = oy + j_f * vs
        cz = oz + lane * vs
        cam0 = p[0] * cx + p[1] * cy + p[2] * cz + p[3]
        cam1 = p[4] * cx + p[5] * cy + p[6] * cz + p[7]
        zc = p[8] * cx + p[9] * cy + p[10] * cz + p[11]

        px = cam0 / zc
        py = cam1 / zc
        ix = jnp.rint(px - 0.5)
        iy = jnp.rint(py - 0.5)
        need = (
            (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
            & (zc > 0) & (zc < max_depth)
        )
        needf = need.astype(jnp.float32)
        # Sanitize BEFORE the transpose matmul: a voxel with zc ~ 0 divides
        # to inf/NaN, and one non-finite lane poisons its whole transpose
        # output column (0 * inf = NaN on the MXU just like IEEE).
        ix = jnp.where(need, ix, -1.0)
        iy = jnp.where(need, iy, -1.0)

        # band decision from the HOST-SIDE (XLA) per-voxel precompute,
        # delivered per sub-tile through SMEM: flag 0 = skip (no voxel can
        # contribute), 1 = banded sample at x0, 2 = full-width sample. The
        # round-3/4 kernel derived these IN-kernel via vector min/max
        # reductions + branches on the resulting scalars — every such
        # vector->scalar branch is a pipeline sync, and at ~44k sub-tiles
        # that control overhead dominated the kernel (27 ms measured vs
        # ~5 ms of actual matmul+VPU work). SMEM-scalar branches are the
        # cheap kind (the block-sparse skipping pattern).
        flag = flags_ref[0, g, t_idx]
        x0i = x0_ref[0, g, t_idx]
        x0f = x0i.astype(jnp.float32)

        @pl.when(flag == 1)
        def _banded():
            samp_vmem[:, :L] = _sample_tile(
                ix, iy, needf, x0f, BX, depth_vmem, consts, hp, wp
            )

        @pl.when(flag == 2)
        def _full():
            samp_vmem[:, :L] = _sample_tile(
                ix, iy, needf, jnp.float32(0.0), wp, depth_vmem, consts, hp, wp
            )

        @pl.when(flag == 0)
        def _skip():
            samp_vmem[:, :L] = jnp.zeros((R, L), jnp.float32)

        sampled = samp_vmem[:, :L]

        if debug_out:
            # diagnostic mode: expose per-voxel (sampled, packed pixel id)
            vparts.append(sampled)
            wparts.append(jnp.where(need, ix * 256.0 + iy, -1.0))
            z_off += L
            continue

        vparts.append(sampled)
        wparts.append(zc)
        z_off += L

    if debug_out:
        outv_ref[g * R:(g + 1) * R, :] = jnp.concatenate(vparts, axis=1)
        outw_ref[g * R:(g + 1) * R, :] = jnp.concatenate(wparts, axis=1)
        return

    # ---- _voxel_update math, ONE full-width (R, Z) elementwise pass ----
    # The per-(R, LSUB)-tile form ran every VPU op at 32 of 128 lanes and
    # issued ~15 ops per tile; concatenating the per-tile samples/zc first
    # runs the same math once per row group at full lane occupancy.
    sampled = jnp.concatenate(vparts, axis=1)             # (R, Z)
    zc = jnp.concatenate(wparts, axis=1)                  # (R, Z)
    conf = jnp.clip(
        1.0 - (sampled - min_depth) / (max_depth - min_depth), 0.25, 1.0
    )
    conf = conf * conf
    dist = sampled - zc
    tsdfv = jnp.clip(dist / truncation, -1.0, 1.0)
    valid = (zc > 0) & (dist > trunc_check) & (sampled > 0) & (zc < max_depth)
    new_w = conf * w_rate
    old_v = vals_ref[g * R:(g + 1) * R, :]
    old_w = wts_ref[g * R:(g + 1) * R, :]
    total = old_w + new_w
    fused = (old_v * old_w + tsdfv * new_w) / total
    outv_ref[g * R:(g + 1) * R, :] = jnp.where(valid, fused, old_v)
    outw_ref[g * R:(g + 1) * R, :] = jnp.where(
        valid, jnp.minimum(total, 1.0), old_w)


@functools.partial(
    jax.jit,
    static_argnames=("voxel_size", "min_depth", "max_depth", "truncation",
                     "trunc_check", "w_rate", "interpret", "debug_out",
                     "sparse"),
)
def fused_integrate(
    values_xyz,
    weights_xyz,
    depth_hw,
    P_34,
    origin_3,
    *,
    voxel_size: float,
    min_depth: float,
    max_depth: float,
    truncation: float,
    trunc_check: float,
    w_rate: float,
    interpret: bool = False,
    debug_out: bool = False,
    sparse: bool = True,
):
    """One TSDF fusion step on the full volume. Exact ``_voxel_update``
    math (bar fma noise and <=2e-5 m hi/lo recombination error); returns
    (new_values, new_weights).

    Requirements (the caller gates and falls back to XLA otherwise):
    (X * Y) % ROWS == 0 (flattened row groups), Z % 8 == 0, float32
    volume, no color fusion.
    """
    X, Y, Z = values_xyz.shape
    H, W = depth_hw.shape
    assert (X * Y) % ROWS == 0 and Z % 8 == 0
    hp = -(-H // 128) * 128
    wp = max(-(-W // 16) * 16, BX)

    # Sanitize: a NaN/inf ANYWHERE in the depth image would poison every
    # sample whose band contains it (0 * NaN = NaN in the one-hot matmul),
    # unlike the XLA gather which only reads the selected pixel. NaN -> 0
    # (invalid, matching the XLA path where NaN fails every comparison);
    # |depth| is clamped so the bf16 hi half cannot overflow to inf.
    depth = depth_hw.astype(jnp.float32)
    depth = jnp.clip(jnp.where(jnp.isnan(depth), 0.0, depth), -1e30, 1e30)
    # hi/lo split via mantissa bit-masking, NOT `depth - bf16(depth)`: under
    # jit, XLA's excess-precision simplifier treats the f32->bf16->f32
    # round-trip as identity and folds lo to ZERO — on hardware the kernel
    # then returns bf16-rounded depths (8 mm at 2 m; found round 3 when the
    # on-chip sampled error matched |depth - bf16(depth)| bit-exactly). The
    # masked hi is exactly bf16-representable so its convert never rounds,
    # and no convert pair exists for the simplifier to cancel.
    hi_f32 = jax.lax.bitcast_convert_type(
        jax.lax.bitcast_convert_type(depth, jnp.int32) & jnp.int32(-65536),
        jnp.float32,
    )
    hi = hi_f32.astype(jnp.bfloat16)
    lo = (depth - hi_f32).astype(jnp.bfloat16)
    # hi rows at [0, wp), lo rows at [wp, 2wp): the kernel contracts
    # [Wx | Wx] against both bands in ONE K-stacked matmul (see _sample_tile)
    stack = jnp.zeros((2 * wp, hp), jnp.bfloat16)
    stack = stack.at[:W, :H].set(hi.T).at[wp:wp + W, :H].set(lo.T)

    scal = jnp.concatenate(
        [P_34.reshape(-1).astype(jnp.float32),
         origin_3.astype(jnp.float32),
         jnp.asarray([voxel_size], jnp.float32)]
    ).reshape(1, 16)

    # rows per grid step: BLOCK_ROWS when it divides the flattened row
    # count (VOX_MOD=8 on both X and Y makes X*Y a multiple of 64), else
    # the largest power-of-two sub-block that does
    br = BLOCK_ROWS
    while (X * Y) % br:
        br //= 2
    assert br >= ROWS, (X, Y)

    # ---- host-side (XLA) band/skip decisions per (row-group, z-tile) ----
    # The in-kernel variant derived these from per-voxel vector min/max +
    # branches on the resulting scalars; each vector->scalar branch is a
    # pipeline sync, and at X*Y/8 * ceil(Z/LSUB) sub-tiles that control
    # overhead dominated the kernel (27 of ~29 ms measured, round 4).
    # The decisions are EXACT per-voxel reductions, not box-corner bounds:
    # corner bounds cannot classify boxes whose z_cam crosses 0 (the whole
    # first z-tile whenever the camera plane cuts the volume) and sent 20%
    # of sub-tiles down the 4x-wide full-width path — measured SLOWER than
    # the in-kernel variant (35.7 vs 29 ms). Here XLA recomputes the
    # kernel's own need/ix formulas (fused into the segment min/max, so
    # the per-voxel intermediates never hit HBM) with a +-1 px margin for
    # fma/rint association noise; per-voxel `need` gating inside the
    # kernel remains authoritative for correctness either way. Exact flags
    # at the bench pose: 73% skip, 27% banded, 0.2% full-width.
    R_ = ROWS
    tiles_l = [LSUB] * (Z // LSUB) + ([Z % LSUB] if Z % LSUB else [])
    T = len(tiles_l)
    n_groups = X * Y // R_

    P = P_34.astype(jnp.float32)
    o = origin_3.astype(jnp.float32)
    vs = jnp.float32(voxel_size)
    zpad = T * LSUB  # the short tail tile padded out with need=False
    rows_i = jnp.arange(X * Y, dtype=jnp.int32)
    i_f = (rows_i // Y).astype(jnp.float32)[:, None]
    j_f = (rows_i % Y).astype(jnp.float32)[:, None]
    iz = jnp.arange(zpad, dtype=jnp.int32)[None, :]
    cx = o[0] + i_f * vs
    cy = o[1] + j_f * vs
    czv = o[2] + iz.astype(jnp.float32) * vs
    cam0 = P[0, 0] * cx + P[0, 1] * cy + P[0, 2] * czv + P[0, 3]
    cam1 = P[1, 0] * cx + P[1, 1] * cy + P[1, 2] * czv + P[1, 3]
    zc = P[2, 0] * cx + P[2, 1] * cy + P[2, 2] * czv + P[2, 3]
    zc_s = jnp.where(zc == 0, 1e-9, zc)
    pix = jnp.rint(cam0 / zc_s - 0.5)
    piy = jnp.rint(cam1 / zc_s - 0.5)
    # +-1 px / 1e-6 relative slack vs the kernel's own per-voxel `need`:
    # the skip decision (flag==0) and band placement below come from THIS
    # needv, and an XLA-vs-Mosaic fma/rint divergence at an image-edge or
    # zc~max_depth boundary voxel must widen the band / take the sub-tile
    # down the banded path (where the kernel's exact need decides), never
    # silently classify it as skip.
    needv = (
        (pix >= -1) & (pix < W + 1) & (piy >= -1) & (piy < H + 1)
        & (zc > -1e-6) & (zc < max_depth * (1.0 + 1e-6)) & (iz < Z)
    )
    ix4 = jnp.where(needv, pix, jnp.inf).reshape(n_groups, R_, T, LSUB)
    ix_min = jnp.min(ix4, axis=(1, 3))                           # (nG, T)
    ix_max = jnp.max(
        jnp.where(needv, pix, -jnp.inf).reshape(n_groups, R_, T, LSUB),
        axis=(1, 3),
    )
    any_need = jnp.isfinite(ix_min)
    x0g = jnp.clip(
        jnp.floor((jnp.where(any_need, ix_min, 0.0) - 1.0) / 16.0) * 16.0,
        0.0, float(wp - BX),
    )
    fits = ix_max + 1.0 < x0g + BX
    flag = jnp.where(any_need, jnp.where(fits, 1, 2), 0).astype(jnp.int32)
    G_ = br // R_
    nb = X * Y // br
    x0_arr = x0g.astype(jnp.int32).reshape(nb, G_, T)
    flag_arr = flag.reshape(nb, G_, T)
    import os as _os
    if _os.environ.get("DT_FORCE_FLAG"):
        # Timing ablation only. Read at TRACE time: toggling it after the
        # first compile for a shape has no effect (jit cache). Only the
        # full-width path (flag=2) is forceable — it stays numerically
        # correct for every sub-tile; forcing flag=1 would band sub-tiles
        # whose x-span exceeds BX and silently drop their updates.
        forced = int(_os.environ["DT_FORCE_FLAG"])
        if forced != 2:
            raise ValueError(
                "DT_FORCE_FLAG only supports 2 (full-width); other values "
                "corrupt fusion results"
            )
        flag_arr = jnp.full_like(flag_arr, forced)

    # ---- block-sparse grid: visit only blocks with >=1 non-skip sub-tile ----
    # The flags already skip the sampling matmuls for out-of-frustum
    # sub-tiles, but every (br, Z) block was still DMA'd HBM->VMEM->HBM
    # (the whole 148 MB volume, twice, per frame). With a scalar-prefetched
    # block-id list the grid processes the ACTIVE blocks first (ascending
    # id) and the trailing slots revisit one inactive block: Pallas
    # elides both copies when consecutive steps map to the same block, so
    # padded steps are ~free, and `input_output_aliases` means unvisited
    # blocks simply retain their HBM contents (exactly the skip result:
    # flag 0 => sampled 0 => valid False => old values written back).
    # Grid size stays static (nb) so per-shape compiles are unchanged.
    if sparse and not debug_out:
        block_active = jnp.any(flag_arr != 0, axis=(1, 2))        # (nb,)
        count = jnp.sum(block_active.astype(jnp.int32))
        order = jnp.argsort(
            jnp.logical_not(block_active), stable=True
        ).astype(jnp.int32)
        if interpret:
            # The interpreter neither elides same-index copies nor defers
            # the output flush, so a trailing repeat would re-read the
            # aliased (already updated) block and integrate it twice. The
            # full permutation (every block exactly once, active first) is
            # output-identical and exercises the same prefetch plumbing.
            block_ids = order
        else:
            # Repeat padding is idempotent ON TPU by the pipeline's revisit
            # contract (jax/_src/pallas/mosaic/pipeline.py: copies and
            # flushes fire only when the block indices CHANGE): the repeats
            # recompute from the unchanged VMEM input block and the single
            # final flush writes that same result. Pad with an INACTIVE
            # block (order[-1]), not the last active one: an inactive
            # block's flags are all skip, so each repeat costs only the
            # per-sub-tile flag checks (~us) instead of re-running a full
            # 64-row sampling pass per padded step (measured: last-active
            # padding cost +2 ms at 95% coverage — worse than dense).
            # When every block is active (count == nb) there are no padded
            # steps, so order[-1] being active is harmless.
            block_ids = jnp.where(
                jnp.arange(nb, dtype=jnp.int32) < count, order, order[-1]
            )
    else:
        block_ids = jnp.arange(nb, dtype=jnp.int32)

    kern = functools.partial(
        _kernel, Y=Y, Z=Z, H=H, W=W, hp=hp, wp=wp, block_rows=br,
        min_depth=float(min_depth), max_depth=float(max_depth),
        truncation=float(truncation), trunc_check=float(trunc_check),
        w_rate=float(w_rate), debug_out=debug_out,
    )
    nv, nw = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec((br, Z), lambda b, ids: (ids[b], 0)),
                pl.BlockSpec((br, Z), lambda b, ids: (ids[b], 0)),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((1, br // ROWS, len(tiles_l)),
                             lambda b, ids: (ids[b], 0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((1, br // ROWS, len(tiles_l)),
                             lambda b, ids: (ids[b], 0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=[
                pl.BlockSpec((br, Z), lambda b, ids: (ids[b], 0)),
                pl.BlockSpec((br, Z), lambda b, ids: (ids[b], 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((2 * wp, hp), jnp.bfloat16),
                pltpu.VMEM((ROWS, LSUB), jnp.float32),
                pltpu.SemaphoreType.DMA(()),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((X * Y, Z), jnp.float32),
            jax.ShapeDtypeStruct((X * Y, Z), jnp.float32),
        ],
        input_output_aliases={1: 0, 2: 1},
        interpret=interpret,
    )(
        block_ids,
        values_xyz.reshape(X * Y, Z),
        weights_xyz.reshape(X * Y, Z),
        stack,
        scal,
        x0_arr,
        flag_arr,
    )
    return nv.reshape(X, Y, Z), nw.reshape(X, Y, Z)
