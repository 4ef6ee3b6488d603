"""Parity tests for the fused Pallas integrate kernel (interpret mode, CPU).

The kernel runs the exact ``_voxel_update`` math with matmul-formulated
depth sampling; parity is asserted against the dense XLA integrate on
smooth depth (rint-tie association noise can flip a nearest-pixel choice,
so random depth gets a mismatch-fraction bound instead — see the module
docstring of ops/pallas/integrate.py). On-TPU parity is additionally
asserted by bench.py's chained volume and by tests on the real chip run
manually (PERF_NOTES round 3)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from doubletake_tpu.ops.pallas.integrate import fused_integrate
from doubletake_tpu.tools.tsdf import TSDF, FusionConfig, integrate_depth

H, W = 48, 64


def _camera(yaw=0.3, pitch=-0.25, pos=(0.4, 0.3, 1.2)):
    cy, sy = np.cos(yaw), np.sin(yaw)
    cp, sp = np.cos(pitch), np.sin(pitch)
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rx = np.array([[1, 0, 0], [0, cp, -sp], [0, sp, cp]])
    # camera looks along +x_world-ish with some tilt; rows below build a
    # world_T_cam with z_cam = forward
    fwd = Ry @ Rx @ np.array([0.0, 0.0, 1.0])
    up = np.array([0.0, 0.0, -1.0])
    right = np.cross(fwd, up); right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    T = np.eye(4, dtype=np.float32)
    T[:3, 0], T[:3, 1], T[:3, 2], T[:3, 3] = right, down, fwd, pos
    return T


def _K():
    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = 0.7 * W
    K[0, 2], K[1, 2] = W / 2, H / 2
    return K


def _smooth_depth(seed=0):
    rng = np.random.RandomState(seed)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    d = (1.5 + 0.4 * np.sin(xs / 17.0 + rng.rand()) +
         0.3 * np.cos(ys / 11.0 + rng.rand()))
    return d.astype(np.float32)[..., None]


def _run_both(tsdf, depth, cam_T_world, K, cfg):
    dense = integrate_depth(tsdf, jnp.asarray(depth), jnp.asarray(cam_T_world),
                            jnp.asarray(K), cfg, use_pallas=False)
    P_34 = jnp.matmul(jnp.asarray(K), jnp.asarray(cam_T_world))[:3]
    trunc = cfg.truncation_voxels * tsdf.voxel_size
    fv, fw = fused_integrate(
        tsdf.values, tsdf.weights, jnp.asarray(depth)[..., 0], P_34,
        tsdf.origin, voxel_size=tsdf.voxel_size, min_depth=cfg.min_depth,
        max_depth=cfg.max_depth, truncation=trunc,
        trunc_check=-trunc * (1.5 if cfg.extended_neg_truncation else 1.0),
        w_rate=cfg.update_rate / cfg.max_weight, interpret=True,
    )
    return dense, fv, fw


@pytest.mark.parametrize("extended,zmax", [(False, 2.56), (True, 2.56),
                                           (False, 1.6)])
def test_fused_integrate_parity_smooth(extended, zmax):
    """zmax=1.6 -> Z=40 = one 32-lane sub-tile + an 8-lane tail."""
    tsdf = TSDF.from_bounds(
        dict(xmin=-0.4, xmax=0.88, ymin=-0.3, ymax=0.98, zmin=0.0, zmax=zmax),
        0.04,
    )
    assert tsdf.dims[1] % 8 == 0
    cfg = FusionConfig(min_depth=0.4, max_depth=3.0,
                       extended_neg_truncation=extended)
    cam_T_world = np.linalg.inv(_camera()).astype(np.float32)
    dense, fv, fw = _run_both(tsdf, _smooth_depth(), cam_T_world, _K(), cfg)

    dv = np.abs(np.asarray(dense.values) - np.asarray(fv))
    dw = np.abs(np.asarray(dense.weights) - np.asarray(fw))
    # hi/lo recombination error <= ~2e-5 m -> tsdf noise ~2e-4; rint ties on
    # smooth depth move a sample to an adjacent (close-valued) pixel
    assert np.percentile(dv, 99.99) < 2e-3, dv.max()
    assert dv.max() < 5e-2
    assert np.percentile(dw, 99.99) < 2e-3
    # the frame must actually have fused something
    assert float(np.asarray(fw).max()) > 0.01


def test_fused_integrate_sequential_and_random_depth():
    """Three chained frames with random (rough) depth: bound the mismatch
    fraction (rint ties on rough depth sample genuinely different values)
    and require exact-ish agreement elsewhere."""
    tsdf = TSDF.from_bounds(
        dict(xmin=-0.4, xmax=0.88, ymin=-0.3, ymax=0.98, zmin=0.0, zmax=1.28),
        0.04,
    )
    cfg = FusionConfig(min_depth=0.4, max_depth=3.0)
    rng = np.random.RandomState(1)
    dense = tsdf
    fused = tsdf
    K = _K()
    for f in range(3):
        depth = (rng.rand(H, W, 1).astype(np.float32) * 1.5 + 0.6)
        cam_T_world = np.linalg.inv(
            _camera(yaw=0.3 + 0.2 * f, pos=(0.4, 0.3 + 0.1 * f, 1.2))
        ).astype(np.float32)
        dense = integrate_depth(dense, jnp.asarray(depth),
                                jnp.asarray(cam_T_world), jnp.asarray(K), cfg,
                                use_pallas=False)
        P_34 = jnp.matmul(jnp.asarray(K), jnp.asarray(cam_T_world))[:3]
        trunc = cfg.truncation_voxels * tsdf.voxel_size
        fv, fw = fused_integrate(
            fused.values, fused.weights, jnp.asarray(depth)[..., 0], P_34,
            tsdf.origin, voxel_size=tsdf.voxel_size, min_depth=cfg.min_depth,
            max_depth=cfg.max_depth, truncation=trunc, trunc_check=-trunc,
            w_rate=cfg.update_rate / cfg.max_weight, interpret=True,
        )
        fused = fused.replace(values=fv, weights=fw)

    dv = np.abs(np.asarray(dense.values) - np.asarray(fused.values))
    mismatch = float((dv > 1e-3).mean())
    assert mismatch < 2e-3, mismatch
    assert np.percentile(dv, 99.8) < 1e-3


def test_fused_integrate_empty_and_outside():
    """No valid depth -> volume unchanged; camera far outside the volume ->
    unchanged (all sub-tiles skip)."""
    tsdf = TSDF.from_bounds(
        dict(xmin=0.0, xmax=0.64, ymin=0.0, ymax=0.64, zmin=0.0, zmax=1.28),
        0.04,
    )
    cfg = FusionConfig(min_depth=0.4, max_depth=3.0)
    K = _K()
    zero_depth = np.zeros((H, W, 1), np.float32)
    cam_T_world = np.linalg.inv(_camera()).astype(np.float32)
    _, fv, fw = _run_both(tsdf, zero_depth, cam_T_world, K, cfg)
    np.testing.assert_array_equal(np.asarray(fw), 0.0)
    np.testing.assert_array_equal(np.asarray(fv), -1.0)

    far = _camera(pos=(50.0, 50.0, 50.0))
    _, fv, fw = _run_both(tsdf, _smooth_depth(), np.linalg.inv(far), K, cfg)
    np.testing.assert_array_equal(np.asarray(fw), 0.0)


def test_fused_integrate_nan_depth_isolated():
    """NaN depth pixels must invalidate ONLY their own samples — in the
    matmul formulation an unsanitized NaN would poison every voxel whose
    band contains it (0 * NaN = NaN)."""
    tsdf = TSDF.from_bounds(
        dict(xmin=-0.4, xmax=0.88, ymin=-0.3, ymax=0.98, zmin=0.0, zmax=2.56),
        0.04,
    )
    cfg = FusionConfig(min_depth=0.4, max_depth=3.0)
    depth = _smooth_depth()
    depth[10:20, 20:30] = np.nan
    cam_T_world = np.linalg.inv(_camera()).astype(np.float32)
    dense, fv, fw = _run_both(tsdf, depth, cam_T_world, _K(), cfg)
    assert np.isfinite(np.asarray(fv)).all()
    dv = np.abs(np.asarray(dense.values) - np.asarray(fv))
    assert np.percentile(dv, 99.99) < 2e-3
    assert float(np.asarray(fw).max()) > 0.01


def test_fused_integrate_sparse_matches_dense():
    """Block-sparse grid (scalar-prefetched block ids, active blocks first)
    must be bit-identical to the dense identity-order grid: the same blocks
    run the same math, only the visit order differs. The camera pose leaves
    a sizeable fraction of blocks inactive, so the permutation is
    non-trivial. (Repeat-padding elision is a TPU pipeline contract and is
    verified on-chip by scripts/probe_sparse_integrate.py; interpret mode
    uses the full permutation.)"""
    tsdf = TSDF.from_bounds(
        dict(xmin=-0.4, xmax=0.88, ymin=-0.3, ymax=0.98, zmin=0.0, zmax=2.56),
        0.04,
    )
    cfg = FusionConfig(min_depth=0.4, max_depth=3.0)
    depth = _smooth_depth()
    cam_T_world = np.linalg.inv(_camera()).astype(np.float32)
    P_34 = jnp.matmul(jnp.asarray(_K()), jnp.asarray(cam_T_world))[:3]
    trunc = cfg.truncation_voxels * tsdf.voxel_size
    kw = dict(
        voxel_size=tsdf.voxel_size, min_depth=cfg.min_depth,
        max_depth=cfg.max_depth, truncation=trunc, trunc_check=-trunc,
        w_rate=cfg.update_rate / cfg.max_weight, interpret=True,
    )
    sv, sw = fused_integrate(
        tsdf.values, tsdf.weights, jnp.asarray(depth)[..., 0], P_34,
        tsdf.origin, sparse=True, **kw)
    dv, dw = fused_integrate(
        tsdf.values, tsdf.weights, jnp.asarray(depth)[..., 0], P_34,
        tsdf.origin, sparse=False, **kw)
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(dv))
    np.testing.assert_array_equal(np.asarray(sw), np.asarray(dw))
    assert float(np.asarray(sw).max()) > 0.01


def test_integrate_depth_pallas_gate_cpu():
    """On CPU the auto gate must keep the XLA path (pallas interpret is not
    requested implicitly)."""
    tsdf = TSDF.from_bounds(
        dict(xmin=0.0, xmax=0.64, ymin=0.0, ymax=0.64, zmin=0.0, zmax=1.28),
        0.04,
    )
    cfg = FusionConfig()
    out = integrate_depth(
        tsdf, jnp.asarray(_smooth_depth()),
        jnp.asarray(np.linalg.inv(_camera()).astype(np.float32)),
        jnp.asarray(_K()), cfg,
    )
    assert out.values.shape == tsdf.values.shape
