"""Parity test for the fused Pallas volume kernel (interpret mode on CPU).

The kernel is shape-specialized (w=128, c=16); here it runs in Pallas
interpreter mode against the XLA FeatureVolume path on a small plane count.
On-TPU parity/perf is exercised separately (see ops/pallas/fused_volume.py
module docs and bench notes).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from doubletake_tpu.models.cost_volume import FeatureVolume
from doubletake_tpu.ops.pallas.fused_volume import (
    fused_feature_volume,
    pad_mlp_weights,
)

K, MH, MW, D = 3, 64, 128, 8


def fixture():
    rng = np.random.RandomState(0)
    Km = np.eye(4, dtype=np.float32)
    Km[0, 0] = Km[1, 1] = 60.0
    Km[0, 2], Km[1, 2] = MW / 2, MH / 2

    def pose(i):
        a = 0.01 * i
        T = np.eye(4, dtype=np.float32)
        T[0, 0] = T[2, 2] = np.cos(a)
        T[0, 2], T[2, 0] = np.sin(a), -np.sin(a)
        T[0, 3] = 0.08 * i
        return T

    src_T_cur = np.stack([pose(i + 1) for i in range(K)])
    cur_T_src = np.linalg.inv(src_T_cur).astype(np.float32)
    src_K = np.stack([Km] * K)
    cur_invK = np.linalg.inv(Km).astype(np.float32)
    curf = rng.randn(MH, MW, 16).astype(np.float32)
    srcf = rng.randn(K, MH, MW, 16).astype(np.float32)
    return curf, srcf, src_T_cur, cur_T_src, src_K, cur_invK


@pytest.mark.slow
def test_fused_volume_matches_xla_path_interpret_batched():
    """Batched (b=2) kernel vs the XLA path — the two batch elements get
    DIFFERENT poses so per-element geometry, in-kernel band computation,
    and the per-batch source-matrix DMA are all exercised."""
    curf, srcf, src_T_cur, cur_T_src, src_K, cur_invK = fixture()

    # second batch element: shifted features, different poses
    rng = np.random.RandomState(7)
    curf2 = rng.randn(*curf.shape).astype(np.float32)
    srcf2 = rng.randn(*srcf.shape).astype(np.float32)
    flip = np.diag([1.0, 1.0, 1.0, 1.0]).astype(np.float32)
    src_T_cur2 = np.stack([
        p @ flip for p in src_T_cur
    ])
    src_T_cur2[:, 0, 3] *= -1.0  # mirror the translations
    cur_T_src2 = np.linalg.inv(src_T_cur2).astype(np.float32)

    b_cur = jnp.asarray(np.stack([curf, curf2]))
    b_src = jnp.asarray(np.stack([srcf, srcf2]))
    b_sTc = jnp.asarray(np.stack([src_T_cur, src_T_cur2]))
    b_cTs = jnp.asarray(np.stack([cur_T_src, cur_T_src2]))
    b_K = jnp.asarray(np.stack([src_K, src_K]))
    b_invK = jnp.asarray(np.stack([cur_invK, cur_invK]))

    model = FeatureVolume(num_depth_bins=D, plane_chunk=4)
    args = (b_cur, b_src, b_sTc, b_cTs, b_K, b_invK)
    params = model.init(jax.random.PRNGKey(1), *args, 0.5, 4.0)
    vol_ref = np.asarray(model.apply(params, *args, 0.5, 4.0)[0])  # (b,h,w,D)

    weights = pad_mlp_weights(params["params"]["mlp"])
    vol, _ = fused_feature_volume(
        b_cur, b_src, b_sTc, b_cTs, b_K, b_invK,
        0.5, 4.0, weights, num_depth_bins=D, interpret=True,
    )
    vol = np.asarray(vol).transpose(0, 2, 3, 1)

    for bi in range(2):
        diff = np.abs(vol[bi] - vol_ref[bi])
        # bf16 matmul operands bound the accuracy (~1e-2 on O(1) scores)
        assert diff.mean() < 5e-3, f"b{bi} mean diff {diff.mean()}"
        assert np.percentile(diff, 99) < 5e-2, \
            f"b{bi} p99 {np.percentile(diff, 99)}"
