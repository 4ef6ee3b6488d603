"""Build visibility volumes for mesh-eval occlusion masks (reference
scripts/create_visibility_volume.py).

For each scan: a SimpleVolume over the scene bounds, filled by marking
voxels in front of each frame's GT depth + 0.3 m.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from doubletake_tpu.data.loader import DataLoader
from doubletake_tpu.datasets.registry import dataset_from_opts
from doubletake_tpu.eval.visibility import SimpleVolume, integrate_visibility
from doubletake_tpu.options import OptionsHandler
from doubletake_tpu.runners.common import scene_bounds_for_fusion
from doubletake_tpu.runners.no_hint import unique_scans


def main():
    opts = OptionsHandler().parse_and_merge_options()
    probe = dataset_from_opts(opts, split=opts.split)
    scans = unique_scans(probe)
    if opts.single_debug_scan_id:
        scans = [s for s in scans if s == opts.single_debug_scan_id]

    out_dir = os.path.join(opts.output_base_path, opts.name, "visibility")
    os.makedirs(out_dir, exist_ok=True)

    for scan in scans:
        ds = dataset_from_opts(opts, split=opts.split, limit_to_scan_id=scan)
        bounds = scene_bounds_for_fusion(ds, scan)
        volume = SimpleVolume.from_bounds(bounds, voxel_size=0.04)
        step = jax.jit(integrate_visibility, donate_argnums=0)
        for cur_np, _ in DataLoader(ds, batch_size=1, num_workers=opts.num_workers):
            volume = step(
                volume,
                jnp.asarray(cur_np["depth_bhw1"][0]),
                jnp.asarray(cur_np["cam_T_world_b44"][0]),
                jnp.asarray(cur_np["K_s0_b44"][0]),
            )
        path = os.path.join(out_dir, f"{scan.replace('/', '_')}_visibility.npz")
        volume.save(path)
        frac = float(np.asarray(volume.values).mean())
        print(f"{scan}: visibility volume saved ({frac:.1%} visible) -> {path}")


if __name__ == "__main__":
    main()
