"""Generate DVMVS test tuple files (reference scripts/data_scripts/
generate_test_tuples.py interface).

Usage:
    python scripts/generate_test_tuples.py --data_config_file configs/data/... \
        --frame_tuple_type default [--num_workers N]
Writes {split}{suffix} into tuple_info_file_location.
"""

import os
import sys
from concurrent.futures import ProcessPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from doubletake_tpu.datasets.registry import dataset_from_opts, get_scan_list
from doubletake_tpu.options import OptionsHandler
from doubletake_tpu.tools.tuple_generation import generate_test_tuples


def process_scan(opts, scan):
    ds = dataset_from_opts(opts, mv_tuple_file_suffix=None,
                           tuple_info_file_location=None)
    valid_lines = ds.get_valid_frame_ids(scan)
    frame_ids, dists, poses = [], [], []
    for line in valid_lines:
        parts = line.split(" ")
        frame_ids.append(parts[1])
        dists.append(int(parts[2]) if len(parts) > 2 else None)
        pose, _ = ds.load_pose(scan, parts[1])
        poses.append(pose)
    return generate_test_tuples(
        scan, poses, frame_ids, opts.frame_tuple_type,
        opts.num_images_in_tuple or opts.model_num_views,
        dists_to_last_valid=dists,
    )


def main():
    opts = OptionsHandler().parse_and_merge_options()
    scans = get_scan_list(opts)
    lines = []
    for scan in scans:
        lines.extend(process_scan(opts, scan))
        print(f"{scan}: {len(lines)} tuples so far")
    suffix = opts.mv_tuple_file_suffix
    if opts.frame_tuple_type != "default":
        suffix = suffix.replace(".txt", f"_{opts.frame_tuple_type}.txt")
    out_path = os.path.join(opts.tuple_info_file_location, f"{opts.split}{suffix}")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(lines)} tuples to {out_path}")


if __name__ == "__main__":
    main()
