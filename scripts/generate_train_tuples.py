"""Generate DVMVS train tuple files (reference generate_train_tuples.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from doubletake_tpu.datasets.registry import dataset_from_opts, get_scan_list
from doubletake_tpu.options import OptionsHandler
from doubletake_tpu.tools.tuple_generation import generate_train_tuples


def main():
    opts = OptionsHandler().parse_and_merge_options()
    scans = get_scan_list(opts)
    lines = []
    for scan in scans:
        ds = dataset_from_opts(opts, mv_tuple_file_suffix=None,
                               tuple_info_file_location=None)
        valid_lines = ds.get_valid_frame_ids(scan)
        frame_ids = [line.split(" ")[1] for line in valid_lines]
        poses = [ds.load_pose(scan, fid)[0] for fid in frame_ids]
        lines.extend(
            generate_train_tuples(
                scan, poses, frame_ids,
                opts.num_images_in_tuple or opts.model_num_views,
            )
        )
        print(f"{scan}: {len(lines)} tuples so far")
    out_path = os.path.join(
        opts.tuple_info_file_location, f"{opts.split}{opts.mv_tuple_file_suffix}"
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {len(lines)} tuples to {out_path}")


if __name__ == "__main__":
    main()
