"""Precompute valid_frames.txt per scan (reference
precompute_valid_frames.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from doubletake_tpu.datasets.registry import dataset_from_opts, get_scan_list
from doubletake_tpu.options import OptionsHandler


def main():
    opts = OptionsHandler().parse_and_merge_options()
    scans = get_scan_list(opts)
    ds = dataset_from_opts(opts, mv_tuple_file_suffix=None,
                           tuple_info_file_location=None)
    for scan in scans:
        valid = ds.get_valid_frame_ids(scan)
        path = os.path.join(ds.scan_path(scan), "valid_frames.txt")
        try:
            with open(path, "w") as f:
                f.write("\n".join(valid) + "\n")
            print(f"{scan}: {len(valid)} valid frames -> {path}")
        except OSError as e:
            print(f"{scan}: could not save valid_frames ({e})")


if __name__ == "__main__":
    main()
