"""Download ScanNet v2 release files (after accepting the ScanNet ToS).

TPU-repo equivalent of the reference's
scripts/data_scripts/scannet_wrangling_scripts/download_scannet.py, reduced
to what this framework needs: per-scan ``.sens`` + metadata ``.txt`` +
``_vh_clean_2.ply`` GT meshes (mesh bounds / mesh eval), plus the label map
task files. You must have requested access and agreed to the ScanNet Terms
of Use (http://kaldir.vc.in.tum.de/scannet/ScanNet_TOS.pdf) before use.

Usage:
    python scripts/wrangling/download_scannet.py --out_dir /data/scannet \
        [--scan_id scene0707_00] [--test_only]
Then export frames with scripts/wrangling/scannet_sens_export.py.
"""

from __future__ import annotations

import argparse
import os
import sys
import urllib.request

BASE_URL = "http://kaldir.vc.in.tum.de/scannet/"
TOS_URL = BASE_URL + "ScanNet_TOS.pdf"
RELEASE = "v2/scans"
RELEASE_TEST = "v2/scans_test"

FILETYPES = [".sens", ".txt", "_vh_clean_2.ply", "_vh_clean_2.labels.ply"]
FILETYPES_TEST = [".sens", ".txt"]


def fetch_scan_list(split: str):
    url = BASE_URL + f"v2/scannetv2_{split}.txt"
    with urllib.request.urlopen(url) as f:
        return [line.decode("utf8").strip() for line in f if line.strip()]


def download_file(url: str, out_file: str):
    if os.path.isfile(out_file):
        print(f"exists, skipping: {out_file}")
        return
    os.makedirs(os.path.dirname(out_file), exist_ok=True)
    tmp = out_file + ".tmp"
    print(f"downloading {url} -> {out_file}")
    urllib.request.urlretrieve(url, tmp)
    os.replace(tmp, out_file)


def download_scan(scan_id: str, out_dir: str, test_scan: bool):
    release = RELEASE_TEST if test_scan else RELEASE
    types = FILETYPES_TEST if test_scan else FILETYPES
    scan_dir = os.path.join(out_dir, "scans_test" if test_scan else "scans", scan_id)
    for ft in types:
        url = f"{BASE_URL}{release}/{scan_id}/{scan_id}{ft}"
        download_file(url, os.path.join(scan_dir, f"{scan_id}{ft}"))


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--scan_id", default=None, help="single scan (else full split)")
    ap.add_argument("--split", default="test", choices=["train", "val", "test"])
    ap.add_argument("--label_map", action="store_true",
                    help="also fetch scannetv2-labels.combined.tsv")
    args = ap.parse_args()

    print("By continuing you confirm you have agreed to the ScanNet ToS:")
    print("  " + TOS_URL)
    if input("continue? [y/N] ").strip().lower() != "y":
        sys.exit(0)

    if args.label_map:
        download_file(
            BASE_URL + "v2/tasks/scannetv2-labels.combined.tsv",
            os.path.join(args.out_dir, "scannetv2-labels.combined.tsv"),
        )

    scans = [args.scan_id] if args.scan_id else fetch_scan_list(args.split)
    for scan in scans:
        download_scan(scan, args.out_dir, test_scan=(args.split == "test"))


if __name__ == "__main__":
    main()
