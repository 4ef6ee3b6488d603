"""Strip optimizer state from a checkpoint (reference strip_checkpoint.py)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from doubletake_tpu.checkpoints.io import strip_checkpoint

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--src", required=True)
    parser.add_argument("--dst", required=True)
    args = parser.parse_args()
    strip_checkpoint(args.src, args.dst)
    print(f"stripped {args.src} -> {args.dst}")
