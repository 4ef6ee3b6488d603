"""Canonical evaluation driver (reference scripts/evaluation.py).

Wraps the published-score incremental command: fusion at the score
resolution with extended negative truncation, DVMVS default tuples.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from doubletake_tpu.options import OptionsHandler
from doubletake_tpu.runners import incremental


def main():
    handler = OptionsHandler()
    opts = handler.parse_and_merge_options()
    # canonical score settings (reference README.md:305-340)
    opts.run_fusion = True
    opts.extended_neg_truncation = True
    opts.fusion_resolution = 0.02
    opts.fusion_max_depth = 3.5
    incremental.run(opts)


if __name__ == "__main__":
    main()
