"""CLI: offline two-pass evaluation (reference test_offline_two_pass.py)."""

from doubletake_tpu.options import OptionsHandler
from doubletake_tpu.runners import offline_two_pass

if __name__ == "__main__":
    opts = OptionsHandler().parse_and_merge_options()
    offline_two_pass.run(opts)
