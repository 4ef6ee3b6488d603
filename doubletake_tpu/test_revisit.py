"""CLI: revisit evaluation (reference test_revisit.py)."""

from doubletake_tpu.options import OptionsHandler
from doubletake_tpu.runners import revisit

if __name__ == "__main__":
    opts = OptionsHandler().parse_and_merge_options()
    revisit.run(opts)
