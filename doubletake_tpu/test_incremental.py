"""CLI: incremental (online) evaluation (reference test_incremental.py)."""

from doubletake_tpu.options import OptionsHandler
from doubletake_tpu.runners import incremental

if __name__ == "__main__":
    opts = OptionsHandler().parse_and_merge_options()
    incremental.run(opts)
