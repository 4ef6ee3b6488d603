"""CLI: no-hint depth evaluation (reference test_no_hint.py interface)."""

from doubletake_tpu.options import OptionsHandler
from doubletake_tpu.runners import no_hint

if __name__ == "__main__":
    opts = OptionsHandler().parse_and_merge_options()
    no_hint.run(opts)
