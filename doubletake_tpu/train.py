"""CLI: training (reference train.py interface)."""

from doubletake_tpu.options import OptionsHandler
from doubletake_tpu.training.train_loop import train

if __name__ == "__main__":
    opts = OptionsHandler().parse_and_merge_options()
    train(opts)
