"""configs/ must load through OptionsHandler and produce buildable models.

The reference ships 4 model YAMLs + 17 data YAMLs (reference configs/);
published-score runs are driven by --config_file + --data_config_file.
"""

import glob
import os

from doubletake_tpu.options import Options, OptionsHandler
from doubletake_tpu.runners import common

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_configs_parse():
    paths = glob.glob(os.path.join(REPO, "configs", "**", "*.yaml"), recursive=True)
    assert len(paths) == 21, paths
    for p in paths:
        opts = OptionsHandler.load_options_from_yaml(p)
        assert isinstance(opts, Options)


def test_model_configs_build_models():
    for name, model_type, volume in [
        ("doubletake_model", "cv_hint_depth_model", "mlp_mesh_hint_feature_volume"),
        ("doubletake_small_model", "cv_hint_depth_model", "mlp_mesh_hint_feature_volume"),
        ("simplerecon_model", "depth_model", "mlp_feature_volume"),
        ("sr_model", "depth_model", "mlp_feature_volume"),
    ]:
        opts = OptionsHandler.load_options_from_yaml(
            os.path.join(REPO, "configs", "models", f"{name}.yaml")
        )
        assert opts.model_type == model_type
        assert opts.feature_volume_type == volume
        model = common.build_model(opts)
        assert model.feature_volume_type == volume


def test_layered_merge_model_then_data():
    handler = OptionsHandler(
        argv=[
            "--config_file", os.path.join(REPO, "configs/models/doubletake_model.yaml"),
            "--data_config_file", os.path.join(REPO, "configs/data/scannet/scannet_default_test.yaml"),
            "--batch_size", "4",
        ]
    )
    opts = handler.parse_and_merge_options()
    assert opts.model_type == "cv_hint_depth_model"  # from model yaml
    assert opts.dataset == "scannet" and opts.split == "test"  # from data yaml
    assert opts.batch_size == 4  # CLI wins
    assert opts.extra.get("cost_volume_aggregation") == "dot"
