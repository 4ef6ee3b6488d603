"""Mesh metrics CLI (reference scripts/evals/mesh_eval.py).

Scores predicted meshes (from a results dir) against GT meshes with the
TransformerFusion protocol + visibility masking; per-scene and summary
JSON.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from doubletake_tpu.eval.mesh_eval import evaluate_mesh
from doubletake_tpu.eval.visibility import SimpleVolume
from doubletake_tpu.tools.marching_cubes import load_ply
from doubletake_tpu.utils.metrics import ResultsAverager


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--pred_dir", required=True,
                        help="directory with <scan>.ply predicted meshes")
    parser.add_argument("--gt_dir", required=True,
                        help="directory with <scan>.ply ground-truth meshes")
    parser.add_argument("--visibility_dir", default=None,
                        help="directory with <scan>_visibility.npz volumes")
    parser.add_argument("--output_json", default="mesh_metrics.json")
    parser.add_argument("--scans", nargs="*", default=None)
    args = parser.parse_args()

    scans = args.scans or sorted(
        f[:-4] for f in os.listdir(args.pred_dir) if f.endswith(".ply")
    )
    averager = ResultsAverager("mesh_eval", "scene avg")
    per_scene = {}
    for scan in scans:
        pred_v, pred_f = load_ply(os.path.join(args.pred_dir, f"{scan}.ply"))
        gt_v, gt_f = load_ply(os.path.join(args.gt_dir, f"{scan}.ply"))
        vis = None
        if args.visibility_dir:
            vis_path = os.path.join(args.visibility_dir, f"{scan}_visibility.npz")
            if os.path.exists(vis_path):
                vis = SimpleVolume.load(vis_path)
        metrics = evaluate_mesh(pred_v, pred_f, gt_v, gt_f, visibility_volume=vis)
        per_scene[scan] = metrics
        averager.update_results(metrics)
        print(scan, {k: round(v, 4) for k, v in metrics.items()})

    averager.compute_final_average()
    payload = {"per_scene": per_scene, "summary": averager.final_metrics}
    with open(args.output_json, "w") as f:
        json.dump(payload, f, indent=2)
    print("summary:", averager.final_metrics)


if __name__ == "__main__":
    main()
