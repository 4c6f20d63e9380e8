"""DeepFashion3D offline evaluation CLI
(ref: evaluation/eval_deepfashion_python.py): same skeleton as DTU without
ObsMask/plane filtering; normalized units (downsample 0.002, max_dist 0.1,
thresholds 0.001/0.002)."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from neuraludf_tpu.eval.chamfer import eval_mesh
from neuraludf_tpu.mesh.ply import load_ply


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data", type=str, required=True)
    p.add_argument("--gt", type=str, required=True, help="GT point cloud .ply")
    p.add_argument("--scan", type=int, default=0)
    p.add_argument("--vis_out_dir", type=str, default=None)
    p.add_argument("--downsample_density", type=float, default=0.002)
    p.add_argument("--max_dist", type=float, default=0.1)
    p.add_argument("--log", type=str, default=None)
    args = p.parse_args()

    gt_points, _ = load_ply(args.gt)
    r = eval_mesh(
        args.data, gt_points.astype(np.float64),
        downsample_density=args.downsample_density, max_dist=args.max_dist,
        thresh1=0.001, thresh2=0.002,
        vis_out_dir=args.vis_out_dir, scan=args.scan,
    )
    print(f"over_all: {r.chamfer}; mean_d2gt: {r.mean_d2s}; mean_gt2d: {r.mean_s2d}.")
    print(f"fscore_1mm: {r.fscore_1}  fscore_2mm: {r.fscore_2}")
    log = args.log or os.path.join(os.path.dirname(args.data), "eval_result.txt")
    with open(log, "w+") as f:
        f.write(f"over_all {np.round(r.chamfer, 5)} mean_d2gt {np.round(r.mean_d2s, 5)} "
                f"mean_gt2d {np.round(r.mean_s2d, 5)}\n")


if __name__ == "__main__":
    main()
