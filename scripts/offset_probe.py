"""Diagnostic: how much of a benchmark mesh's residual Chamfer is a
GLOBAL normal-direction displacement (the anatomy's ~1-2e-3 inward lift,
scripts/garment_error_anatomy.py) vs unfixable local noise?

Sweeps a constant outward offset delta along per-vertex normals and
rescores with the DF3D protocol (ref evaluation/eval_deepfashion_python.py:52-55).
The minimum over delta is the score a perfectly-calibrated global
de-biasing would reach; the gap between that and the baseline is the
"global lift" share of the residual. Pure mesh post-processing on CPU —
no retraining, no field queries; a probe, not a shipped recipe step
(the reference has no such step, so neither does the pipeline).

Usage:
  python scripts/offset_probe.py --ply <mesh.ply> [--kind garment]
      [--deltas 0,0.0005,0.001,0.0015,0.002,0.003]
"""
import argparse
import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ply", required=True)
    ap.add_argument("--kind", default="garment")
    ap.add_argument("--deltas", type=str,
                    default="0,0.0005,0.001,0.0015,0.002,0.003")
    args = ap.parse_args()

    from neuraludf_tpu.data.synthetic import gt_surface_points
    from neuraludf_tpu.eval.chamfer import eval_mesh
    from neuraludf_tpu.mesh import process
    from neuraludf_tpu.mesh.ply import export_ply, load_ply

    verts, faces = load_ply(args.ply)
    verts = verts.astype(np.float32)
    normals = process.vertex_normals(verts, faces)
    gt = gt_surface_points(args.kind, n=400_000).astype(np.float64)

    best = (None, np.inf)
    for delta in [float(d) for d in args.deltas.split(",")]:
        tmp = args.ply.replace(".ply", f"_off{delta:g}.ply")
        export_ply(tmp, verts + delta * normals, faces)
        r = eval_mesh(tmp, gt, downsample_density=0.002, max_dist=0.1,
                      thresh1=0.001, thresh2=0.002, vis_out_dir=None, scan=0)
        os.remove(tmp)
        print(f"delta {delta*1e3:+.2f}e-3: chamfer {r.chamfer*1e3:.4f}e-3  "
              f"d2gt {r.mean_d2s*1e3:.4f} gt2d {r.mean_s2d*1e3:.4f}  "
              f"f1 {r.fscore_1:.4f} f2 {r.fscore_2:.4f}", flush=True)
        if r.chamfer < best[1]:
            best = (delta, r.chamfer)
    print(f"best: delta {best[0]*1e3:+.2f}e-3 -> {best[1]*1e3:.4f}e-3")


if __name__ == "__main__":
    main()
