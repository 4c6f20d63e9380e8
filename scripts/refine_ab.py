"""Post-process A/B: true secant vertex refinement on an already-extracted
benchmark mesh, rescored with the same protocol (CPU only; no retraining).

The shipped step-6 refinement mirrors the reference's differentiable
re-plug (extract_mesh.py:276-287), whose POSITIONAL move is eps*(f(v-eps n)
- f(v+eps n)) ~ 2*eps*t0 — with eps=0.005 that corrects ~1% of a vertex's
true offset t0; it exists for gradient flow, not placement. For an
eikonal-normalized UDF, f(v + t n) ~ |t - t0| + c along the vertex normal,
so the secant step

    t0 = (f(v - eps n) - f(v + eps n)) / 2,  |t0| <= eps

recovers the full offset in one step; a second iteration mops up slope
error. This script measures what that is worth on a real benchmark mesh
before the framework adopts it as an extraction option.

Usage:
  python scripts/refine_ab.py --ply <mesh.ply> --ckpt <ckpt> \
      --conf confs/udf_garment_blending.conf --case garment --kind garment
"""
import argparse
import os
import pickle
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ply", required=True)
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--conf", default="confs/udf_garment_blending.conf")
    ap.add_argument("--case", default="garment")
    ap.add_argument("--kind", default="garment")
    ap.add_argument("--eps", type=float, default=0.005)
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--protocol", default="df3d", choices=["df3d", "dtu"])
    args = ap.parse_args()

    import jax
    # the axon sitecustomize force-sets jax_platforms="axon,cpu" and ignores
    # the env var — override after import (see .claude/skills/verify/SKILL.md)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from neuraludf_tpu import config as config_mod
    from neuraludf_tpu.data.synthetic import gt_surface_points
    from neuraludf_tpu.eval.chamfer import eval_mesh
    from neuraludf_tpu.mesh import process
    from neuraludf_tpu.mesh.ply import export_ply, load_ply
    from neuraludf_tpu.nets import fields

    cfg = config_mod.load(args.conf, case=args.case)
    with open(args.ckpt, "rb") as f:
        params = pickle.load(f)["params"]["udf"]
    ucfg = cfg.model.udf_network

    verts, faces = load_ply(args.ply)
    verts = verts.astype(np.float32)

    @jax.jit
    def query(pts):
        return fields.distance_value(params, pts, ucfg)[:, 0]

    def batched(pts, bs=200_000):
        return np.concatenate(
            [np.asarray(query(jnp.asarray(pts[i:i + bs])))
             for i in range(0, len(pts), bs)])

    def score(v, tag):
        gt = gt_surface_points(args.kind, n=400_000).astype(np.float64)
        tmp = args.ply.replace(".ply", f"_{tag}.ply")
        export_ply(tmp, v, faces)
        r = eval_mesh(tmp, gt, downsample_density=0.002, max_dist=0.1,
                      thresh1=0.001, thresh2=0.002, vis_out_dir=None, scan=0)
        print(f"{tag}: chamfer {r.chamfer*1e3:.4f}e-3  "
              f"d2gt {r.mean_d2s*1e3:.4f} gt2d {r.mean_s2d*1e3:.4f}  "
              f"f1 {r.fscore_1:.4f} f2 {r.fscore_2:.4f}")
        return r

    t0 = time.time()
    score(verts, "baseline")
    v = verts.copy()
    for it in range(args.iters):
        n = process.vertex_normals(v, faces)
        s1 = batched(v + args.eps * n)
        s2 = batched(v - args.eps * n)
        step = np.clip((s2 - s1) / 2.0, -args.eps, args.eps)
        v = v + step[:, None] * n
        print(f"iter {it}: |step| mean {np.abs(step).mean()*1e3:.4f}e-3 "
              f"p90 {np.percentile(np.abs(step), 90)*1e3:.4f}e-3")
    score(v, f"secant{args.iters}")
    print(f"total {time.time()-t0:.1f}s")


if __name__ == "__main__":
    main()
