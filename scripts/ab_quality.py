"""Precision/kernel quality A/B: train on a synthetic scene, extract the
mesh, report geometry error vs the analytic GT surface.

Usage: python scripts/ab_quality.py --tag fused_default --iters 20000 \
           [--kind sphere|capsule] [--fused 0|1] [--precision default|high|highest]

Writes one JSON line per run to exp/ab_quality/results.jsonl.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--iters", type=int, default=20000)
    ap.add_argument("--kind", default="sphere")
    ap.add_argument("--fused", default="auto")
    ap.add_argument("--precision", default="highest")
    ap.add_argument("--resolution", type=int, default=256)
    # Regulariser knobs (reference training flags: BCE mask loss,
    # exp_runner:346; sparse regulariser, renderer :553). Defaults follow the
    # reference confs — every one ships mask_weight=0.0, and the measured A/B
    # runs show WHY: the BCE term rewards extra density anywhere along
    # in-silhouette rays, actively dragging interior UDF toward zero
    # (masked 30k runs: Chamfer 0.17 with a low-UDF blob at r=0.31..0.43;
    # reference-default runs reconstruct the r=0.5 shell).
    ap.add_argument("--mask_weight", type=float, default=0.0)
    ap.add_argument("--sparse_weight", type=float, default=0.0)
    ap.add_argument("--anneal_end", type=int, default=0,
                    help="override train.anneal_end (reference DTU uses 8% "
                         "of the schedule; the smoke conf's 500 is 1-2%)")
    args = ap.parse_args()

    os.environ["NEURALUDF_FUSED_CORE"] = args.fused
    os.environ["NEURALUDF_FUSED_PRECISION"] = args.precision

    import logging

    logging.basicConfig(level=logging.INFO, format="[%(asctime)s] %(message)s")

    from neuraludf_tpu.utils import setup_jax

    setup_jax()
    import dataclasses

    import numpy as np

    from neuraludf_tpu import config as config_mod
    from neuraludf_tpu.data.synthetic import generate_scene, gt_surface_points
    from neuraludf_tpu.train.runner import Runner

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene_dir = os.path.join(root, "data", "synthetic", args.kind)
    if not os.path.exists(os.path.join(scene_dir, "cameras.npz")):
        generate_scene(scene_dir, kind=args.kind, n_views=16, H=600, W=800, focal=900.0)

    cfg = config_mod.load(os.path.join(root, "confs", "synthetic_smoke.conf"), case=args.kind)
    cfg = dataclasses.replace(
        cfg,
        general=dataclasses.replace(
            cfg.general, base_exp_dir=os.path.join(root, "exp", "ab_quality", args.tag)
        ),
        train=dataclasses.replace(
            cfg.train, end_iter=args.iters,
            mask_weight=args.mask_weight, sparse_weight=args.sparse_weight,
            **({"anneal_end": args.anneal_end} if args.anneal_end else {}),
            save_freq=10**9, val_freq=10**9, val_mesh_freq=10**9, report_freq=1000,
        ),
    )
    # the reference's open-surface recipe enables sparse regularisation via
    # --reg_weights_schedule (zero until end_iter//2, ref bash_garment_blending.sh:37
    # + exp_runner:199-211): applied from iter 0 it holds the surface off zero
    # (measured: udf_min stuck at 0.04, Chamfer 0.18)
    runner = Runner(cfg, seed=0, reg_weights_schedule=args.sparse_weight > 0)
    t0 = time.time()
    runner.train()
    train_s = time.time() - t0
    runner.save_checkpoint()
    try:
        runner.validate(idx=0, resolution_level=2)
    except Exception as e:
        print("validate failed:", e)

    ply = runner.extract_udf_mesh(world_space=False, resolution=args.resolution,
                                  dist_threshold_ratio=5.0)  # the production CLI threshold (cli.py:101)
    from neuraludf_tpu.eval.clean_mesh import clean_outliers
    from neuraludf_tpu.mesh.ply import load_ply

    gt = gt_surface_points(args.kind, n=100_000)
    from scipy.spatial import cKDTree

    def chamfer_of(path):
        verts, faces = load_ply(path)
        # sample mesh surface uniformly-ish: triangle midpoints weighted is
        # fine at this face count; vertices alone bias to dense regions
        tri = verts[faces].mean(axis=1)
        pred = np.concatenate([verts, tri])
        d_p = cKDTree(gt).query(pred, k=1)[0]
        d_g = cKDTree(pred).query(gt, k=1)[0]
        return 0.5 * (d_p.mean() + d_g.mean()), d_p, d_g, len(verts)

    chamfer, d_pred_to_gt, d_gt_to_pred, n_verts = chamfer_of(ply)
    # the production eval protocol cleans small disconnected components
    # (ref clean_dtu_mesh.py:158-191) before scoring; report both numbers
    cleaned = clean_outliers(ply, ply.replace(".ply", "_clean.ply"),
                             faces_num=500, keep_largest=False)
    chamfer_clean, _, _, n_verts_clean = chamfer_of(cleaned)

    # interior-collapse diagnostic: fraction of the r<0.4 core whose UDF sits
    # under the extraction threshold (should be ~0 for a healthy field)
    import jax.numpy as jnp
    from neuraludf_tpu.nets import fields as _fields
    rng = np.random.RandomState(1)
    core = rng.normal(size=(8192, 3)).astype(np.float32)
    core = core / np.linalg.norm(core, axis=-1, keepdims=True)
    core = core * (rng.uniform(0.0, 0.4, size=(8192, 1)).astype(np.float32) ** (1 / 3))
    core_udf = np.asarray(
        _fields.distance_value(runner.params["udf"], jnp.asarray(core),
                               cfg.model.udf_network, role="sampling")[:, 0])
    thr = 5.0 * 2.0 / args.resolution
    core_frac_below = float((core_udf < thr).mean())

    row = {
        "tag": args.tag,
        "kind": args.kind,
        "iters": args.iters,
        "fused": args.fused,
        "precision": args.precision,
        "mask_weight": args.mask_weight,
        "sparse_weight": args.sparse_weight,
        "chamfer": round(float(chamfer), 6),
        "chamfer_clean": round(float(chamfer_clean), 6),
        "d_pred_to_gt": round(float(d_pred_to_gt.mean()), 6),
        "d_gt_to_pred": round(float(d_gt_to_pred.mean()), 6),
        "n_verts": int(n_verts),
        "n_verts_clean": int(n_verts_clean),
        "core_frac_below_thr": round(core_frac_below, 4),
        "train_s": round(train_s, 1),
        "it_per_s": round(args.iters / train_s, 1),
    }
    out = os.path.join(root, "exp", "ab_quality")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "results.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))


if __name__ == "__main__":
    main()
