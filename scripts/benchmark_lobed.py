"""Full-protocol quality benchmark on the `lobed` synthetic scene.

This is the maximally-real stand-in for the DTU quality benchmark (no DTU
data ships in this container): a textured multi-lobe OPEN shell with exact
analytic ground truth, 49 DTU-like views at 1600x1200, trained with the
production stage-1 recipe and evaluated with the complete DTU offline
protocol (ref evaluation/eval_dtu_python.py:40-369 + clean_dtu_mesh.py):

    extract 512^3 MeshUDF -> mask-visibility clean -> visual-hull clean ->
    small-component removal -> lattice sampling + greedy downsample ->
    truncated Chamfer + precision/recall/F-score at 1mm/2mm.

The synthetic world is scaled x200 for the eval so DTU's millimetre
thresholds carry over (object diameter ~0.9 units -> ~180mm, a typical DTU
object size).

Usage: python scripts/benchmark_lobed.py --tag stage1_50k --iters 50000
Writes exp/benchmark_lobed/<tag>/ + one JSON line to
exp/benchmark_lobed/results.jsonl.
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MM_SCALE = 200.0  # unit world -> "mm" for the DTU-protocol numbers


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", required=True)
    ap.add_argument("--iters", type=int, default=50_000)
    ap.add_argument("--ft_iters", type=int, default=0,
                    help="finetune-stage iterations (patch-blending losses, "
                         "the reference's stage-2 recipe: pixel 0.1 + patch "
                         "0.1, h_patch_size 5; ref udf_dtu_blending_ft.conf)")
    ap.add_argument("--resolution", type=int, default=512)
    ap.add_argument("--batch_size", type=int, default=512)
    ap.add_argument("--fused", default="auto")
    ap.add_argument("--precision", default="default")
    # the reference's open-surface (garment/DF3D) recipe: sparse_weight
    # 0.001 (ref confs/udf_garment_blending.conf:49) suppresses phantom
    # zero-membranes across the opening — measured on the capsule scene:
    # a diaphragm at y=0.16 under the y=0.2 rim without it
    ap.add_argument("--sparse_weight", type=float, default=0.001)
    ap.add_argument("--blend_top_k", type=int, default=0,
                    help="override udf_renderer.blend_top_k for the ft stage "
                         "(0 = keep config; speed/quality A/B: fewer warped "
                         "samples per ray -> proportionally fewer strip DMAs)")
    ap.add_argument("--mc_backend", default="tets",
                    choices=("tets", "lewiner"),
                    help="cube triangulation backend for the extraction "
                         "(lewiner = the reference's default topology engine, "
                         "ref custom_mc/_marching_cubes_lewiner_cy.pyx)")
    ap.add_argument("--skip_train", action="store_true",
                    help="reuse the newest checkpoint under the tag dir")
    ap.add_argument("--init_ckpt", default=None,
                    help="with --skip_train: load this stage-1 checkpoint "
                         "instead of the newest one under the tag dir (lets a "
                         "fresh ft tag start from a previous run's stage-1)")
    args = ap.parse_args()

    os.environ["NEURALUDF_FUSED_CORE"] = args.fused
    os.environ["NEURALUDF_FUSED_PRECISION"] = args.precision

    import logging

    logging.basicConfig(level=logging.INFO, format="[%(asctime)s] %(message)s")

    from neuraludf_tpu.utils import setup_jax

    setup_jax()
    import numpy as np

    from neuraludf_tpu import config as config_mod
    from neuraludf_tpu.data.synthetic import (
        generate_scene,
        gt_surface_points,
        lobed_observability_mask,
    )
    from neuraludf_tpu.eval.chamfer import eval_mesh
    from neuraludf_tpu.eval.clean_mesh import (
        clean_mesh_faces_by_mask,
        clean_mesh_faces_by_visualhull,
        clean_outliers,
    )
    from neuraludf_tpu.mesh.ply import export_ply, load_ply
    from neuraludf_tpu.train.runner import Runner

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scene_dir = os.path.join(root, "data", "synthetic", "lobed")
    if not os.path.exists(os.path.join(scene_dir, "cameras.npz")):
        print("generating 49-view 1600x1200 lobed scene (one-time, ~5 min) ...")
        generate_scene(scene_dir, kind="lobed", n_views=49, H=1200, W=1600,
                       focal=2000.0)

    exp_dir = os.path.join(root, "exp", "benchmark_lobed", args.tag)
    cfg = config_mod.load(os.path.join(root, "confs", "synthetic_smoke.conf"),
                          case="lobed")
    cfg = dataclasses.replace(
        cfg,
        general=dataclasses.replace(cfg.general, base_exp_dir=exp_dir),
        train=dataclasses.replace(
            cfg.train, end_iter=args.iters, batch_size=args.batch_size,
            sparse_weight=args.sparse_weight,
            save_freq=25_000, val_freq=10**9, val_mesh_freq=10**9,
            report_freq=1000,
        ),
    )
    runner = Runner(cfg, seed=0,
                    reg_weights_schedule=args.sparse_weight > 0)

    train_s = 0.0
    if args.skip_train:
        stage1_ck = args.init_ckpt or runner._latest_checkpoint()
        assert stage1_ck, f"--skip_train but no checkpoint under {exp_dir}"
        runner.load_checkpoint(stage1_ck)
    else:
        t0 = time.time()
        runner.train()
        train_s = time.time() - t0
        runner.save_checkpoint()
        stage1_ck = runner._latest_checkpoint()

    if args.ft_iters:
        from neuraludf_tpu.config import ColorLossConfig

        ft_cfg = dataclasses.replace(
            cfg,
            train=dataclasses.replace(
                cfg.train, end_iter=args.ft_iters,
                # reference DTU ft schedule (udf_dtu_blending_ft.conf:24-33):
                # lr 1e-4 both groups, warm-up 5k, fix_geo 500, anneal 25k
                learning_rate=1e-4, learning_rate_geo=1e-4, fix_geo_end=500,
                warm_up_end=min(5000, args.ft_iters // 10),
                anneal_end=min(25_000, args.ft_iters // 2),
            ),
            color_loss=ColorLossConfig(
                color_base_weight=0.01, color_weight=1.0,
                color_pixel_weight=0.1, color_patch_weight=0.1,
                pixel_loss_type="l1", patch_loss_type="ssim", h_patch_size=5,
            ),
            model=dataclasses.replace(
                cfg.model,
                udf_renderer=dataclasses.replace(
                    cfg.model.udf_renderer, h_patch_size=5,
                    **({"blend_top_k": args.blend_top_k}
                       if args.blend_top_k else {})),
            ),
        )
        ft_runner = Runner(ft_cfg, seed=0, is_finetune=True,
                           reg_weights_schedule=args.sparse_weight > 0)
        ft_runner.load_checkpoint(stage1_ck)
        t0 = time.time()
        ft_runner.train()
        train_s += time.time() - t0
        ft_runner.save_checkpoint()
        runner = ft_runner

    # validation renders (production path: color + normal + depth)
    val_s = time.time()
    for idx in (0, 24):
        try:
            runner.validate(idx=idx, resolution_level=2)
        except Exception as e:  # keep the eval going; renders are evidence only
            print("validate failed:", e)
    val_s = time.time() - val_s

    t0 = time.time()
    raw_ply = runner.extract_udf_mesh(world_space=False,
                                      resolution=args.resolution,
                                      dist_threshold_ratio=5.0,
                                      algorithm=args.mc_backend)
    extract_s = time.time() - t0

    # ---- the DTU cleaning pipeline (ref clean_dtu_mesh.py) ----------------
    t0 = time.time()
    mesh_mask = clean_mesh_faces_by_mask(
        raw_ply, raw_ply.replace(".ply", "_cleanmask.ply"), scene_dir,
        minimal_vis=2, mask_dilated_size=11)
    mesh_hull = clean_mesh_faces_by_visualhull(
        mesh_mask, raw_ply.replace(".ply", "_cleanhull.ply"), scene_dir,
        mask_dilated_size=11, border=20)
    mesh_final = clean_outliers(
        mesh_hull, raw_ply.replace(".ply", "_final.ply"),
        faces_num=500, keep_largest=False)
    clean_s = time.time() - t0

    # ---- DTU-protocol scoring in mm --------------------------------------
    verts, faces = load_ply(mesh_final)
    mm_ply = raw_ply.replace(".ply", "_final_mm.ply")
    export_ply(mm_ply, verts * MM_SCALE, faces)
    gt_mm = gt_surface_points("lobed", n=400_000).astype(np.float64) * MM_SCALE

    # DTU's d->GT filtering goes through an observability mask (the real
    # protocol never scores what the scanner could not see); ours is built
    # from analytic GT occlusion against the 49-camera rig
    obs, bb, res = lobed_observability_mask(res=0.01)
    obs_mm = (obs, bb * MM_SCALE, res * MM_SCALE)

    r = eval_mesh(mm_ply, gt_mm, downsample_density=0.2, max_dist=20.0,
                  obs_mask=obs_mm,
                  vis_out_dir=os.path.join(exp_dir, "eval_vis"), scan=0)

    row = {
        "tag": args.tag,
        "iters": args.iters,
        "ft_iters": args.ft_iters,
        "blend_top_k": args.blend_top_k or None,
        "mc_backend": args.mc_backend,
        "batch_size": args.batch_size,
        "fused": args.fused,
        "precision": args.precision,
        "resolution": args.resolution,
        "chamfer_mm": round(r.chamfer, 4),
        "mean_d2gt_mm": round(r.mean_d2s, 4),
        "mean_gt2d_mm": round(r.mean_s2d, 4),
        "fscore_1mm": round(r.fscore_1, 4),
        "precision_1mm": round(r.precision_1, 4),
        "recall_1mm": round(r.recall_1, 4),
        "fscore_2mm": round(r.fscore_2, 4),
        "n_verts_final": int(len(verts)),
        "train_s": round(train_s, 1),
        "it_per_s": round(args.iters / train_s, 1) if train_s else None,
        "extract_s": round(extract_s, 1),
        "clean_s": round(clean_s, 1),
        "val_s": round(val_s, 1),
    }
    out = os.path.join(root, "exp", "benchmark_lobed")
    with open(os.path.join(out, "results.jsonl"), "a") as f:
        f.write(json.dumps(row) + "\n")
    print(json.dumps(row))


if __name__ == "__main__":
    main()
