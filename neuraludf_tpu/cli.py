"""Command-line entry point, mirroring the reference runner modes
(ref: exp_runner_blending.py:868-916).

    python -m neuraludf_tpu.cli --conf confs/udf_dtu_blending.conf \
        --case scan118 --mode train

Modes: train, validate_mesh, extract_udf_mesh (alias validate_udf_mesh),
validate_image, validate_fields, vis_one_ray, save_hdf5.
"""

from __future__ import annotations

import argparse
import logging


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    p.add_argument("--conf", type=str, default="./confs/base.conf")
    p.add_argument("--mode", type=str, default="train")
    p.add_argument("--model_type", type=str, default="")
    p.add_argument("--threshold", type=float, default=0.005)
    p.add_argument("--is_continue", default=False, action="store_true")
    p.add_argument("--is_finetune", default=False, action="store_true")
    p.add_argument("--reg_weights_schedule", default=False, action="store_true")
    p.add_argument("--vis_ray", default=False, action="store_true")
    p.add_argument("--gpu", type=int, default=0, help="accepted for parity; unused on TPU")
    p.add_argument("--resolution", type=int, default=128)
    p.add_argument("--final_mesh_resolution", type=int, default=512,
                   help="post-training extract_udf_mesh resolution (ref: exp_runner:902)")
    p.add_argument("--mc_algorithm", type=str, default="tets",
                   choices=["tets", "lewiner"],
                   help="MeshUDF cube-triangulation backend: marching "
                        "tetrahedra or the reference's Lewiner tables")
    p.add_argument("--case", type=str, default="")
    p.add_argument("--learning_rate", type=float, default=0)
    p.add_argument("--learning_rate_geo", type=float, default=0)
    p.add_argument("--sparse_weight", type=float, default=0)
    p.add_argument("--end_iter", type=int, default=0, help="override train.end_iter")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--profile_dir", type=str, default="",
                   help="capture a jax.profiler trace of the first training windows")
    p.add_argument("--multihost", default=False, action="store_true",
                   help="call jax.distributed.initialize() for multi-host pods")
    return p


def main(argv=None):
    logging.basicConfig(
        level=logging.INFO,
        format="[%(filename)s:%(lineno)s - %(funcName)s()] %(message)s",
    )
    args = build_parser().parse_args(argv)

    from .utils import setup_jax

    setup_jax()

    if args.multihost:
        from .parallel import multihost

        multihost.initialize()

    from . import config as config_mod
    from .train.runner import Runner

    overrides = {}
    if args.learning_rate > 0:
        overrides["train__learning_rate"] = args.learning_rate
    if args.learning_rate_geo > 0:
        overrides["train__learning_rate_geo"] = args.learning_rate_geo
    if args.sparse_weight > 0:
        overrides["train__sparse_weight"] = args.sparse_weight
    if args.end_iter > 0:
        overrides["train__end_iter"] = args.end_iter
    if args.model_type:
        overrides["general__model_type"] = args.model_type

    cfg = config_mod.load(args.conf, case=args.case, **overrides)

    runner = Runner(
        cfg,
        mode=args.mode,
        is_continue=args.is_continue,
        is_finetune=args.is_finetune,
        reg_weights_schedule=args.reg_weights_schedule,
        vis_ray=args.vis_ray,
        seed=args.seed,
    )

    if args.mode == "train":
        if args.profile_dir:
            from .utils.jax_setup import trace

            with trace(args.profile_dir):
                runner.train()
        else:
            runner.train()
        runner.extract_udf_mesh(
            resolution=args.final_mesh_resolution, world_space=True,
            dist_threshold_ratio=5.0, algorithm=args.mc_algorithm,
        )
    elif args.mode == "validate_mesh":
        runner.validate_mesh(world_space=False, resolution=args.resolution, threshold=args.threshold)
    elif args.mode in ("extract_udf_mesh", "validate_udf_mesh"):
        runner.extract_udf_mesh(resolution=args.resolution, world_space=True,
                                dist_threshold_ratio=5.0, algorithm=args.mc_algorithm)
    elif args.mode.startswith("validate_image"):
        for idx in [0, 10, 20, 30, 40, 50, 60, 70]:
            if idx < runner.dataset.n_images:
                runner.validate(idx, resolution_level=1, only_color=True)
    elif args.mode == "validate_fields":
        runner.validate_fields(resolution=args.resolution)
    elif args.mode == "save_hdf5":
        runner.save_hdf5(resolution=args.resolution)
    elif args.mode == "vis_one_ray":
        runner.visualize_one_ray(
            img_idx=min(48, runner.dataset.n_images - 1),
            px=runner.dataset.W // 2, py=runner.dataset.H // 2,
        )
    else:
        raise SystemExit(f"unknown mode {args.mode}")


if __name__ == "__main__":
    main()
