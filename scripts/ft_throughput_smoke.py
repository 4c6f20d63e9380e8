"""Measure finetune-stage (pixel+patch blending) training throughput on the
real TPU, from a stage-1 checkpoint.

Two dispatch modes (VERDICT r2 weak #1: blending fell back to per-iteration
host-synced dispatch, ~2x slower than stage-1):
  --mode pipelined  (default): single-step dispatches, async-pipelined, one
                    stacked metric transfer per window
  --mode scan       : lax.scan windows (the path that hard-crashed the axon
                    TPU worker in round 2 — bounded test for the fault)

Usage: timeout 1200 python scripts/ft_throughput_smoke.py --iters 300
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--mode", choices=["pipelined", "scan"], default="pipelined")
    ap.add_argument("--ckpt", default="exp/benchmark_lobed/stage1_50k/"
                    "udf_synthetic/checkpoints/ckpt_050000.ckpt")
    ap.add_argument("--tag", default="ft_throughput")
    args = ap.parse_args()

    import logging

    logging.basicConfig(level=logging.INFO, format="[%(asctime)s] %(message)s")

    from neuraludf_tpu.utils import setup_jax

    setup_jax()

    from neuraludf_tpu import config as config_mod
    from neuraludf_tpu.config import ColorLossConfig
    from neuraludf_tpu.train.runner import Runner

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    exp_dir = os.path.join(root, "exp", args.tag)
    cfg = config_mod.load(os.path.join(root, "confs", "synthetic_smoke.conf"),
                          case="lobed")
    cfg = dataclasses.replace(
        cfg,
        general=dataclasses.replace(cfg.general, base_exp_dir=exp_dir),
        train=dataclasses.replace(
            cfg.train, end_iter=args.iters, batch_size=512,
            learning_rate=1e-4, learning_rate_geo=1e-4, fix_geo_end=500,
            warm_up_end=args.iters // 10, anneal_end=args.iters // 2,
            sparse_weight=0.001,
            save_freq=10**9, val_freq=10**9, val_mesh_freq=10**9,
            report_freq=50,
            blend_scan_window=(args.mode == "scan"),
        ),
        color_loss=ColorLossConfig(
            color_base_weight=0.01, color_weight=1.0,
            color_pixel_weight=0.1, color_patch_weight=0.1,
            pixel_loss_type="l1", patch_loss_type="ssim", h_patch_size=5,
        ),
        model=dataclasses.replace(
            cfg.model,
            udf_renderer=dataclasses.replace(cfg.model.udf_renderer,
                                             h_patch_size=5),
        ),
    )
    runner = Runner(cfg, seed=0, is_finetune=True, reg_weights_schedule=True)
    runner.load_checkpoint(os.path.join(root, args.ckpt))

    times = []

    def hook(it, m):
        times.append((it, time.time()))

    t0 = time.time()
    runner.train(report_hook=hook)
    total = time.time() - t0
    # steady-state rate: between the first and last report hook (skips the
    # compile + warm-up window)
    if len(times) >= 2:
        (it0, w0), (it1, w1) = times[0], times[-1]
        steady = (it1 - it0) / max(w1 - w0, 1e-9)
    else:
        steady = args.iters / total
    out = {
        "mode": args.mode, "iters": args.iters, "total_s": round(total, 1),
        "steady_it_per_s": round(steady, 2),
        "steady_ms_per_it": round(1000.0 / max(steady, 1e-9), 2),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
