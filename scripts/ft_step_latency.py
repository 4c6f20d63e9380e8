"""Measure the blending (ft) train step's device latency in isolation:
single blocked dispatches, then a pipelined burst — separates program cost
from dispatch overhead. Also times the stage-1 step for reference."""

import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse
    import logging

    logging.basicConfig(level=logging.INFO)

    ap = argparse.ArgumentParser(
        description="blending-step latency; flags sweep the strip-sampler "
                    "geometry (ops/strip_sample.py) for throughput A/Bs")
    ap.add_argument("--strip_height", type=int, default=None)
    ap.add_argument("--blend_chunk", type=int, default=None)
    ap.add_argument("--blend_top_k", type=int, default=None)
    ap.add_argument("--skip_stage1", action="store_true")
    args = ap.parse_args()

    from neuraludf_tpu.utils import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from neuraludf_tpu import config as config_mod
    from neuraludf_tpu.config import ColorLossConfig
    from neuraludf_tpu.data.dataset import Dataset
    from neuraludf_tpu.render.renderer import UDFRenderer
    from neuraludf_tpu.train.optim import init_adam_state
    from neuraludf_tpu.train.runner import init_params
    from neuraludf_tpu.train.schedules import compute_step_schedules
    from neuraludf_tpu.train.step import build_train_step

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = config_mod.load(os.path.join(root, "confs", "synthetic_smoke.conf"),
                          case="lobed")
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(cfg.train, batch_size=512),
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
    rc_over = {
        k: v for k, v in (
            ("strip_height", args.strip_height),
            ("blend_chunk", args.blend_chunk),
            ("blend_top_k", args.blend_top_k),
        ) if v is not None
    }
    if rc_over:
        print("strip-sampler overrides:", rc_over)
        cfg = dataclasses.replace(
            cfg,
            model=dataclasses.replace(
                cfg.model,
                udf_renderer=dataclasses.replace(
                    cfg.model.udf_renderer, **rc_over),
            ),
        )
    ds = Dataset(cfg.dataset)
    renderer = UDFRenderer(cfg.model)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = init_adam_state(params)
    s = compute_step_schedules(
        100, cfg.train, 0.01, 1.0, 0.1, 0.1,
        is_finetune=True, reg_weights_schedule=True, same_lr=False,
        beta_trainable=True, variance_trainable=True,
    )
    sched = dict(s.__dict__)

    results = {}
    stages = (("blending", True),) if args.skip_stage1 else (
        ("stage1", False), ("blending", True))
    for name, blending in stages:
        step = build_train_step(cfg, renderer, blending=blending)
        p = jax.tree_util.tree_map(jnp.copy, params)
        o = jax.tree_util.tree_map(jnp.copy, opt)
        key = jax.random.PRNGKey(1)
        t0 = time.time()
        p, o, m = step(p, o, ds.scene, ds.ref_src_pairs, jnp.asarray(0), key, sched)
        _ = np.asarray(m["loss"])
        compile_s = time.time() - t0
        # single blocked dispatches
        ts = []
        for i in range(5):
            key = jax.random.fold_in(key, i)
            t0 = time.time()
            p, o, m = step(p, o, ds.scene, ds.ref_src_pairs, jnp.asarray(0), key, sched)
            _ = np.asarray(m["loss"])
            ts.append(time.time() - t0)
        single_ms = 1000 * float(np.median(ts))
        # pipelined burst of 20, one sync
        t0 = time.time()
        for i in range(20):
            key = jax.random.fold_in(key, 100 + i)
            p, o, m = step(p, o, ds.scene, ds.ref_src_pairs, jnp.asarray(0), key, sched)
        _ = np.asarray(m["loss"])
        burst_ms = 1000 * (time.time() - t0) / 20
        results[name] = {
            "compile_s": round(compile_s, 1),
            "single_blocked_ms": round(single_ms, 1),
            "pipelined_ms": round(burst_ms, 1),
            # fraction of warp positions covered by their strip — must stay
            # ~1.0 when shrinking strip_height/growing blend_chunk
            "strip_cover": round(float(np.asarray(m["blend_strip_cover"])), 4)
            if blending else None,
        }
        print(name, results[name], flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
