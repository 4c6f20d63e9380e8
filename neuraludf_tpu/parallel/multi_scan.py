"""Multi-scan data parallelism: train S independent scans at once, one per
device (BASELINE.json: "8 DTU/DF3D cases sharded over v4-8").

Each scan keeps its own parameters and optimizer state; the per-scan train
step is vmapped over a stacked leading axis and that axis is sharded over
the device mesh — zero cross-device communication (scans are independent),
so scaling is embarrassingly parallel over ICI-connected chips.

Requirements: all scans share image resolution and view count (stacked
scene arrays [S, V, H, W, 3]).
"""

from __future__ import annotations

from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..data.dataset import Dataset
from ..render.renderer import UDFRenderer
from ..train.optim import init_adam_state
from ..train.runner import init_params


def stack_scenes(datasets: List[Dataset]) -> Dict[str, jnp.ndarray]:
    keys = datasets[0].scene.keys()
    return {k: jnp.stack([d.scene[k] for d in datasets]) for k in keys}


def stack_params(cfg: Config, n_scans: int, seed: int = 0):
    trees = [init_params(jax.random.PRNGKey(seed + i), cfg) for i in range(n_scans)]
    opts = [init_adam_state(t) for t in trees]
    stack = lambda *xs: jnp.stack(xs)
    return (
        jax.tree_util.tree_map(stack, *trees),
        jax.tree_util.tree_map(stack, *opts),
    )


def build_multi_scan_step(cfg: Config, renderer: UDFRenderer, mesh: Mesh, *, blending: bool = False):
    """Returns jitted step(params_S, opt_S, scene_S, pairs_S, img_idx_S,
    keys_S, sched) with every stacked leaf sharded over the mesh."""
    single = _unjitted_single_step(cfg, renderer, blending=blending)
    vstep = jax.vmap(single, in_axes=(0, 0, 0, 0, 0, 0, None))

    def shard_leaf(x):
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
        )

    @jax.jit
    def step(params, opt_state, scenes, pairs, img_idx, keys, sched):
        params = jax.tree_util.tree_map(shard_leaf, params)
        return vstep(params, opt_state, scenes, pairs, img_idx, keys, sched)

    return step


def _unjitted_single_step(cfg: Config, renderer: UDFRenderer, *, blending: bool):
    """The single-scan step body without jit (so it can be vmapped)."""
    from ..train.step import build_step_body

    return build_step_body(cfg, renderer, blending=blending)


def multi_scan_train(
    cfg: Config,
    data_dirs: List[str],
    n_iters: int,
    *,
    mesh: Mesh,
    seed: int = 0,
    report_freq: int = 100,
):
    """Convenience loop: train one scan per device for n_iters."""
    import dataclasses

    from ..train.schedules import compute_step_schedules

    datasets = [
        Dataset(dataclasses.replace(cfg.dataset, data_dir=d)) for d in data_dirs
    ]
    S = len(datasets)
    renderer = UDFRenderer(cfg.model)
    params, opt_state = stack_params(cfg, S, seed)
    scenes = stack_scenes(datasets)
    pairs = jnp.stack([d.ref_src_pairs for d in datasets])
    step = build_multi_scan_step(cfg, renderer, mesh, blending=False)

    n_img = datasets[0].n_images
    rng = np.random.RandomState(seed)
    key = jax.random.PRNGKey(seed)
    metrics = None
    for it in range(n_iters):
        s = compute_step_schedules(
            it, cfg.train,
            cfg.color_loss.color_base_weight, cfg.color_loss.color_weight,
            cfg.color_loss.color_pixel_weight, cfg.color_loss.color_patch_weight,
            is_finetune=False, reg_weights_schedule=False, same_lr=cfg.train.same_lr,
            beta_trainable=True, variance_trainable=True,
        )
        img_idx = jnp.asarray(rng.randint(0, n_img, size=(S,)))
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, S)
        with mesh:
            params, opt_state, metrics = step(
                params, opt_state, scenes, pairs, img_idx, keys, dict(s.__dict__)
            )
        if (it + 1) % report_freq == 0:
            losses = np.asarray(metrics["loss"])
            print(f"iter {it + 1}: per-scan loss {np.round(losses, 4)}")
    return params, opt_state, metrics
