"""Multi-chip scaling: data-parallel ray sharding over a 1-D device mesh.

The reference is strictly single-GPU (SURVEY.md §2.11) — this subsystem is
new, TPU-native design:

  * a 1-D ``jax.sharding.Mesh`` over the 'data' axis,
  * the per-step ray batch is shard-constrained across chips
    (``with_sharding_constraint``); parameters stay replicated,
  * XLA's SPMD partitioner inserts the gradient all-reduce over ICI —
    no hand-written collectives needed for DP,
  * mesh-extraction grid queries shard over the leading point axis the
    same way (embarrassingly parallel).

Rays are i.i.d. so DP sharding is exact: the loss and gradients equal the
single-chip computation on the same batch.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..data.dataset import near_far_from_sphere, sample_random_rays
from ..losses.color import ColorLossWeights, bce_mask_loss, color_loss, psnr
from ..render.renderer import RenderOptions, UDFRenderer
from ..train.optim import make_lr_fn, make_trainable_fn, tree_adam_step


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def _build_dp_loss_fn(cfg: Config, renderer: UDFRenderer, mesh: Mesh, *, blending: bool):
    """The DP loss: identical math to the single-chip step, plus sharding
    constraints on the per-step ray batch. Shared by the single-step and
    windowed builders below."""
    tcfg = cfg.train
    ccfg = cfg.color_loss
    assert tcfg.batch_size % mesh.devices.size == 0, (
        f"batch {tcfg.batch_size} not divisible by mesh size {mesh.devices.size}"
    )

    opts = RenderOptions(
        perturb=cfg.model.udf_renderer.perturb > 0,
        pixel_blending=blending and ccfg.color_pixel_weight > 0,
        patch_blending=blending and ccfg.color_patch_weight > 0,
        compute_random_sparse=True,
    )

    def shard_rays(tree):
        return jax.tree_util.tree_map(
            lambda x: jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
            )
            if x is not None
            else None,
            tree,
        )

    def loss_fn(params, scene, ref_src_pairs, img_idx, key, sched):
        from ..data.dataset import ref_src_info

        k_rays, k_render = jax.random.split(key)
        sample = sample_random_rays(
            scene, img_idx, k_rays, tcfg.batch_size,
            crop_patch=opts.patch_blending, h_patch_size=ccfg.h_patch_size,
        )
        sample = shard_rays(sample)
        data = sample["rays"]
        rays_o, rays_d = data[:, :3], data[:, 3:6]
        true_rgb, mask = data[:, 6:9], data[:, 9:10]
        mask = (mask > 0.5).astype(jnp.float32)
        near, far = near_far_from_sphere(rays_o, rays_d)

        blending_inputs = None
        if opts.pixel_blending or opts.patch_blending:
            ref_c2w, src_c2ws, src_intr, src_images = ref_src_info(scene, ref_src_pairs, img_idx)
            blending_inputs = {
                "color_maps": src_images,
                "w2cs": jnp.linalg.inv(src_c2ws),
                "intrinsics": src_intr,
                "query_c2w": ref_c2w,
                "rays_uv": sample["rays_ndc_uv"] if opts.patch_blending else None,
                "img_index": None,
            }

        ret = renderer.render(
            params, rays_o, rays_d, near, far, key=k_render,
            cos_anneal_ratio=sched["cos_anneal_ratio"],
            flip_saturation=sched["flip_saturation"],
            background_rgb=jnp.ones((1, 3)) if tcfg.use_white_bkgd else None,
            blending=blending_inputs, opts=opts,
        )

        weight_sum = ret["weight_sum"]
        patch_mask = None
        if ret["patch_colors"] is not None:
            patch_mask = (
                ret["patch_mask"][:, None] * (weight_sum > 0.5).astype(jnp.float32)
            ) > 0.0
        pixel_mask = mask if tcfg.mask_weight > 0 else None

        weights = ColorLossWeights(
            color_base=sched["color_base_weight"], color=sched["color_weight"],
            color_pixel=sched["color_pixel_weight"], color_patch=sched["color_patch_weight"],
        )
        closs = color_loss(
            weights, ret["color_base"], ret["color"], true_rgb,
            ret["color_pixel"], pixel_mask,
            ret["patch_colors"], sample["rays_patch_color"], patch_mask,
            patch_loss_type=ccfg.patch_loss_type, h_patch_size=ccfg.h_patch_size,
        )
        total = (
            closs["loss"]
            + bce_mask_loss(weight_sum, mask) * sched["mask_weight"]
            + ret["gradient_error_near_surface"] * sched["igr_ns_weight"]
            + ret["sparse_error"] * sched["sparse_weight"]
            + ret["gradient_error"] * sched["igr_weight"]
        )
        metrics = {
            "loss": total,
            "psnr": psnr(ret["color"], true_rgb, mask),
            "variance": jnp.mean(ret["variance"]),
            "beta": jnp.mean(ret["beta"]),
            "gradient_error": ret["gradient_error"],
        }
        return total, metrics

    return loss_fn


def _dp_body(cfg: Config, loss_fn):
    """grad + Adam update for one DP iteration (shared single/windowed)."""
    bcfg = cfg.model.beta_network

    def body(params, opt_state, scene, ref_src_pairs, img_idx, key, sched):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, scene, ref_src_pairs, img_idx, key, sched
        )
        lr_fn = make_lr_fn(sched["lr_geo"], sched["lr_main"], sched["lr_main"])
        trainable_fn = make_trainable_fn(
            bcfg, sched["variance_trainable"], sched["beta_trainable"]
        )
        params, opt_state = tree_adam_step(params, grads, opt_state, lr_fn, trainable_fn)
        return params, opt_state, metrics

    return body


def build_parallel_train_step(cfg: Config, renderer: UDFRenderer, mesh: Mesh, *, blending: bool = False):
    """Data-parallel train step: rays sharded over the mesh, params
    replicated, gradients all-reduced over ICI by the partitioner.

    Identical math to train.step.build_train_step; the only additions are
    sharding constraints. Batch size must be divisible by the mesh size.
    """
    loss_fn = _build_dp_loss_fn(cfg, renderer, mesh, blending=blending)
    body = _dp_body(cfg, loss_fn)
    replicated = NamedSharding(mesh, P())

    step = partial(
        jax.jit,
        donate_argnums=(0, 1),
        out_shardings=(replicated, replicated, replicated),
    )(body)
    return step


def build_parallel_train_window(
    cfg: Config, renderer: UDFRenderer, mesh: Mesh, *,
    blending: bool = False, window: int, unroll: int = 1,
):
    """`window` DP iterations fused into one dispatch via lax.scan — the
    multi-chip analogue of train.step.build_train_window: each scan
    iteration samples its ray batch, shard-constrains it over the 'data'
    axis, and the partitioner all-reduces gradients over ICI. `unroll`
    unrolls the scan body exactly as the single-chip window does.

    sched entries arrive stacked as [window] arrays; img_idxs is [window];
    metrics come back as a dict of [window] arrays.
    """
    if window % max(1, unroll) != 0:
        raise ValueError(f"unroll {unroll} must divide window {window}")
    loss_fn = _build_dp_loss_fn(cfg, renderer, mesh, blending=blending)
    body = _dp_body(cfg, loss_fn)
    replicated = NamedSharding(mesh, P())

    @partial(
        jax.jit,
        donate_argnums=(0, 1),
        out_shardings=(replicated, replicated, replicated),
    )
    def window_fn(params, opt_state, scene, ref_src_pairs, img_idxs, base_key, scheds):
        keys = jax.random.split(base_key, window)

        def scan_body(carry, xs):
            p, o = carry
            idx, k, srow = xs
            p, o, m = body(p, o, scene, ref_src_pairs, idx, k, srow)
            return (p, o), m

        (params, opt_state), metrics = jax.lax.scan(
            scan_body, (params, opt_state), (img_idxs, keys, scheds),
            unroll=max(1, unroll),
        )
        return params, opt_state, metrics

    return window_fn


def shard_grid_query(mesh: Mesh, fn):
    """Wrap a jitted pointwise grid query so its leading axis is sharded
    over the mesh (for multi-chip mesh extraction)."""

    def wrapped(params, pts):
        pts = jax.lax.with_sharding_constraint(pts, NamedSharding(mesh, P("data", None)))
        return fn(params, pts)

    return jax.jit(wrapped)
