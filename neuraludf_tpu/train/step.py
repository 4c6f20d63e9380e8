"""The jitted training step: ray sampling → render → losses → Adam.

One fused XLA program per (config, blending-mode): the entire iteration —
pixel draws, gathers, 6 UDF evaluations, nested-AD eikonal, optimizer —
runs on device; the host only computes schedule scalars and logs
(ref: exp_runner_blending.py:253-447 train_udf).

Two entry points:
  * build_train_step  — one dispatch per iteration (tests, dry runs)
  * build_train_window — `window` iterations per dispatch via lax.scan:
    per-step schedule scalars arrive as stacked [K] arrays and metrics
    return as one [K, M] array, so host↔device round trips (expensive on
    remote-tunnel TPUs) amortize over the whole window.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Any, Dict, List

import jax
import jax.numpy as jnp

from ..config import Config
from ..data.dataset import near_far_from_sphere, ref_src_info, sample_random_rays
from ..losses.color import ColorLossWeights, bce_mask_loss, color_loss, psnr
from ..render.renderer import RenderOptions, UDFRenderer
from .optim import flat_adam_step, make_lr_fn, make_trainable_fn, tree_adam_step

Params = Dict[str, Any]

METRIC_KEYS: List[str] = [
    "loss", "color_total_loss", "color_base_loss", "color_loss",
    "color_pixel_loss", "color_patch_loss", "mask_loss", "gradient_error",
    "gradient_error_near_surface", "sparse_error", "psnr", "variance",
    "beta", "gamma", "udf_min", "udf_mean", "weight_sum", "weight_sum_fg_bg",
    "blend_strip_cover",
]


def build_step_body(cfg: Config, renderer: UDFRenderer, *, blending: bool):
    """Returns body(params, opt_state, scene, ref_src_pairs, img_idx, key,
    sched) -> (params, opt_state, metrics dict). Pure, un-jitted."""
    tcfg = cfg.train
    ccfg = cfg.color_loss
    bcfg = cfg.model.beta_network
    use_mask_loss = tcfg.mask_weight > 0
    h_patch = ccfg.h_patch_size
    opts = RenderOptions(
        perturb=cfg.model.udf_renderer.perturb > 0,
        pixel_blending=blending and ccfg.color_pixel_weight > 0,
        patch_blending=blending and ccfg.color_patch_weight > 0,
        compute_random_sparse=True,
    )
    if opts.patch_blending:
        # the patch size is configured in two places (like the reference
        # confs); they must agree or the warp/GT patch shapes diverge
        assert cfg.model.udf_renderer.h_patch_size == ccfg.h_patch_size, (
            "model.udf_renderer.h_patch_size must equal color_loss.h_patch_size "
            f"({cfg.model.udf_renderer.h_patch_size} != {ccfg.h_patch_size})"
        )

    def loss_fn(params, scene, ref_src_pairs, img_idx, key, sched):
        k_rays, k_render = jax.random.split(key)
        sample = sample_random_rays(
            scene, img_idx, k_rays, tcfg.batch_size,
            crop_patch=opts.patch_blending, h_patch_size=h_patch,
        )
        data = sample["rays"]
        rays_o, rays_d = data[:, :3], data[:, 3:6]
        true_rgb, mask = data[:, 6:9], data[:, 9:10]
        mask = (mask > 0.5).astype(jnp.float32)
        near, far = near_far_from_sphere(rays_o, rays_d)

        blending_inputs = None
        if opts.pixel_blending or opts.patch_blending:
            ref_c2w, src_c2ws, src_intr, src_images = ref_src_info(
                scene, ref_src_pairs, img_idx
            )
            blending_inputs = {
                "color_maps": src_images,
                "w2cs": jnp.linalg.inv(src_c2ws),
                "intrinsics": src_intr,
                "query_c2w": ref_c2w,
                "rays_uv": sample["rays_ndc_uv"] if opts.patch_blending else None,
                "img_index": None,
            }

        ret = renderer.render(
            params, rays_o, rays_d, near, far,
            key=k_render,
            cos_anneal_ratio=sched["cos_anneal_ratio"],
            flip_saturation=sched["flip_saturation"],
            background_rgb=jnp.ones((1, 3)) if tcfg.use_white_bkgd else None,
            blending=blending_inputs,
            opts=opts,
        )

        weight_sum = ret["weight_sum"]
        patch_mask = None
        if ret["patch_colors"] is not None:
            patch_mask = (
                ret["patch_mask"][:, None] * (weight_sum > 0.5).astype(jnp.float32)
            ) > 0.0
        pixel_mask = mask if use_mask_loss else None

        weights = ColorLossWeights(
            color_base=sched["color_base_weight"],
            color=sched["color_weight"],
            color_pixel=sched["color_pixel_weight"],
            color_patch=sched["color_patch_weight"],
        )
        closs = color_loss(
            weights,
            ret["color_base"], ret["color"], true_rgb,
            ret["color_pixel"], pixel_mask,
            ret["patch_colors"], sample["rays_patch_color"], patch_mask,
            patch_loss_type=ccfg.patch_loss_type, h_patch_size=h_patch,
        )

        mask_l = bce_mask_loss(weight_sum, mask)
        total = (
            closs["loss"]
            + mask_l * sched["mask_weight"]
            + ret["gradient_error_near_surface"] * sched["igr_ns_weight"]
            + ret["sparse_error"] * sched["sparse_weight"]
            + ret["gradient_error"] * sched["igr_weight"]
        )

        mask_sum = mask.sum() + 1e-5
        ray_mask = mask[:, 0] > 0.5
        udf_min_per_ray = ret["udf"].min(axis=1)
        udf_min = jnp.sum(udf_min_per_ray * ray_mask) / jnp.maximum(ray_mask.sum(), 1.0)

        metrics = {
            "loss": total,
            "color_total_loss": closs["loss"],
            "color_base_loss": closs["color_base_loss"],
            "color_loss": closs["color_loss"],
            "color_pixel_loss": closs["color_pixel_loss"],
            "color_patch_loss": closs["color_patch_loss"],
            "mask_loss": mask_l,
            "gradient_error": ret["gradient_error"],
            "gradient_error_near_surface": ret["gradient_error_near_surface"],
            "sparse_error": ret["sparse_error"],
            "psnr": psnr(ret["color"], true_rgb, mask),
            "variance": jnp.mean(ret["variance"]),
            "beta": jnp.mean(ret["beta"]),
            "gamma": jnp.mean(ret["gamma"]),
            "udf_min": udf_min,
            "udf_mean": jnp.mean(ret["udf"]),
            "weight_sum": jnp.sum(ret["weight_sum"] * mask) / mask_sum,
            "weight_sum_fg_bg": jnp.sum(ret["weight_sum_fg_bg"] * mask) / mask_sum,
            "blend_strip_cover": ret["blend_strip_cover"],
        }
        return total, metrics

    flat = os.environ.get("NEURALUDF_FLAT_ADAM")
    use_flat = tcfg.flat_adam if flat is None else flat == "1"
    adam_step = flat_adam_step if use_flat else tree_adam_step

    def body(params, opt_state, scene, ref_src_pairs, img_idx, key, sched):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, scene, ref_src_pairs, img_idx, key, sched
        )
        lr_fn = make_lr_fn(sched["lr_geo"], sched["lr_main"], sched["lr_main"])
        trainable_fn = make_trainable_fn(
            bcfg, sched["variance_trainable"], sched["beta_trainable"]
        )
        params, opt_state = adam_step(params, grads, opt_state, lr_fn, trainable_fn)
        return params, opt_state, metrics

    return body


def build_train_step(cfg: Config, renderer: UDFRenderer, *, blending: bool):
    """Single-iteration jitted step (one dispatch per iter)."""
    body = build_step_body(cfg, renderer, blending=blending)
    return partial(jax.jit, donate_argnums=(0, 1))(body)


def build_train_window(cfg: Config, renderer: UDFRenderer, *, blending: bool,
                       window: int, unroll: int = 1):
    """`window` iterations fused into one dispatch via lax.scan.

    sched entries arrive stacked as [window] arrays; img_idxs is [window];
    metrics come back as one [window, len(METRIC_KEYS)] array.

    `unroll` > 1 unrolls the scan body so XLA can overlap the per-iteration
    weight re-staging (Adam rewrites every weight each step, so each scan
    iteration re-prefetches all MLP weights to VMEM — the dominant
    non-compute slice of the round-4 windowed trace) with the previous
    iteration's tail compute. Must divide `window`.
    """
    body = build_step_body(cfg, renderer, blending=blending)
    if window % unroll != 0:
        raise ValueError(f"unroll {unroll} must divide window {window}")

    @partial(jax.jit, donate_argnums=(0, 1))
    def window_fn(params, opt_state, scene, ref_src_pairs, img_idxs, base_key, scheds):
        keys = jax.random.split(base_key, window)

        def scan_body(carry, xs):
            p, o = carry
            idx, k, srow = xs
            p, o, m = body(p, o, scene, ref_src_pairs, idx, k, srow)
            return (p, o), jnp.stack([m[name] for name in METRIC_KEYS])

        (params, opt_state), mrows = jax.lax.scan(
            scan_body, (params, opt_state), (img_idxs, keys, scheds),
            unroll=unroll,
        )
        return params, opt_state, mrows

    return window_fn
