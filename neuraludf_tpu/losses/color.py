"""Color losses: pixel L1, per-view blended pixel loss, patch SSIM/NCC loss
with ranked outlier dropping (ref: loss/loss.py:21-133).

All weights arrive as traced scalars so the per-step ramp schedules
(ref: exp_runner_blending.py:230-251) never retrigger compilation.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp

from .patch_metric import gaussian_window, ncc_error, ssim_error


@dataclass
class ColorLossWeights:
    color_base: jnp.ndarray
    color: jnp.ndarray
    color_pixel: jnp.ndarray
    color_patch: jnp.ndarray


def pixel_l1(pred: jnp.ndarray, gt: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """L1 summed over all entries, normalized by mask count — note the
    reference does NOT mask the numerator (ref: loss/loss.py:37-44)."""
    err = jnp.abs(pred - gt)
    if mask is not None:
        return jnp.sum(err) / (jnp.sum(mask) + 1e-4)
    return jnp.mean(err)


def patch_loss(
    pred: jnp.ndarray,
    gt: jnp.ndarray,
    mask: jnp.ndarray,
    *,
    loss_type: str = "ssim",
    h_patch_size: int = 3,
    penalize_ratio: float = 0.3,
) -> jnp.ndarray:
    """Patch similarity loss, dropping the worst `penalize_ratio` fraction of
    valid patches (robust trimming, ref: loss/loss.py:59-84).

    pred/gt: [N, Npx, 3]; mask: [N] (or [N,1]) boolean validity.
    """
    mask = mask.reshape(-1).astype(jnp.float32)
    if loss_type == "l1":
        error = jnp.sum(jnp.mean(jnp.abs(pred - gt), axis=-1), axis=-1)
    elif loss_type == "ssd":
        error = jnp.sum(jnp.mean((pred - gt) ** 2, axis=-1), axis=-1)
    else:
        window = jnp.asarray(gaussian_window(2 * h_patch_size + 1))
        error = ssim_error(pred, gt, window) if loss_type == "ssim" else ncc_error(pred, gt, window)

    error = error * mask
    order = jnp.argsort(-error)  # descending
    error_sorted = jnp.take(error, order)
    mask_sorted = jnp.take(mask, order)
    # drop the top `penalize_ratio * n_valid` largest errors
    k = jnp.floor(penalize_ratio * jnp.sum(mask)).astype(jnp.int32)
    rank = jnp.arange(error.shape[0])
    keep = mask_sorted * (rank >= k)
    return jnp.sum(error_sorted * keep) / jnp.maximum(jnp.sum(keep), 1.0)


def color_loss(
    weights: ColorLossWeights,
    color_base: Optional[jnp.ndarray],
    color: Optional[jnp.ndarray],
    gt_color: jnp.ndarray,
    color_pixel: Optional[jnp.ndarray],
    pixel_mask: Optional[jnp.ndarray],
    patch_colors: Optional[jnp.ndarray],
    gt_patch_colors: Optional[jnp.ndarray],
    patch_mask: Optional[jnp.ndarray],
    *,
    patch_loss_type: str = "ssim",
    h_patch_size: int = 3,
):
    """Weighted color loss combo (ref: loss/loss.py:105-133)."""
    zero = jnp.zeros((), gt_color.dtype)
    base_l = pixel_l1(color_base, gt_color, pixel_mask) if color_base is not None else zero
    color_l = pixel_l1(color, gt_color, pixel_mask) if color is not None else zero
    pixel_l = pixel_l1(color_pixel, gt_color, patch_mask) if color_pixel is not None else zero
    patch_l = (
        patch_loss(
            patch_colors, gt_patch_colors, patch_mask,
            loss_type=patch_loss_type, h_patch_size=h_patch_size,
        )
        if patch_colors is not None
        else zero
    )
    denom = weights.color_base + weights.color + weights.color_pixel
    total = (
        base_l * weights.color_base + color_l * weights.color + pixel_l * weights.color_pixel
    ) / denom + patch_l * weights.color_patch
    return {
        "loss": total,
        "color_base_loss": base_l,
        "color_loss": color_l,
        "color_pixel_loss": pixel_l,
        "color_patch_loss": patch_l,
    }


def psnr(color: jnp.ndarray, true_rgb: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """(ref: exp_runner_blending.py:341-342)"""
    mask_sum = jnp.sum(mask) + 1e-5
    mse = jnp.sum((color - true_rgb) ** 2 * mask) / (mask_sum * 3.0)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


def bce_mask_loss(weight_sum: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Binary cross entropy on clipped accumulated weights
    (ref: exp_runner_blending.py:346)."""
    p = jnp.clip(weight_sum, 1e-3, 1.0 - 1e-3)
    return -jnp.mean(mask * jnp.log(p) + (1.0 - mask) * jnp.log(1.0 - p))
