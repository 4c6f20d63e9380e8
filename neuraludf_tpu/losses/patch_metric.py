"""Windowed patch similarity metrics (SSIM / NCC).

The reference implements these as grouped valid conv2d over (2h+1)² patches
(ref: loss/patch_metric.py) — with padding=0 the convolution collapses to a
single Gaussian-weighted moment per patch, so here they are plain weighted
einsum reductions (fuses into one VPU pass on TPU, no conv needed).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def gaussian_window(window_size: int, sigma: float = 1.5) -> np.ndarray:
    """Flattened 2D Gaussian window, normalized per-axis like the reference
    (outer product of two normalized 1D windows)."""
    g = np.exp(-((np.arange(window_size) - window_size // 2) ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    w2 = np.outer(g, g)
    return w2.reshape(-1).astype(np.float32)


def _moments(x: jnp.ndarray, w: jnp.ndarray):
    """Gaussian-weighted patch mean over the Npx axis: x [..., Npx, C]."""
    return jnp.einsum("...pc,p->...c", x, w)


def ssim_error(pred: jnp.ndarray, gt: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """1 - SSIM per point, matching reference `_ssim` exactly
    (ref: loss/patch_metric.py:21-41).

    pred: [N, Npx, 3], gt: [N, Npx, 3], window: [Npx]. Returns [N].
    """
    mu1 = _moments(pred, window)  # [N, 3]
    mu2 = _moments(gt, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = _moments(pred * pred, window) - mu1_sq
    sigma2_sq = _moments(gt * gt, window) - mu2_sq
    sigma12 = _moments(pred * gt, window) - mu1_mu2
    C1, C2 = 0.01 ** 2, 0.03 ** 2
    values = 1.0 - ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return jnp.sum(values, axis=-1) / 2.0


def ncc_error(pred: jnp.ndarray, gt: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """1 - NCC per point (ref: loss/patch_metric.py:44-66). Returns [N]."""
    mu1 = _moments(pred, window)
    mu2 = _moments(gt, window)
    sigma1 = jnp.sqrt(_moments(pred * pred, window) - mu1 ** 2 + 1e-4)
    sigma2 = jnp.sqrt(_moments(gt * gt, window) - mu2 ** 2 + 1e-4)
    pred_n = (pred - mu1[..., None, :]) / (sigma1[..., None, :] + 1e-8)
    gt_n = (gt - mu2[..., None, :]) / (sigma2[..., None, :] + 1e-8)
    ncc = _moments(pred_n * gt_n, window)  # [N, 3]
    return 1.0 - jnp.mean(ncc, axis=-1)
