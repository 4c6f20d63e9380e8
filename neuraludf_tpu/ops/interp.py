"""Bilinear image sampling (torch grid_sample semantics) as XLA gathers.

Implements align_corners=True + zeros padding, the combination used by the
reference warps (ref: models/projector_utils.py:78-80,
models/patch_projector.py:143). Gather-based: jit/vmap friendly, no
data-dependent shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_2d(
    image: jnp.ndarray, grid: jnp.ndarray, align_corners: bool = True,
    channels_last: bool = True,
) -> jnp.ndarray:
    """Sample `image` [C, H, W] at `grid` [..., 2] of (x, y) in [-1, 1].

    Returns [..., C] (or [C, ...] with channels_last=False — the
    TPU-friendly layout for big patch tensors: a huge array with C=3 as
    its minor dimension tiles to (…, 128) lanes, a 42x HBM padding blowup
    that OOMs the chip at production patch shapes; keeping the patch axis
    minor pads by ~6%). Zeros padding: out-of-bounds bilinear corners
    contribute zero.
    """
    C, H, W = image.shape
    if align_corners:
        x = (grid[..., 0] + 1.0) * 0.5 * (W - 1)
        y = (grid[..., 1] + 1.0) * 0.5 * (H - 1)
    else:
        x = ((grid[..., 0] + 1.0) * W - 1.0) * 0.5
        y = ((grid[..., 1] + 1.0) * H - 1.0) * 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    image_flat = image.reshape(C, H * W)

    def corner(xc, yc, wx, wy):
        inb = (xc >= 0) & (xc <= W - 1) & (yc >= 0) & (yc <= H - 1)
        xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        # per-channel 1-D gathers with LINEARIZED indices: `image[:, yi, xi]`
        # lowers to one gather whose output ([N, C]) and index tensor
        # ([N, 2]) both have a tiny minor dimension — at production patch
        # shapes TPU tiling pads each to 128 lanes (measured: a single
        # 28.9 GB fusion output). Flat indices keep every big tensor's
        # minor dimension the patch axis.
        lin = yi * W + xi  # [...]
        vals = [jnp.take(image_flat[c], lin, axis=0) for c in range(C)]
        w = wx * wy * inb.astype(image.dtype)
        if channels_last:
            return jnp.stack([v * w for v in vals], axis=-1)  # [..., C]
        return jnp.stack([v * w for v in vals], axis=0)  # [C, ...]

    out = (
        corner(x0, y0, wx0, wy0)
        + corner(x1, y0, wx1, wy0)
        + corner(x0, y1, wx0, wy1)
        + corner(x1, y1, wx1, wy1)
    )
    return out


def grid_sample_2d_xy(
    image: jnp.ndarray, gx: jnp.ndarray, gy: jnp.ndarray,
    align_corners: bool = True, channels_last: bool = True,
) -> jnp.ndarray:
    """grid_sample_2d with the (x, y) coordinates as SEPARATE arrays.

    Identical semantics to stacking them into a [..., 2] grid — which is
    exactly what the patch path must avoid: a production-shape tensor with
    a minor dimension of 2 tiles to 128 TPU lanes (64x HBM padding).
    """
    C, H, W = image.shape
    if align_corners:
        x = (gx + 1.0) * 0.5 * (W - 1)
        y = (gy + 1.0) * 0.5 * (H - 1)
    else:
        x = ((gx + 1.0) * W - 1.0) * 0.5
        y = ((gy + 1.0) * H - 1.0) * 0.5

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    image_flat = image.reshape(C, H * W)

    def corner(xc, yc, wx, wy):
        inb = (xc >= 0) & (xc <= W - 1) & (yc >= 0) & (yc <= H - 1)
        xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        lin = yi * W + xi  # flat per-channel gathers — see grid_sample_2d
        vals = [jnp.take(image_flat[c], lin, axis=0) for c in range(C)]
        w = wx * wy * inb.astype(image.dtype)
        if channels_last:
            return jnp.stack([v * w for v in vals], axis=-1)
        return jnp.stack([v * w for v in vals], axis=0)

    return (
        corner(x0, y0, wx0, wy0)
        + corner(x1, y0, wx1, wy0)
        + corner(x0, y1, wx0, wy1)
        + corner(x1, y1, wx1, wy1)
    )
