"""Bilinear image sampling (torch grid_sample semantics) as XLA gathers.

Implements align_corners=True + zeros padding, the combination used by the
reference warps (ref: models/projector_utils.py:78-80,
models/patch_projector.py:143). Gather-based: jit/vmap friendly, no
data-dependent shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_sample_2d(image: jnp.ndarray, grid: jnp.ndarray, align_corners: bool = True) -> jnp.ndarray:
    """Sample `image` [C, H, W] at `grid` [..., 2] of (x, y) in [-1, 1].

    Returns [..., C]. Zeros padding: out-of-bounds bilinear corners
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

    def corner(xc, yc, wx, wy):
        inb = (xc >= 0) & (xc <= W - 1) & (yc >= 0) & (yc <= H - 1)
        xi = jnp.clip(xc, 0, W - 1).astype(jnp.int32)
        yi = jnp.clip(yc, 0, H - 1).astype(jnp.int32)
        vals = image[:, yi, xi]  # [C, ...]
        vals = jnp.moveaxis(vals, 0, -1)  # [..., C]
        w = (wx * wy * inb.astype(image.dtype))[..., None]
        return vals * w

    out = (
        corner(x0, y0, wx0, wy0)
        + corner(x1, y0, wx1, wy0)
        + corner(x0, y1, wx0, wy1)
        + corner(x1, y1, wx1, wy1)
    )
    return out
