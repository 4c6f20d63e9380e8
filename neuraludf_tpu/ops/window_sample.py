"""Windowed bilinear image sampling — the TPU-native replacement for the
patch-warp gather.

Why: the blending (finetune) losses bilinearly sample the 8 source views at
[V, B, K, Npx] warped positions (ref: models/patch_projector.py:45-150 does
this with torch grid_sample). XLA lowers that to per-element gathers, which
TPUs execute serially at ~18 ns/element — measured 6.7 s/step at the
production DTU shape (scripts/patch_warp_microbench.py), i.e. 350x the rest
of the train step. TPUs have no per-lane gather hardware, so the fix is
structural, not a lowering flag.

Structure exploited: all K·Npx sample positions of one (ray, view) pair
cluster around the ray's surface region, so they fit one small image
window. Per (ray, view) the kernel:

  1. DMAs a WIN x WIN pixel window (all 3 channels) from the source image
     in HBM into VMEM — ONE strided DMA, no gathers;
  2. evaluates all P = K·Npx bilinear samples against the window as two
     one-hot weighted contractions: U_c = window_c @ colW  (MXU), then
     out_c[p] = sum_r rowW[r, p] * U_c[r, p]  (VPU mul+reduce). The one-hot
     row/col weight matrices are built on-chip from iota comparisons —
     dense math replaces 4 random texel reads per sample;
  3. emits the analytic window-space derivatives dI/dx, dI/dy alongside
     (same contractions with the one-hot difference masks), so the custom
     VJP is a cheap elementwise multiply — no second kernel pass.

Points that escape their window are detected OUTSIDE the kernel (in_window
mask) and must be treated as invalid by the caller, exactly like the
reference treats out-of-image samples. In-window coords are clamped, so
escaped lanes still produce finite values.

Zeros-padding parity note: the reference's grid_sample uses zeros padding
at image borders, but its patch validity mask already excludes any patch
within h pixels of the border (patch_projector.py:137-141), so padding
never affects a valid sample; the kernel therefore doesn't replicate it.

Precision: images and the column one-hot enter the MXU in bf16 (the source
images are 8-bit quantized, 1/256 steps; bf16 error is ~1/512 of local
contrast). The row weights and all accumulations stay f32.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_WIN = 96  # window side (pixels); must cover the K-sample cluster
DEFAULT_WB = 8  # windows processed per grid step (DMA double-buffered)


# ----------------------------------------------------------------------
# kernel
# ----------------------------------------------------------------------


def _make_kernel(win: int, wb: int, n_px: int, with_grads: bool):
    def kernel(y0_ref, x0_ref, rx_ref, ry_ref, img_ref, *rest):
        if with_grads:
            col_ref, dx_ref, dy_ref, slab, sem = rest
        else:
            col_ref, slab, sem = rest
        v = pl.program_id(0)
        w = pl.program_id(1)

        def dma(slot, j):
            b = w * wb + j
            return pltpu.make_async_copy(
                img_ref.at[v, pl.ds(y0_ref[v, b], win), :, pl.ds(x0_ref[v, b], win)],
                slab.at[slot],
                sem.at[slot],
            )

        dma(0, 0).start()
        for j in range(wb):
            if j + 1 < wb:
                dma((j + 1) % 2, j + 1).start()
            dma(j % 2, j).wait()

            rx = rx_ref[0, j, :].reshape(1, n_px)  # [1, P] f32, window coords
            ry = ry_ref[0, j, :].reshape(1, n_px)
            ix0 = jnp.floor(rx)
            iy0 = jnp.floor(ry)
            fx = rx - ix0
            fy = ry - iy0
            ix0 = ix0.astype(jnp.int32)
            iy0 = iy0.astype(jnp.int32)

            # one-hot column/row weights over the window axes, [WIN, P]
            wiota = jax.lax.broadcasted_iota(jnp.int32, (win, n_px), 0)
            o0c = (wiota == ix0).astype(jnp.float32)
            o1c = (wiota == ix0 + 1).astype(jnp.float32)
            o0r = (wiota == iy0).astype(jnp.float32)
            o1r = (wiota == iy0 + 1).astype(jnp.float32)
            col_w = (o0c * (1.0 - fx) + o1c * fx).astype(jnp.bfloat16)
            row_w = o0r * (1.0 - fy) + o1r * fy
            if with_grads:
                col_d = (o1c - o0c).astype(jnp.bfloat16)
                row_d = o1r - o0r

            for c in range(3):
                sc = slab[j % 2, :, c, :]  # [WIN, WIN] bf16
                # U[r, p] = sum_cc sc[r, cc] * col_w[cc, p]
                u = jax.lax.dot(sc, col_w, preferred_element_type=jnp.float32)
                col_ref[0, j, c, :] = jnp.sum(row_w * u, axis=0)
                if with_grads:
                    ud = jax.lax.dot(sc, col_d, preferred_element_type=jnp.float32)
                    dx_ref[0, j, c, :] = jnp.sum(row_w * ud, axis=0)
                    dy_ref[0, j, c, :] = jnp.sum(row_d * u, axis=0)

    return kernel


@functools.lru_cache(maxsize=16)
def _build_call(v: int, nw: int, n_px: int, h: int, w_img: int,
                win: int, wb: int, with_grads: bool, interpret: bool):
    grid = (v, nw // wb)
    kernel = _make_kernel(win, wb, n_px, with_grads)
    blk = lambda *shape: pl.BlockSpec(
        shape,
        lambda vi, wi, y0, x0: (vi, wi) + (0,) * (len(shape) - 2),
        memory_space=pltpu.VMEM,
    )
    out_sds = jax.ShapeDtypeStruct((v, nw, 3, n_px), jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            blk(1, wb, n_px),  # rx
            blk(1, wb, n_px),  # ry
            pl.BlockSpec(memory_space=pltpu.ANY),  # images [V, H, 3, W]
        ],
        out_specs=(
            [blk(1, wb, 3, n_px)] * (3 if with_grads else 1)
        ),
        scratch_shapes=[
            pltpu.VMEM((2, win, 3, win), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    fn = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[out_sds] * (3 if with_grads else 1),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )
    return fn


# ----------------------------------------------------------------------
# wrapper: window origins, padding, custom VJP
# ----------------------------------------------------------------------


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def window_origins(gx, gy, h: int, w: int, win: int):
    """Per-window origin so the window covers the coord midrange.

    gx, gy: [V, NW, P] absolute pixel coords. Returns (y0, x0) int32
    [V, NW], clamped so the window stays inside the image."""
    cx = 0.5 * (jnp.min(gx, axis=-1) + jnp.max(gx, axis=-1))
    cy = 0.5 * (jnp.min(gy, axis=-1) + jnp.max(gy, axis=-1))
    x0 = jnp.clip(jnp.floor(cx - win * 0.5), 0, w - win).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(cy - win * 0.5), 0, h - win).astype(jnp.int32)
    return y0, x0


def _sample_impl(images_pl, y0, x0, rx, ry, *, win, wb, with_grads, interpret):
    v, h, _, w_img = images_pl.shape
    nw, n_px = rx.shape[1], rx.shape[2]
    fn = _build_call(v, nw, n_px, h, w_img, win, wb, with_grads, interpret)
    outs = fn(y0, x0, rx, ry, images_pl)
    return outs


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _sample_diff(images_pl, y0, x0, rx, ry, win, wb, interpret):
    colors, _, _ = _sample_impl(
        images_pl, y0, x0, rx, ry, win=win, wb=wb, with_grads=True,
        interpret=interpret,
    )
    return colors


def _sample_diff_fwd(images_pl, y0, x0, rx, ry, win, wb, interpret):
    colors, didx, didy = _sample_impl(
        images_pl, y0, x0, rx, ry, win=win, wb=wb, with_grads=True,
        interpret=interpret,
    )
    return colors, (didx, didy)


def _sample_diff_bwd(win, wb, interpret, res, g):
    didx, didy = res
    # g: [V, NW, 3, P] cotangent on colors
    drx = jnp.sum(g * didx, axis=2)
    dry = jnp.sum(g * didy, axis=2)
    return (None, None, None, drx, dry)


_sample_diff.defvjp(_sample_diff_fwd, _sample_diff_bwd)


def window_sample(
    images_pl: jnp.ndarray,
    gx: jnp.ndarray,
    gy: jnp.ndarray,
    *,
    win: int = DEFAULT_WIN,
    wb: int = DEFAULT_WB,
    differentiable: bool = True,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bilinearly sample per-view images at windowed point clusters.

    images_pl: [V, H, 3, W] (channel-planes layout; cast to bf16 here).
    gx, gy: [V, NW, P] absolute pixel coords — all P points of window
    (v, n) must fit inside a WIN x WIN box for exact results.

    Returns (colors [V, NW, 3, P] f32, in_window [V, NW, P] bool).
    Escaped points (outside their window) are clamped — callers must mask
    them out via in_window. Gradients flow to gx/gy only (images and the
    integer origins are constants in training).
    """
    v, h, _, w_img = images_pl.shape
    nw, p = gx.shape[1], gx.shape[2]
    if h < win or w_img < win:
        raise ValueError(f"image {h}x{w_img} smaller than window {win}")

    p_pad = _round_up(p, 128)
    nw_pad = _round_up(nw, wb)

    y0, x0 = window_origins(gx, gy, h, w_img, win)

    rx = gx - x0[..., None].astype(gx.dtype)
    ry = gy - y0[..., None].astype(gy.dtype)
    # strict in-window test, then clamp (floor(max) would index win-1+1)
    in_win = (rx >= 0.0) & (rx <= win - 1) & (ry >= 0.0) & (ry <= win - 1)
    rx = jnp.clip(rx, 0.0, win - 1.0001)
    ry = jnp.clip(ry, 0.0, win - 1.0001)

    if p_pad != p or nw_pad != nw:
        pads = [(0, 0), (0, nw_pad - nw), (0, p_pad - p)]
        rx = jnp.pad(rx, pads, constant_values=0.5)
        ry = jnp.pad(ry, pads, constant_values=0.5)
        y0 = jnp.pad(y0, [(0, 0), (0, nw_pad - nw)])
        x0 = jnp.pad(x0, [(0, 0), (0, nw_pad - nw)])

    imgs = images_pl.astype(jnp.bfloat16)
    if differentiable:
        colors = _sample_diff(imgs, y0, x0, rx, ry, win, wb, interpret)
    else:
        (colors,) = _sample_impl(
            imgs, y0, x0, rx, ry, win=win, wb=wb, with_grads=False,
            interpret=interpret,
        )
    colors = colors[:, :nw, :, :p]
    return colors, in_win


# ----------------------------------------------------------------------
# exact XLA reference (tests + CPU fallback)
# ----------------------------------------------------------------------


def window_sample_reference(images_pl, gx, gy):
    """Same contract as window_sample, via exact XLA gathers (f32).

    No window: every in-image point is valid; returns the in-image mask in
    place of in_window (callers combine with their own bounds mask)."""
    from .interp import grid_sample_2d_xy

    v, h, _, w_img = images_pl.shape
    imgs = images_pl.transpose(0, 2, 1, 3)  # [V, 3, H, W]
    nx = 2.0 * gx / (w_img - 1) - 1.0
    ny = 2.0 * gy / (h - 1) - 1.0
    colors = jax.vmap(
        lambda im, x, y: grid_sample_2d_xy(im, x, y, channels_last=False)
    )(imgs, nx, ny)  # [V, 3, NW, P]
    in_img = (gx >= 0) & (gx <= w_img - 1) & (gy >= 0) & (gy <= h - 1)
    return colors.transpose(0, 2, 1, 3), in_img
