"""Strip-resampling kernel: bilinear image sampling for the blending warps,
restructured for the TPU's memory system.

Why a dedicated sampler (beyond the torch-semantics gather path in
ops/interp.py): the blending (finetune)
losses bilinearly sample the 8 source views at ~56M warped positions per
step (ref: models/patch_projector.py:45-150 via torch grid_sample). On TPU
this is catastrophic in every gather formulation measured on-chip:

  - XLA per-element gathers: 6.7 s/step (~10 ns/element, 678M elements);
  - XLA block gathers (slice_sizes=(32,32)): ~2 us per BLOCK, 1.07 s for
    467k blocks — per-block overhead bound, not bandwidth bound;
  - per-(sample) Pallas DMA windows: Mosaic requires HBM slices to be
    tile-aligned (lane dim: multiples of 128 at 128-aligned offsets,
    sublane dim: multiples of the 16-row bf16 tile), so the smallest legal
    window DMA moves ~50 KB — 2% useful at one patch per window.

Structure exploited instead: the warp positions of C consecutive
near-surface samples of one (ray, src-view) pair cluster tightly, so ONE
aligned strip covers all C patches:

  1. images are prepared once per step as [V, 4, H, W] bf16 (channel-major,
     padded to 4 channels) so a strip DMA [4, SH, 256] is a single legal
     tile-aligned copy (y0 % 16 == 0, x0 % 128 == 0);
  2. per (ray, chunk, view) the kernel DMAs its strip into VMEM
     (double-buffered) and evaluates all P = C*128 bilinear samples as a
     hat-weighted contraction: hatC[x, p] = relu(1 - |x - rx_p|) is EXACTLY
     the bilinear column weight (tensor-product hat functions), so
     T = S[SH, 256] @ hatC[256, P] on the MXU followed by a hatR-weighted
     row reduction on the VPU reproduces bilinear interpolation with no
     gathers at all;
  3. the positions are constants w.r.t. parameters (the reference samples
     z under no_grad and detaches normals; ref udf_renderer_blending.py:
     637-643, patch_projector.py:45), so the kernel is FORWARD-ONLY —
     gradients flow through blending logits and compositing weights, never
     through the sampler.

Points whose cluster escapes its strip are detected outside the kernel and
must be masked invalid by the caller (like out-of-image samples). In-strip
coords are clamped so escaped lanes still produce finite values.

Precision: images and column hats enter the MXU in bf16 (source images are
8-bit quantized; bf16 weight error ~4e-3 of local contrast). Row hats and
accumulations stay f32.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SW = 256  # strip width (px); centered origins cover clusters ≤126 px wide
DEFAULT_SH = 64  # strip height; centered origins cover clusters ≤46 px tall
# wb=16 + fused_dot=True are the round-4 on-chip winners at the production
# ft shape (36.8 vs 38.8 ms for wb=8 three-dot): deeper DMA pipelining and
# one channel-flattened [3*SH, SW] MXU dot that also skips the pad
# channel's DMA. Both paths stay oracle-tested (tests/test_strip_sample.py).
DEFAULT_WB = 16  # strips per grid step (DMA double-buffered)
DEFAULT_FUSED_DOT = True
# The packed-origin scalar-prefetch operand must stay within half the
# chip's 1 MB SMEM (the other half is compiler scratch / spill slots);
# strip_sample splits NW into segments beyond this. Module-level so tests
# can shrink it to exercise the segmented path on small inputs.
_SMEM_ORIGIN_BUDGET = 512 * 1024  # bytes


def _make_kernel(sh: int, wb: int, p: int, fused_dot: bool):
    def kernel(yx0_ref, rx_ref, ry_ref, img_ref, out_ref, slab, sem):
        v = pl.program_id(0)
        w = pl.program_id(1)

        nc = 3 if fused_dot else 4  # fused variant skips the pad channel's DMA

        def dma(slot, j):
            b = w * wb + j
            # origins are packed (y0 << 16) | x0 into ONE scalar-prefetch
            # operand: two s32[V, NW] operands at validation scale
            # (NW = 16384) were 512 KB EACH and together blew the 1 MB
            # SMEM budget (round-3 "compile helper crash", root-caused
            # round 4: "Ran out of memory in memory space smem")
            packed = yx0_ref[v, b]
            y0 = pl.multiple_of(packed >> 16, 16)
            x0 = pl.multiple_of(packed & 0xFFFF, 128)
            return pltpu.make_async_copy(
                img_ref.at[v, pl.ds(0, nc), pl.ds(y0, sh), pl.ds(x0, SW)],
                slab.at[slot],
                sem.at[slot],
            )

        # loop-invariant pixel-index planes, built once per grid step
        xi = jax.lax.broadcasted_iota(jnp.int32, (SW, p), 0).astype(jnp.float32)
        yi = jax.lax.broadcasted_iota(jnp.int32, (sh, p), 0).astype(jnp.float32)

        dma(0, 0).start()
        for j in range(wb):
            if j + 1 < wb:
                dma((j + 1) % 2, j + 1).start()
            dma(j % 2, j).wait()

            # hat(x) = relu(1 - |x|) IS the bilinear weight; the tensor
            # product of row/column hats reproduces bilinear interpolation
            # (an f32 build + bf16 cast measures FASTER than a pure-bf16
            # build — Mosaic does not pack bf16 VPU ops)
            rx = rx_ref[0, j, :].reshape(1, p)  # [1, P] in-strip coords
            ry = ry_ref[0, j, :].reshape(1, p)
            hat_c = jax.nn.relu(1.0 - jnp.abs(xi - rx)).astype(jnp.bfloat16)
            hat_r = jax.nn.relu(1.0 - jnp.abs(yi - ry))  # f32

            if fused_dot:
                # one full-tile matmul over the channel-flattened strip
                # (M = 3*sh rows) instead of three M=sh dots: the MXU tiles
                # M in 128s, so sh=64 per-channel dots run half-empty
                s = slab[j % 2].reshape(3 * sh, SW)
                t = jax.lax.dot(s, hat_c, preferred_element_type=jnp.float32)
                for c in range(3):
                    out_ref[0, j, c * p:(c + 1) * p] = jnp.sum(
                        hat_r * t[c * sh:(c + 1) * sh], axis=0
                    )
            else:
                for c in range(3):
                    s = slab[j % 2, c]  # [SH, SW] bf16
                    t = jax.lax.dot(s, hat_c, preferred_element_type=jnp.float32)
                    out_ref[0, j, c * p:(c + 1) * p] = jnp.sum(hat_r * t, axis=0)

    return kernel


@functools.lru_cache(maxsize=16)
def _build_call(v: int, nw: int, p: int, h: int, w_img: int,
                sh: int, wb: int, fused_dot: bool, interpret: bool):
    grid = (v, nw // wb)
    kernel = _make_kernel(sh, wb, p, fused_dot)
    blk = lambda *shape: pl.BlockSpec(
        shape,
        lambda vi, wi, yx0: (vi, wi) + (0,) * (len(shape) - 2),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            blk(1, wb, p),  # rx
            blk(1, wb, p),  # ry
            pl.BlockSpec(memory_space=pl.ANY),  # images [V, 4, H, W]
        ],
        out_specs=blk(1, wb, 3 * p),
        scratch_shapes=[
            pltpu.VMEM((2, 3 if fused_dot else 4, sh, SW), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((v, nw, 3 * p), jnp.float32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )


def prepare_images(images: jnp.ndarray) -> jnp.ndarray:
    """[V, 3, H, W] float -> [V, 4, Hp, Wp] bf16: channel-major, channels
    padded to Mosaic's 4-wide tile, H/W zero-padded to the (16, 128) DMA
    tile so border strips may legally extend past the true image (zeros
    there carry zero hat weight for any clamped in-image point)."""
    v, c, h, w = images.shape
    assert c == 3, images.shape
    hp, wp = _round_up(h, 16), _round_up(w, 128)
    return jnp.pad(
        images.astype(jnp.bfloat16),
        ((0, 0), (0, 1), (0, hp - h), (0, wp - w)),
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def strip_origins(gx, gy, h: int, w: int, sh: int):
    """Aligned strip origins from the coord midranges.

    gx, gy: [V, NW, P] absolute pixel coords (already clamped to the
    image). Returns (y0, x0) int32 [V, NW]: y0 % 16 == 0, x0 % 128 == 0,
    strips fully inside the image."""
    cx = 0.5 * (jnp.min(gx, axis=-1) + jnp.max(gx, axis=-1))
    cy = 0.5 * (jnp.min(gy, axis=-1) + jnp.max(gy, axis=-1))
    # Round the origin to the NEAREST alignment so the cluster midrange is
    # centred: cx-x0 in [64, 192), cy-y0 in [sh/2-8, sh/2+8). Plain floor
    # put cx-x0 in [128, 256), so a cluster near the documented width
    # escaped off the strip's right edge ~half the time.
    x0 = jnp.floor((cx - SW * 0.5) / 128.0 + 0.5).astype(jnp.int32) * 128
    y0 = jnp.floor((cy - sh * 0.5) / 16.0 + 0.5).astype(jnp.int32) * 16
    x0 = jnp.clip(x0, 0, ((w - SW) // 128) * 128)
    y0 = jnp.clip(y0, 0, ((h - sh) // 16) * 16)
    return y0, x0


def strip_sample(
    images4: jnp.ndarray,
    gx: jnp.ndarray,
    gy: jnp.ndarray,
    *,
    sh: int = DEFAULT_SH,
    wb: int = DEFAULT_WB,
    fused_dot: bool = DEFAULT_FUSED_DOT,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bilinearly sample per-view images at strip-clustered positions.

    images4: [V, 4, H, W] bf16 (from prepare_images).
    gx, gy: [V, NW, P] absolute pixel coords; all P points of strip (v, n)
    must fit one SH x 256 aligned strip for exact results.

    Returns (colors [V, NW, 3, P] f32, in_strip [V, NW, P] bool — escaped
    OR out-of-image points; callers must mask them invalid). Forward-only:
    positions are constants w.r.t. params (see module docstring), enforced
    with stop_gradient.
    """
    v, c4, h, w_img = images4.shape
    assert c4 == 4 and h % 16 == 0 and w_img % 128 == 0, \
        f"{images4.shape}: pass images through prepare_images"
    nw, p = gx.shape[1], gx.shape[2]
    if h < sh or w_img < SW:
        raise ValueError(f"image {h}x{w_img} smaller than a strip ({sh}x{SW})")

    gx = jax.lax.stop_gradient(gx)
    gy = jax.lax.stop_gradient(gy)
    in_img = (gx >= 0) & (gx <= w_img - 1) & (gy >= 0) & (gy <= h - 1)
    gxc = jnp.clip(gx, 0.0, w_img - 1.0)
    gyc = jnp.clip(gy, 0.0, h - 1.0)
    y0, x0 = strip_origins(gxc, gyc, h, w_img, sh)

    rx = gxc - x0[..., None].astype(gxc.dtype)
    ry = gyc - y0[..., None].astype(gyc.dtype)
    in_strip = in_img & (rx >= 0) & (rx <= SW - 1) & (ry >= 0) & (ry <= sh - 1)
    rx = jnp.clip(rx, 0.0, SW - 1.0)
    ry = jnp.clip(ry, 0.0, sh - 1.0)

    p_pad = _round_up(p, 128)
    nw_pad = _round_up(nw, wb)
    if p_pad != p or nw_pad != nw:
        pads = [(0, 0), (0, nw_pad - nw), (0, p_pad - p)]
        rx = jnp.pad(rx, pads, constant_values=0.5)
        ry = jnp.pad(ry, pads, constant_values=0.5)
        y0 = jnp.pad(y0, [(0, 0), (0, nw_pad - nw)])
        x0 = jnp.pad(x0, [(0, 0), (0, nw_pad - nw)])

    assert h < 65536 and w_img < 65536, (h, w_img)  # origins pack into 16 bits
    yx0 = (y0.astype(jnp.int32) << 16) | x0.astype(jnp.int32)

    # SMEM guard: the packed-origin scalar-prefetch operand must stay within
    # half the chip's 1 MB SMEM; larger NW (full-frame validation renders
    # reach NW = 16384/view and beyond at resolution_level 1) is processed
    # in segments of whole wb-groups.
    max_nw = max(wb, ((_SMEM_ORIGIN_BUDGET // 4) // max(v, 1)) // wb * wb)
    if nw_pad <= max_nw:
        fn = _build_call(v, nw_pad, p_pad, h, w_img, sh, wb, fused_dot, interpret)
        flat = fn(yx0, rx, ry, images4)  # [V, NWpad, 3*Ppad]
    else:
        parts = []
        for s in range(0, nw_pad, max_nw):
            e = min(s + max_nw, nw_pad)
            fn = _build_call(v, e - s, p_pad, h, w_img, sh, wb, fused_dot, interpret)
            parts.append(fn(yx0[:, s:e], rx[:, s:e], ry[:, s:e], images4))
        flat = jnp.concatenate(parts, axis=1)
    colors = flat.reshape(v, nw_pad, 3, p_pad)[:, :nw, :, :p]
    return colors, in_strip


def strip_sample_reference(images4, gx, gy):
    """Same contract via exact XLA gathers (f32) — CPU fallback and test
    oracle. Clamped-border semantics like the kernel; returns the in-image
    mask in place of in_strip (no strip escapes)."""
    from .interp import grid_sample_2d_xy

    v, c4, h, w_img = images4.shape
    imgs = images4[:, :3].astype(jnp.float32)  # [V, 3, H, W]
    gx = jax.lax.stop_gradient(gx)
    gy = jax.lax.stop_gradient(gy)
    in_img = (gx >= 0) & (gx <= w_img - 1) & (gy >= 0) & (gy <= h - 1)
    gxc = jnp.clip(gx, 0.0, w_img - 1.0)
    gyc = jnp.clip(gy, 0.0, h - 1.0)
    nx = 2.0 * gxc / (w_img - 1) - 1.0
    ny = 2.0 * gyc / (h - 1) - 1.0
    colors = jax.vmap(
        lambda im, x, y: grid_sample_2d_xy(im, x, y, channels_last=False)
    )(imgs, nx, ny)  # [V, 3, NW, P]
    return colors.transpose(0, 2, 1, 3), in_img
