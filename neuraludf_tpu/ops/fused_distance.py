"""Fused distance-field kernel: value + feature + spatial gradient in VMEM.

The training step's hot path evaluates the distance MLP at B×N sample
points and needs (udf, feature, ∇udf) plus the loss VJP through all three
(the eikonal term makes that second-order). Under plain XLA each AD level
materializes its [BN, 256] activations in HBM — the round-1 profile showed
~25 ms/step of dot fusions dominated by that traffic (ref design target:
SURVEY.md §7 "hard parts", VERDICT.md next-round #2).

This module fuses the whole computation into two Pallas kernels:

* **forward**: per block of points, run the MLP forward and an in-kernel
  reverse sweep for ∇udf. Weights live in VMEM across the grid; per-layer
  activations never leave VMEM.
* **backward** (custom_vjp): recompute the forward in VMEM and evaluate the
  full (second-order) VJP of (udf, feat, grad) w.r.t. (x, weights) — traced
  with `jax.vjp` *inside* the kernel body, so Mosaic keeps every
  intermediate on-chip. Weight cotangents accumulate across grid steps in a
  VMEM-resident output block.

The op consumes *effective* weights; weight-norm reparametrisation
(v·g/|v|) stays outside in XLA where its VJP is cheap [256×256] math.

Numerics: in-kernel matmul precision is tiered via
NEURALUDF_FUSED_PRECISION = default (one bf16 MXU pass) | high (manual
bf16x3 ~= f32) | highest (true f32). Measured on the DTU-config step:
18.4 / 23.0 / 31.4 ms. End-to-end training quality per tier is measured by
scripts/ab_quality.py (Chamfer vs analytic GT on synthetic scenes); see
docs/DESIGN.md for the recorded numbers backing the shipping tier choice.
Everything else is f32 elementwise, identical formulas to
nets/fields.py:distance_field_apply.
"""

from __future__ import annotations

import functools
import os
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import UDFNetworkConfig

def _dot3(x, w):
    """bf16x3 matmul (≈ XLA Precision.HIGH, which Mosaic cannot lower):
    split both operands into bf16 hi/lo halves; three one-pass products
    recover ~f32 accuracy. AD through the casts stays consistent."""
    P = jax.lax.Precision.DEFAULT
    xh = x.astype(jnp.bfloat16).astype(jnp.float32)
    xl = x - xh
    wh = w.astype(jnp.bfloat16).astype(jnp.float32)
    wl = w - wh
    return (
        jnp.dot(xh, wh, precision=P)
        + jnp.dot(xh, wl, precision=P)
        + jnp.dot(xl, wh, precision=P)
    )


_DOTS = {
    "highest": lambda x, w: jnp.dot(x, w, precision=jax.lax.Precision.HIGHEST),
    "high": _dot3,
    "default": lambda x, w: jnp.dot(x, w, precision=jax.lax.Precision.DEFAULT),
}


# ----------------------------------------------------------------------
# pure math shared by both kernels (same formulas as fields.distance_*)
# ----------------------------------------------------------------------


def effective_weights(params, cfg: UDFNetworkConfig) -> Tuple[Tuple[jnp.ndarray, ...], Tuple[jnp.ndarray, ...]]:
    """Resolve weight-norm layers to plain (W, b) pairs (XLA-side)."""
    ws, bs = [], []
    n_lin = cfg.n_layers + 1
    for l in range(n_lin):
        p = params[f"lin{l}"]
        if "v" in p:
            v = p["v"]
            w = v * (p["g"][None, :] / jnp.linalg.norm(v, axis=0, keepdims=True))
        else:
            w = p["w"]
        ws.append(w)
        bs.append(p["b"])
    return tuple(ws), tuple(bs)


def _pe_unrolled(x, multires: int):
    """positional_encoding with literal scalar frequencies — identical
    output ordering (nets/embedder.py:19-37) but free of constant arrays,
    which pallas kernel bodies may not capture."""
    feats = [x]
    for k in range(multires):
        xb = x * float(2.0 ** k)
        feats.append(jnp.sin(xb))
        feats.append(jnp.cos(xb))
    return jnp.concatenate(feats, axis=-1)


def _mlp_raw(x, ws: Sequence, bs: Sequence, cfg: UDFNetworkConfig, dot):
    """Embedded-input MLP, returns raw head output [N, d_out] (pre abs/scale).
    Mirrors nets/fields.py:distance_field_apply exactly."""
    from ..nets.mlp import softplus100

    inputs = x * cfg.scale
    if cfg.multires > 0:
        inputs = _pe_unrolled(inputs, cfg.multires)
    n_lin = cfg.n_layers + 1
    h = inputs
    for l in range(n_lin):
        if l in cfg.skip_in:
            h = jnp.concatenate([h, inputs], axis=-1) / np.sqrt(2)
        h = dot(h, ws[l]) + bs[l]
        if l < n_lin - 1:
            h = softplus100(h)
    return h


def _head(raw_col, cfg: UDFNetworkConfig):
    if cfg.udf_type == "abs":
        return jnp.abs(raw_col) / cfg.scale
    if cfg.udf_type == "square":
        return (raw_col ** 2) / cfg.scale
    return raw_col / cfg.scale  # 'sdf'


def _value_feat_grad(x, ws, bs, cfg: UDFNetworkConfig, dot):
    """(udf [N,1], feat [N,F], grad [N,3]) — grad via one reverse sweep."""

    def scalar_sum(pts):
        out = _mlp_raw(pts, ws, bs, cfg, dot)
        return _head(out[:, :1], cfg).sum(), out

    (_, out), grad = jax.value_and_grad(scalar_sum, has_aux=True)(x)
    return _head(out[:, :1], cfg), out[:, 1:], grad


# ----------------------------------------------------------------------
# pallas kernels
# ----------------------------------------------------------------------


def _fwd_body(cfg: UDFNetworkConfig, n_w: int, dot):
    def body(*refs):
        x_ref = refs[0]
        ws = [r[:] for r in refs[1 : 1 + n_w]]
        bs = [r[:] for r in refs[1 + n_w : 1 + 2 * n_w]]
        udf_ref, feat_ref, grad_ref = refs[1 + 2 * n_w :]
        udf, feat, grad = _value_feat_grad(x_ref[:], ws, bs, cfg, dot)
        udf_ref[:] = udf
        feat_ref[:] = feat
        grad_ref[:] = grad

    return body


def _bwd_body(cfg: UDFNetworkConfig, n_w: int, dot):
    import jax.experimental.pallas as pl

    def body(*refs):
        x_ref, ub_ref, fb_ref, gb_ref = refs[:4]
        ws = [r[:] for r in refs[4 : 4 + n_w]]
        bs = [r[:] for r in refs[4 + n_w : 4 + 2 * n_w]]
        out_refs = refs[4 + 2 * n_w :]
        xbar_ref = out_refs[0]
        wbar_refs = out_refs[1 : 1 + n_w]
        bbar_refs = out_refs[1 + n_w :]

        def F(pts, ws_, bs_):
            return _value_feat_grad(pts, ws_, bs_, cfg, dot)

        _, vjp = jax.vjp(F, x_ref[:], ws, bs)
        xbar, wsbar, bsbar = vjp((ub_ref[:], fb_ref[:], gb_ref[:]))
        xbar_ref[:] = xbar

        first = pl.program_id(0) == 0

        @pl.when(first)
        def _():
            for r, v in zip(wbar_refs, wsbar):
                r[:] = v
            for r, v in zip(bbar_refs, bsbar):
                r[:] = v

        @pl.when(jnp.logical_not(first))
        def _():
            for r, v in zip(wbar_refs, wsbar):
                r[:] = r[:] + v
            for r, v in zip(bbar_refs, bsbar):
                r[:] = r[:] + v

    return body


@functools.lru_cache(maxsize=None)
def _build(cfg: UDFNetworkConfig, fwd_block: int, bwd_block: int, prec_name: str,
           interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # the nested-AD backward holds weights + their cotangents + per-block
    # activations in VMEM; the 16 MB default scoped limit is too tight
    compiler_params = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    dot = _DOTS[prec_name]
    n_w = cfg.n_layers + 1
    d_feat = cfg.d_out - 1

    def _w_specs(ws_shapes):
        # whole weight resident in VMEM for every grid step
        # (bind ndim per spec — lambdas in comprehensions late-bind loop vars)
        return [
            pl.BlockSpec(s, lambda i, _nd=len(s): (0,) * _nd, memory_space=pltpu.VMEM)
            for s in ws_shapes
        ]

    def call_fwd(x, ws, bs):
        n = x.shape[0]
        npad = -n % fwd_block
        xp = jnp.pad(x, ((0, npad), (0, 0)))
        grid = (xp.shape[0] // fwd_block,)
        blocked = lambda width: pl.BlockSpec(
            (fwd_block, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            _fwd_body(cfg, n_w, dot),
            grid=grid,
            in_specs=[blocked(3)]
            + _w_specs([w.shape for w in ws])
            + _w_specs([b.shape for b in bs]),
            out_specs=[blocked(1), blocked(d_feat), blocked(3)],
            out_shape=[
                jax.ShapeDtypeStruct((xp.shape[0], 1), x.dtype),
                jax.ShapeDtypeStruct((xp.shape[0], d_feat), x.dtype),
                jax.ShapeDtypeStruct((xp.shape[0], 3), x.dtype),
            ],
            interpret=interpret,
            compiler_params=None if interpret else compiler_params,
        )(xp, *ws, *bs)
        return tuple(o[:n] for o in out)

    def call_bwd(x, ws, bs, ubar, fbar, gbar):
        n = x.shape[0]
        npad = -n % bwd_block
        pad2 = lambda a: jnp.pad(a, ((0, npad), (0, 0)))
        xp = pad2(x)
        grid = (xp.shape[0] // bwd_block,)
        blocked = lambda width: pl.BlockSpec(
            (bwd_block, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            _bwd_body(cfg, n_w, dot),
            grid=grid,
            in_specs=[blocked(3), blocked(1), blocked(d_feat), blocked(3)]
            + _w_specs([w.shape for w in ws])
            + _w_specs([b.shape for b in bs]),
            out_specs=[blocked(3)]
            + _w_specs([w.shape for w in ws])
            + _w_specs([b.shape for b in bs]),
            out_shape=[jax.ShapeDtypeStruct((xp.shape[0], 3), x.dtype)]
            + [jax.ShapeDtypeStruct(w.shape, w.dtype) for w in ws]
            + [jax.ShapeDtypeStruct(b.shape, b.dtype) for b in bs],
            interpret=interpret,
            compiler_params=None if interpret else compiler_params,
        )(xp, pad2(ubar), pad2(fbar), pad2(gbar), *ws, *bs)
        xbar = out[0][:n]
        wsbar = tuple(out[1 : 1 + n_w])
        bsbar = tuple(out[1 + n_w :])
        return xbar, wsbar, bsbar

    @jax.custom_vjp
    def fused(x, ws, bs):
        return call_fwd(x, ws, bs)

    def fused_fwd(x, ws, bs):
        return call_fwd(x, ws, bs), (x, ws, bs)

    def fused_bwd(res, cot):
        x, ws, bs = res
        ubar, fbar, gbar = cot
        return call_bwd(x, ws, bs, ubar, fbar, gbar)

    fused.defvjp(fused_fwd, fused_bwd)
    return fused


def fused_enabled(cfg: UDFNetworkConfig = None) -> bool:
    """Config-schema switch (cfg.fused_core) with the NEURALUDF_FUSED_CORE
    env var as an override (empty/unset env -> config value)."""
    flag = os.environ.get("NEURALUDF_FUSED_CORE", "").lower()
    if not flag or flag == "auto":
        flag = (getattr(cfg, "fused_core", "auto") or "auto").lower()
    if flag in ("0", "off", "false"):
        return False
    if flag in ("1", "on", "true"):
        return True
    return jax.default_backend() == "tpu"  # auto


def distance_value_feat_grad_fused(
    params, x: jnp.ndarray, cfg: UDFNetworkConfig,
    *, fwd_block: int = 512, bwd_block: int = 256, interpret: bool = False,
):
    """Drop-in fused replacement for fields.distance_value_and_gradient.

    Block defaults are from the round-4 on-chip sweep at the production
    DTU shape (58368 pts, width 256): fwd/bwd 512/256 gives 9.5 ms
    fwd+bwd vs 10.8 ms at the old 256/128 (1024/256 tied at 9.4)."""
    ws, bs = effective_weights(params, cfg)
    prec_name = os.environ.get("NEURALUDF_FUSED_PRECISION", "").lower() or (
        getattr(cfg, "fused_precision", "default") or "default"
    ).lower()
    fn = _build(cfg, fwd_block, bwd_block, prec_name, interpret)
    return fn(x, ws, bs)
