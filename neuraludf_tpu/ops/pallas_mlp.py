"""Pallas TPU kernel: fused distance-field MLP evaluation.

The hierarchical upsampler evaluates the UDF MLP 6× per training step on
growing point sets (ref: udf_renderer_blending.py:723-755) with no autodiff
(the rounds run under stop_gradient). Under XLA each layer's [N, 256]
activation round-trips HBM between matmuls; this kernel keeps the whole
chain — positional encoding, 9 (weight-norm-folded) linears, Softplus(100),
skip concat, |head| — in VMEM per point block, reading points once and
writing one scalar per point.

Weights are folded (W = v·g/||v||) once per call outside the kernel and
streamed into VMEM in full (~1.8 MB for the standard 8×256 net).

Used only for the sampling tier (value-only, non-differentiated); the
differentiated render path keeps the XLA implementation (nested AD through
the eikonal double backprop).

Status (measured on v5e, round 1): numerically exact vs the XLA path
(max diff 6e-8 on 53k points) but NOT faster — 2.3 ms vs XLA's 1.5 ms at
DEFAULT precision. For this 256-wide MLP XLA's pipelined per-layer kernels
already hide HBM traffic, and Mosaic's handling of the 39-wide embedded
input matmul is worse than XLA's. Kept as an optional backend
(NEURALUDF_FUSED_SAMPLING=1) and as the baseline for future kernel work;
the default path remains XLA.
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..config import UDFNetworkConfig

Params = Dict[str, Any]

BLOCK = 1024


def _supported(cfg: UDFNetworkConfig) -> bool:
    return (
        cfg.d_in == 3
        and cfg.multires > 0
        and len(cfg.skip_in) == 1
        and cfg.udf_type in ("abs", "square", "sdf")
        and cfg.scale == 1.0
    )


def fold_weights(params: Params, n_layers: int):
    """Apply weight-norm reparametrisation once: W_l = v * g / ||v||."""
    Ws, bs = [], []
    for l in range(n_layers):
        p = params[f"lin{l}"]
        if "v" in p:
            v = p["v"]
            W = v * (p["g"][None, :] / jnp.linalg.norm(v, axis=0, keepdims=True))
        else:
            W = p["w"]
        Ws.append(W)
        bs.append(p["b"])
    return Ws, bs


def _kernel(cfg: UDFNetworkConfig, n_layers: int, pts_ref, *refs):
    Ws = refs[:n_layers]
    bs = refs[n_layers : 2 * n_layers]
    out_ref = refs[2 * n_layers]

    x = pts_ref[:, :3]  # [B, 3]
    # positional encoding: [x, sin(2^k x), cos(2^k x)]_k
    parts = [x]
    for k in range(cfg.multires):
        xk = x * (2.0 ** k)
        parts.append(jnp.sin(xk))
        parts.append(jnp.cos(xk))
    emb = jnp.concatenate(parts, axis=-1)  # [B, d0]

    skip = cfg.skip_in[0]
    h = emb
    inv_sqrt2 = 1.0 / np.sqrt(2.0)
    for l in range(n_layers):
        if l == skip:
            h = jnp.concatenate([h, emb], axis=-1) * inv_sqrt2
        h = jnp.dot(h, Ws[l][:, :], preferred_element_type=jnp.float32) + bs[l][:]
        if l < n_layers - 1:
            h = jax.nn.softplus(100.0 * h) / 100.0
    head = h[:, :1]
    if cfg.udf_type == "abs":
        head = jnp.abs(head)
    elif cfg.udf_type == "square":
        head = head ** 2
    out_ref[:, :] = head


@functools.partial(jax.jit, static_argnums=(2,))
def _fused_call(pts, weights_flat, cfg: UDFNetworkConfig):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_layers = cfg.n_layers + 1
    Ws = weights_flat[:n_layers]
    bs = weights_flat[n_layers:]
    n = pts.shape[0]
    assert n % BLOCK == 0

    grid = (n // BLOCK,)
    in_specs = [pl.BlockSpec((BLOCK, 3), lambda i: (i, 0), memory_space=pltpu.ANY)]
    in_specs[0] = pl.BlockSpec((BLOCK, 3), lambda i: (i, 0))
    weight_specs = [pl.BlockSpec(W.shape, lambda i: (0, 0)) for W in Ws]
    bias_specs = [pl.BlockSpec(b.shape, lambda i: (0,)) for b in bs]

    out = pl.pallas_call(
        functools.partial(_kernel, cfg, n_layers),
        out_shape=jax.ShapeDtypeStruct((n, 1), jnp.float32),
        grid=grid,
        in_specs=in_specs + weight_specs + bias_specs,
        out_specs=pl.BlockSpec((BLOCK, 1), lambda i: (i, 0)),
    )(pts, *Ws, *bs)
    return out[:, 0]


def distance_value_fused(params: Params, pts: jnp.ndarray, cfg: UDFNetworkConfig) -> jnp.ndarray:
    """Fused UDF values [N] for sampling (pads N to the block size)."""
    assert _supported(cfg), "unsupported distance-field config for the fused kernel"
    n = pts.shape[0]
    pad = (-n) % BLOCK
    if pad:
        pts = jnp.concatenate([pts, jnp.zeros((pad, 3), pts.dtype)])
    Ws, bs = fold_weights(params, cfg.n_layers + 1)
    out = _fused_call(pts, tuple(Ws) + tuple(bs), cfg)
    return out[:n]
