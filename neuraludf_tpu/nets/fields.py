"""Neural fields as functional JAX modules (param pytrees + pure applies).

TPU-native re-design of the reference networks (ref: models/fields.py):

  * ``DistanceField``  — UDFNetwork/SDFNetwork unified (ref: fields.py:10-231)
  * ``ResidualColor``  — two-stage color net + blending logits (ref: :400-495)
  * ``BackgroundNeRF`` — NeRF++ background model (ref: :541-642)
  * variance / beta scalar nets (ref: :645-700)
  * ``color_blend``    — per-view softmax blending (ref: :498-537)

Spatial UDF gradients use ``jax.grad`` of the summed scalar output (one
reverse sweep, batched — replaces torch autograd.grad double-backprop); the
eikonal loss then differentiates *through* that gradient via nested AD.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import (
    BetaNetworkConfig,
    NeRFConfig,
    RenderingNetworkConfig,
    UDFNetworkConfig,
    VarianceConfig,
)
from .embedder import embed_dim, positional_encoding
from .mlp import (
    geometric_linear,
    linear,
    policy,
    softplus100,
    to_weight_norm,
    torch_default_linear,
)

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Distance field (UDF / SDF)
# ---------------------------------------------------------------------------

def _distance_dims(cfg: UDFNetworkConfig) -> Tuple[list, int]:
    d0 = embed_dim(cfg.multires, cfg.d_in) if cfg.multires > 0 else cfg.d_in
    dims = [d0] + [cfg.d_hidden] * cfg.n_layers + [cfg.d_out]
    return dims, d0


def init_distance_field(key, cfg: UDFNetworkConfig) -> Params:
    dims, d0 = _distance_dims(cfg)
    num_layers = len(dims)
    params: Params = {}
    keys = jax.random.split(key, num_layers - 1)
    for l in range(num_layers - 1):
        out_dim = dims[l + 1] - dims[0] if (l + 1) in cfg.skip_in else dims[l + 1]
        if cfg.geometric_init:
            p = geometric_linear(
                keys[l], dims[l], out_dim, l, num_layers, d0, cfg.skip_in,
                cfg.multires, cfg.bias,
                inside_outside=(cfg.udf_type == "sdf" and cfg.inside_outside),
            )
        else:
            p = torch_default_linear(keys[l], dims[l], out_dim)
        if cfg.weight_norm:
            p = to_weight_norm(p)
        params[f"lin{l}"] = p
    return params


def distance_field_apply(
    params: Params, x: jnp.ndarray, cfg: UDFNetworkConfig, *, role: str = "distance"
) -> jnp.ndarray:
    """x: [N, 3] -> [N, d_out] = [distance(1), feature(d_out-1)].

    role selects the matmul precision tier: "distance" (HIGHEST — the
    differentiated render/eikonal path) or "sampling" (fast — the no-grad
    upsampling evaluations, which only steer where samples land).
    """
    inputs = x * cfg.scale
    if cfg.multires > 0:
        inputs = positional_encoding(inputs, cfg.multires)
    dims, _ = _distance_dims(cfg)
    num_layers = len(dims)
    h = inputs
    for l in range(num_layers - 1):
        if l in cfg.skip_in:
            h = jnp.concatenate([h, inputs], axis=-1) / np.sqrt(2)
        h = linear(params[f"lin{l}"], h, precision=policy(role))
        if l < num_layers - 2:
            h = softplus100(h)
    head = h[:, :1]
    if cfg.udf_type == "abs":
        head = jnp.abs(head)
    elif cfg.udf_type == "square":
        head = head ** 2
    # 'sdf': identity
    return jnp.concatenate([head / cfg.scale, h[:, 1:]], axis=-1)


def distance_value(
    params: Params, x: jnp.ndarray, cfg: UDFNetworkConfig, *, role: str = "distance"
) -> jnp.ndarray:
    return distance_field_apply(params, x, cfg, role=role)[:, :1]


def distance_gradient(params: Params, x: jnp.ndarray, cfg: UDFNetworkConfig) -> jnp.ndarray:
    """Spatial gradient d(udf)/dx: [N, 3].

    Because udf is pointwise, grad of the batch sum equals per-point
    gradients — a single reverse sweep, differentiable again for the
    eikonal double-backprop (ref: fields.py:219-231).
    """
    return jax.grad(lambda pts: distance_value(params, pts, cfg).sum())(x)


def distance_value_and_gradient(
    params: Params, x: jnp.ndarray, cfg: UDFNetworkConfig
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(value, features, spatial gradient) — the render-core hot call.

    On TPU this dispatches to the fused Pallas kernels (ops/fused_distance:
    forward + custom-VJP backward entirely in VMEM, ~2x the plain-XLA
    nested-AD graph at matched precision); NEURALUDF_FUSED_CORE=0 forces
    the plain path (always used on CPU, where tests validate both against
    each other); cfg.fused_core / cfg.fused_precision are the config-schema
    switches."""
    from ..ops import fused_distance as fd

    if fd.fused_enabled(cfg):
        return fd.distance_value_feat_grad_fused(params, x, cfg)
    out = distance_field_apply(params, x, cfg)
    grad = distance_gradient(params, x, cfg)
    return out[:, :1], out[:, 1:], grad


# ---------------------------------------------------------------------------
# Residual rendering network (two-stage color + blending logits)
# (ref: models/fields.py:400-495)
# ---------------------------------------------------------------------------

def _residual_dims(cfg: RenderingNetworkConfig) -> Tuple[list, list]:
    dims_base = [cfg.d_in - 3 + cfg.d_feature] + [cfg.d_hidden] * cfg.n_layers + [cfg.d_out]
    dims = [cfg.d_hidden + cfg.d_out + 3] + [cfg.d_hidden] * cfg.n_layers + [
        cfg.d_out + cfg.blending_cand_views
    ]
    if cfg.multires_view > 0 and cfg.mode != "no_view_dir":
        dims[0] += embed_dim(cfg.multires_view, 3) - 3
    return dims_base, dims


def init_residual_color(key, cfg: RenderingNetworkConfig) -> Params:
    dims_base, dims = _residual_dims(cfg)
    n = len(dims)
    params: Params = {"base": {}, "main": {}}
    keys = jax.random.split(key, 2 * (n - 1))
    for l in range(n - 1):
        p = torch_default_linear(keys[l], dims[l], dims[l + 1])
        if cfg.weight_norm:
            p = to_weight_norm(p)
        params["main"][f"lin{l}"] = p
    for l in range(n - 1):
        p = torch_default_linear(keys[n - 1 + l], dims_base[l], dims_base[l + 1])
        if cfg.weight_norm:
            p = to_weight_norm(p)
        params["base"][f"lin{l}"] = p
    return params


def residual_color_apply(
    params: Params,
    points: jnp.ndarray,
    normals: jnp.ndarray,
    view_dirs: jnp.ndarray,
    feature_vectors: jnp.ndarray,
    cfg: RenderingNetworkConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Returns (color_base [N,3], color [N,3], blending_logits [N,V])."""
    if cfg.multires_view > 0 and cfg.mode != "no_view_dir":
        view_dirs = positional_encoding(view_dirs, cfg.multires_view)

    if cfg.mode == "no_normal":
        base_in = jnp.concatenate([points, feature_vectors], axis=-1)
    else:
        normals = jax.lax.stop_gradient(normals)
        base_in = jnp.concatenate([points, normals, -normals, feature_vectors], axis=-1)

    n = cfg.n_layers + 2  # len(dims)
    h = base_in
    x_hidden = None
    for l in range(n - 1):
        h = linear(params["base"][f"lin{l}"], h, precision=policy("color"))
        if l < n - 2:
            h = jax.nn.relu(h)
        if l == n - 3:
            x_hidden = h
    color_base = jax.nn.sigmoid(h[:, : cfg.d_out])

    h = jnp.concatenate([view_dirs, color_base, x_hidden], axis=-1)
    for l in range(n - 1):
        h = linear(params["main"][f"lin{l}"], h, precision=policy("color"))
        if l < n - 2:
            h = jax.nn.relu(h)
    color = jax.nn.sigmoid(h[:, : cfg.d_out])
    blending_logits = h[:, cfg.d_out:]
    return color_base, color, blending_logits


# ---------------------------------------------------------------------------
# Background NeRF (inverse-sphere NeRF++ model) (ref: models/fields.py:541-642)
# ---------------------------------------------------------------------------

def init_background_nerf(key, cfg: NeRFConfig) -> Params:
    input_ch = embed_dim(cfg.multires, cfg.d_in) if cfg.multires > 0 else 3
    input_ch_view = embed_dim(cfg.multires_view, cfg.d_in_view) if cfg.multires_view > 0 else 3
    params: Params = {"pts": {}, "views": {}}
    n_keys = cfg.D + 4
    keys = jax.random.split(key, n_keys)
    ki = 0
    d_prev = input_ch
    for i in range(cfg.D):
        d_in = input_ch if i == 0 else (cfg.W + input_ch if (i - 1) in cfg.skips else cfg.W)
        params["pts"][f"lin{i}"] = torch_default_linear(keys[ki], d_in, cfg.W)
        ki += 1
    params["views"]["lin0"] = torch_default_linear(keys[ki], input_ch_view + cfg.W, cfg.W // 2)
    ki += 1
    params["feature"] = torch_default_linear(keys[ki], cfg.W, cfg.W)
    ki += 1
    params["alpha"] = torch_default_linear(keys[ki], cfg.W, 1)
    ki += 1
    params["rgb"] = torch_default_linear(keys[ki], cfg.W // 2, 3)
    return params


def background_nerf_apply(
    params: Params, pts: jnp.ndarray, views: Optional[jnp.ndarray], cfg: NeRFConfig
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """pts: [N, d_in] (x/r, 1/r parametrisation built by the renderer),
    views: [N, 3]. Returns (raw_density [N,1], rgb [N,3])."""
    h_in = positional_encoding(pts, cfg.multires) if cfg.multires > 0 else pts
    v_in = None
    if views is not None:
        v_in = positional_encoding(views, cfg.multires_view) if cfg.multires_view > 0 else views
    h = h_in
    for i in range(cfg.D):
        h = jax.nn.relu(linear(params["pts"][f"lin{i}"], h, precision=policy("nerf")))
        if i in cfg.skips:
            h = jnp.concatenate([h_in, h], axis=-1)
    alpha = linear(params["alpha"], h, precision=policy("nerf"))
    if v_in is None:
        return alpha, None
    feat = linear(params["feature"], h, precision=policy("nerf"))
    h = jnp.concatenate([feat, v_in], axis=-1)
    h = jax.nn.relu(linear(params["views"]["lin0"], h, precision=policy("nerf")))
    rgb = linear(params["rgb"], h, precision=policy("nerf"))
    return alpha, rgb


# ---------------------------------------------------------------------------
# Scalar nets (ref: models/fields.py:645-700)
# ---------------------------------------------------------------------------

def init_variance(cfg: VarianceConfig) -> Params:
    return {"variance": jnp.array([cfg.init_val], jnp.float32)}


def variance_inv_s(params: Params) -> jnp.ndarray:
    """exp(10 * variance), the inv_s sharpness scalar."""
    return jnp.exp(params["variance"] * 10.0)


def init_beta(cfg: BetaNetworkConfig) -> Params:
    return {
        "beta": jnp.array([cfg.init_var_beta], jnp.float32),
        "gamma": jnp.array([cfg.init_var_gamma], jnp.float32),
        "zeta": jnp.array([cfg.init_var_zeta], jnp.float32),
    }


def beta_value(params: Params, beta_min: float = 0.00005) -> jnp.ndarray:
    return jnp.clip(jnp.exp(params["beta"] * 10.0), 0.0, 1.0 / beta_min)


def gamma_value(params: Params) -> jnp.ndarray:
    return jnp.exp(params["gamma"] * 10.0)


def zeta_value(params: Params) -> jnp.ndarray:
    return jnp.abs(params["zeta"])


# ---------------------------------------------------------------------------
# Per-view color blending (ref: models/fields.py:498-537)
# ---------------------------------------------------------------------------

def color_blend(
    blending_logits: jnp.ndarray,
    img_index: Optional[jnp.ndarray] = None,
    pts_pixel_color: Optional[jnp.ndarray] = None,
    pts_pixel_mask: Optional[jnp.ndarray] = None,
    pts_patch_color: Optional[jnp.ndarray] = None,
    pts_patch_mask: Optional[jnp.ndarray] = None,
):
    """Fuse per-view warped colors with learned blending weights.

    blending_logits: [B, S, n_cand]; pixel color/mask: [B, S, V, 3]/[B, S, V];
    patch color/mask: [B, S, V, 3, Npx]/[B, S, V, Npx] (channel-packed,
    patch axis minor — see PatchProjector.patch_warp for the TPU layout
    rationale; the returned patch color is [B, S, 3, Npx]).
    """
    nviews = (
        pts_pixel_color.shape[-2] if pts_pixel_color is not None else pts_patch_color.shape[-3]
    )
    if img_index is not None:
        logits = jnp.take(blending_logits, img_index.astype(jnp.int32), axis=-1)
    else:
        logits = blending_logits[..., :nviews]

    final_pixel_color = final_pixel_mask = None
    if pts_pixel_color is not None:
        w_pix = jax.nn.softmax(logits, axis=-1)
        w_pix = w_pix * pts_pixel_mask
        w_pix = w_pix / (jnp.sum(w_pix, axis=-1, keepdims=True) + 1e-8)
        final_pixel_color = jnp.sum(pts_pixel_color * w_pix[..., None], axis=-2)
        final_pixel_mask = jnp.sum(pts_pixel_mask, axis=-1, keepdims=True) > 0

    final_patch_color, final_patch_mask = None, None
    if pts_patch_color is not None:
        npx = pts_patch_color.shape[-1]
        patch_mask = jnp.sum(pts_patch_mask, axis=-1) > (npx - 1)  # [B, S, V]
        w_patch = jax.nn.softmax(logits, axis=-1) * patch_mask
        w_patch = w_patch / (jnp.sum(w_patch, axis=-1, keepdims=True) + 1e-8)
        final_patch_color = jnp.einsum(
            "bsvcp,bsv->bscp", pts_patch_color, w_patch
        )  # [B, S, 3, Npx]
        final_patch_mask = jnp.sum(patch_mask, axis=-1, keepdims=True) > 0  # [B, S, 1]

    return final_pixel_color, final_pixel_mask, final_patch_color, final_patch_mask
