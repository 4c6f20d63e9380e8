"""Density/alpha transforms for UDF volume rendering.

Pure elementwise math — XLA fuses these into the surrounding kernels.
References: models/udf_renderer_blending.py:151-159 (udf2logistic),
:292-325 (sdf2alpha), :394-419 (occlusion-aware alpha mixing).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def udf2logistic(udf, inv_s, gamma=20.0, abs_cos_val=1.0, cos_anneal_ratio=None):
    """Occlusion density: logistic-distribution PDF in the UDF,
    raw = gamma * |cos| * s * e^{-s u} / (1 + e^{-s u})^2.

    Uses the numerically-stable identity s*e^{-su}/(1+e^{-su})^2 =
    s * sigmoid(su) * sigmoid(-su), which avoids overflow for s*u < 0
    (the torch original overflows to nan there; u >= 0 for true UDFs)."""
    if cos_anneal_ratio is not None:
        abs_cos_val = (abs_cos_val * 0.5 + 0.5) * (1.0 - cos_anneal_ratio) + (
            abs_cos_val * cos_anneal_ratio
        )
    su = inv_s * udf
    raw = abs_cos_val * inv_s * jax.nn.sigmoid(su) * jax.nn.sigmoid(-su)
    return raw * gamma


def anneal_cos(true_cos, cos_anneal_ratio: Optional[jnp.ndarray]):
    """NeuS cosine annealing: keeps cos 'not dead' early in training
    (ref: udf_renderer_blending.py:295-297). Always non-positive."""
    if cos_anneal_ratio is None:
        return true_cos
    return -(
        jax.nn.relu(-true_cos * 0.5 + 0.5) * (1.0 - cos_anneal_ratio)
        + jax.nn.relu(-true_cos) * cos_anneal_ratio
    )


def sdf2alpha(
    sdf,
    true_cos,
    dists,
    inv_s,
    cos_anneal_ratio=None,
    sdf2alpha_type: str = "numerical",
):
    """NeuS-style section alpha from signed distance + ray/normal cosine.

    numerical: alpha = clip((sigmoid(s*(sdf - cos*d/2)) - sigmoid(s*(sdf +
    cos*d/2)) + 1e-5) / (sigmoid(s*(sdf - cos*d/2)) + 1e-5), 0, 1)
    theorical: alpha = 1 - exp(-relu(|cos|*s*(1 - sigmoid(s*sdf))) * d)
    """
    iter_cos = anneal_cos(true_cos, cos_anneal_ratio)
    if sdf2alpha_type == "numerical":
        est_next = sdf + iter_cos * dists * 0.5
        est_prev = sdf - iter_cos * dists * 0.5
        prev_cdf = jax.nn.sigmoid(est_prev * inv_s)
        next_cdf = jax.nn.sigmoid(est_next * inv_s)
        alpha = (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)
        return jnp.clip(alpha, 0.0, 1.0)
    elif sdf2alpha_type == "theorical":
        raw = jnp.abs(iter_cos) * inv_s * (1.0 - jax.nn.sigmoid(sdf * inv_s))
        return 1.0 - jnp.exp(-jax.nn.relu(raw) * dists)
    raise ValueError(sdf2alpha_type)


def transmittance_weights(alpha: jnp.ndarray) -> jnp.ndarray:
    """w_i = alpha_i * prod_{j<i} (1 - alpha_j + 1e-7): per-ray cumulative
    product along the sample axis (ref: udf_renderer_blending.py:508-509)."""
    batch = alpha.shape[0]
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones((batch, 1), alpha.dtype), 1.0 - alpha + 1e-7], axis=-1),
        axis=-1,
    )[:, :-1]
    return alpha * trans


def visibility_prob(alpha_occ: jnp.ndarray, vis_boost: jnp.ndarray) -> jnp.ndarray:
    """vis_prob_i = prod_{j<i} clip(1 - alpha_occ_j + boost_j, 0, 1) + 1e-7:
    probability the first surface has not yet been crossed
    (ref: udf_renderer_blending.py:407-412)."""
    batch = alpha_occ.shape[0]
    factor = jnp.clip(1.0 - alpha_occ + vis_boost, 0.0, 1.0) + 1e-7
    return jnp.cumprod(
        jnp.concatenate([jnp.ones((batch, 1), alpha_occ.dtype), factor], axis=-1), axis=-1
    )[:, :-1]
