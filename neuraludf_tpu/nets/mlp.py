"""Linear layers as parameter pytrees, with PyTorch-compatible inits.

The reference relies on torch ``nn.Linear`` defaults and explicit geometric
initialisation plus ``nn.utils.weight_norm`` (ref: models/fields.py:42-75,
148-181). Initialisation details materially affect convergence, so both are
replicated exactly:

  * torch default Linear init: W ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)), same
    for bias (kaiming_uniform with a=sqrt(5)).
  * weight norm is expressed explicitly as W = v * g / ||v|| with the norm
    over the input axis (torch dim=0 on a [out, in] weight == per output
    unit), g initialised to ||v||.

Weights are stored transposed relative to torch ([d_in, d_out]) so the
forward pass is a plain `x @ w` feeding the MXU.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]

# Per-network matmul precision policy. The distance field drives surface
# extraction and the eikonal double backprop — one bf16 MXU pass (~2e-3
# rel error) visibly degrades it, so it pins HIGHEST (true f32). The
# radiance networks (color, background NeRF) only shape the photometric
# loss and tolerate the fast path (~38% step-time saving together).
# Override globally with NEURALUDF_PRECISION=highest|high|default.
import os as _os

_NAMES = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}
_FORCED = _os.environ.get("NEURALUDF_PRECISION", "").lower() or None

PRECISION_POLICY = {
    "distance": _NAMES.get(
        _os.environ.get("NEURALUDF_DISTANCE_PRECISION", "").lower(),
        jax.lax.Precision.HIGHEST,
    ),
    "sampling": jax.lax.Precision.DEFAULT,  # no-grad upsampling evals
    "color": jax.lax.Precision.DEFAULT,
    "nerf": jax.lax.Precision.DEFAULT,
}


def policy(role: str):
    if _FORCED is not None:
        return _NAMES[_FORCED]
    return PRECISION_POLICY[role]


def torch_default_linear(key, d_in: int, d_out: int, dtype=jnp.float32) -> Params:
    kw, kb = jax.random.split(key)
    bound = 1.0 / np.sqrt(d_in)
    w = jax.random.uniform(kw, (d_in, d_out), dtype, -bound, bound)
    b = jax.random.uniform(kb, (d_out,), dtype, -bound, bound)
    return {"w": w, "b": b}


def to_weight_norm(p: Params) -> Params:
    """Re-parametrise {'w','b'} into weight-norm form {'v','g','b'}."""
    v = p["w"]
    g = jnp.linalg.norm(v, axis=0)  # per-output-unit norm (torch dim=0)
    return {"v": v, "g": g, "b": p["b"]}


def linear(p: Params, x: jnp.ndarray, precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """Apply a (possibly weight-normed) linear layer.

    Matmul precision defaults to HIGHEST: on TPU the default would run the
    f32 matmul through one bf16 MXU pass (~2e-3 relative error), which is
    unacceptable for the distance field that drives surface extraction.
    """
    if "v" in p:  # weight-norm layer
        v = p["v"]
        norm = jnp.linalg.norm(v, axis=0, keepdims=True)
        w = v * (p["g"][None, :] / (norm))
        return jnp.dot(x, w, precision=precision) + p["b"]
    return jnp.dot(x, p["w"], precision=precision) + p["b"]


def softplus100(x: jnp.ndarray) -> jnp.ndarray:
    """torch Softplus(beta=100): log(1 + exp(100 x)) / 100 with the linear
    regime handled by jax.nn.softplus's stable formulation."""
    return jax.nn.softplus(100.0 * x) / 100.0


# ---------------------------------------------------------------------------
# Geometric (sphere) initialisation, UDF/SDF variant
# (ref: models/fields.py:156-173 for UDFNetwork, :50-68 for SDFNetwork)
# ---------------------------------------------------------------------------

def geometric_linear(
    key,
    d_in: int,
    d_out: int,
    layer: int,
    num_layers: int,
    dims0: int,
    skip_in,
    multires: int,
    bias: float,
    inside_outside: bool = False,
    dtype=jnp.float32,
) -> Params:
    """Init one layer of the geometric-initialised distance MLP.

    ``layer`` indexes 0..num_layers-2 as in the reference loop; ``dims0`` is
    the (embedded) input width; raw xyz occupies the first 3 columns of the
    embedding.
    """
    kw, kb = jax.random.split(key)
    if layer == num_layers - 2:  # last layer: mean-shifted normal, -bias
        mean = np.sqrt(np.pi) / np.sqrt(d_in)
        if inside_outside:
            mean, bias_val = -mean, bias
        else:
            bias_val = -bias
        w = mean + 0.0001 * jax.random.normal(kw, (d_in, d_out), dtype)
        b = jnp.full((d_out,), bias_val, dtype)
    elif multires > 0 and layer == 0:
        # identity-xyz columns get a normal init; PE columns start at zero
        w = jnp.zeros((d_in, d_out), dtype)
        w = w.at[:3, :].set(
            jax.random.normal(kw, (3, d_out), dtype) * (np.sqrt(2) / np.sqrt(d_out))
        )
        b = jnp.zeros((d_out,), dtype)
    elif multires > 0 and layer in skip_in:
        # skip layer: zero the PE part of the re-injected embedding
        w = jax.random.normal(kw, (d_in, d_out), dtype) * (np.sqrt(2) / np.sqrt(d_out))
        w = w.at[-(dims0 - 3):, :].set(0.0)
        b = jnp.zeros((d_out,), dtype)
    else:
        w = jax.random.normal(kw, (d_in, d_out), dtype) * (np.sqrt(2) / np.sqrt(d_out))
        b = jnp.zeros((d_out,), dtype)
    return {"w": w, "b": b}
