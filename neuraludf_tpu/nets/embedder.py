"""NeRF positional encoding (functional, shape-static).

Matches the reference embedder semantics (ref: models/embedder.py:6-51):
identity concat + [sin(f·x), cos(f·x)] per log-spaced frequency f = 2^k,
k = 0..multires-1, each applied to the full input vector.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def embed_dim(multires: int, input_dims: int = 3) -> int:
    if multires <= 0:
        return input_dims
    return input_dims * (1 + 2 * multires)


def positional_encoding(x: jnp.ndarray, multires: int) -> jnp.ndarray:
    """x: [..., d] -> [..., d*(1+2*multires)].

    Ordering matches the reference: [x, sin(2^0 x), cos(2^0 x),
    sin(2^1 x), cos(2^1 x), ...] — parity matters because the first-layer
    geometric init zeroes all non-identity columns.
    """
    if multires <= 0:
        return x
    # static constant (not an iota): multires is trace-time, and constant
    # folding keeps this kernel-friendly (Mosaic has no float iota)
    freqs = jnp.asarray(2.0 ** np.arange(multires), x.dtype)  # [m]
    # [..., m, d]: x * f for each frequency
    xb = x[..., None, :] * freqs[:, None]
    sin = jnp.sin(xb)
    cos = jnp.cos(xb)
    # interleave sin/cos per frequency: [..., m, 2, d] -> [..., m*2*d]
    sc = jnp.stack([sin, cos], axis=-2)
    sc = sc.reshape(*x.shape[:-1], 2 * multires * x.shape[-1])
    return jnp.concatenate([x, sc], axis=-1)
