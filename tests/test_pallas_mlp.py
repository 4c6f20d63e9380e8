"""Correctness of the fused Pallas distance-MLP kernel (interpret mode on
the CPU test mesh; the real kernel is exercised on TPU by the perf
harness)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuraludf_tpu.config import UDFNetworkConfig
from neuraludf_tpu.nets import fields


def test_fused_kernel_matches_xla(monkeypatch):
    from jax.experimental import pallas as pl

    import neuraludf_tpu.ops.pallas_mlp as pm

    # run the kernel in interpreter mode on CPU
    orig = pl.pallas_call

    def interp_call(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", interp_call)

    cfg = UDFNetworkConfig(d_out=65, d_hidden=64, n_layers=4, skip_in=(2,), multires=4)
    params = fields.init_distance_field(jax.random.PRNGKey(0), cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (pm.BLOCK + 7, 3), minval=-1, maxval=1)

    ref = np.asarray(fields.distance_value(params, pts, cfg))[:, 0]
    out = np.asarray(pm.distance_value_fused(params, pts, cfg))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
