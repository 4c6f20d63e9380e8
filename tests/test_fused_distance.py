"""Fused distance-field kernels (ops/fused_distance) vs the plain-XLA path:
outputs and full (second-order) VJPs must agree. Runs the Pallas kernels in
interpreter mode on the CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuraludf_tpu.config import UDFNetworkConfig
from neuraludf_tpu.nets import fields
from neuraludf_tpu.ops.fused_distance import distance_value_feat_grad_fused


def _loss_terms(u, f, g):
    # exercises every output, including the eikonal second-order path
    return u.sum() + (f ** 2).mean() + ((jnp.linalg.norm(g, axis=-1) - 1.0) ** 2).mean()


CASES = [
    ("tiny", UDFNetworkConfig(d_out=33, d_hidden=32, n_layers=4, skip_in=(2,), multires=4), 37),
    ("flagship", UDFNetworkConfig(), 40),  # 8x256, skip 4, multires 6, abs head
    ("sdf", UDFNetworkConfig(d_out=33, d_hidden=32, n_layers=4, skip_in=(2,),
                             multires=4, udf_type="sdf"), 29),
]


@pytest.mark.slow
@pytest.mark.parametrize("name,cfg,n", CASES, ids=[c[0] for c in CASES])
def test_fused_matches_plain(name, cfg, n):
    params = fields.init_distance_field(jax.random.PRNGKey(0), cfg)
    x = jax.random.uniform(jax.random.PRNGKey(1), (n, 3), minval=-1.0, maxval=1.0)

    u0, f0, g0 = fields.distance_value_and_gradient(params, x, cfg)
    u1, f1, g1 = distance_value_feat_grad_fused(
        params, x, cfg, fwd_block=16, bwd_block=16, interpret=True
    )
    np.testing.assert_allclose(np.asarray(u1), np.asarray(u0), atol=2e-6)
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), atol=2e-6)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0), atol=2e-6)

    def loss_plain(params, x):
        u, f, g = fields.distance_value_and_gradient(params, x, cfg)
        return _loss_terms(u, f, g)

    def loss_fused(params, x):
        u, f, g = distance_value_feat_grad_fused(
            params, x, cfg, fwd_block=16, bwd_block=16, interpret=True
        )
        return _loss_terms(u, f, g)

    gp, gxp = jax.grad(loss_plain, argnums=(0, 1))(params, x)
    gf, gxf = jax.grad(loss_fused, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(np.asarray(gxf), np.asarray(gxp), atol=5e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gp)):
        scale = max(float(jnp.abs(b).max()), 1.0)
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=3e-6
        )


def test_fused_disabled_on_cpu_by_default():
    """fused_enabled() must not auto-activate on the CPU test mesh."""
    import os

    from neuraludf_tpu.ops.fused_distance import fused_enabled

    assert os.environ.get("NEURALUDF_FUSED_CORE", "auto") in ("auto", "0")
    assert jax.default_backend() == "cpu"
    assert not fused_enabled()
