"""Optimizer parity: our per-leaf Adam vs torch.optim.Adam, including
per-group learning rates and runtime freezing semantics."""

import numpy as np
import torch

import jax.numpy as jnp

from neuraludf_tpu.config import BetaNetworkConfig
from neuraludf_tpu.train.optim import (
    init_adam_state,
    make_lr_fn,
    make_trainable_fn,
    tree_adam_step,
)


def test_adam_matches_torch():
    rng = np.random.RandomState(0)
    w0 = rng.randn(7, 5).astype(np.float32)
    b0 = rng.randn(5).astype(np.float32)

    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    bt = torch.nn.Parameter(torch.from_numpy(b0.copy()))
    opt = torch.optim.Adam([wt, bt], lr=1e-3)

    params = {"udf": {"w": jnp.asarray(w0), "b": jnp.asarray(b0)}}
    state = init_adam_state(params)
    lr_fn = make_lr_fn(1e-3, 1e-3, 1e-3)
    trainable = lambda keys: 1.0

    for step in range(5):
        g_w = rng.randn(7, 5).astype(np.float32)
        g_b = rng.randn(5).astype(np.float32)
        opt.zero_grad()
        wt.grad = torch.from_numpy(g_w.copy())
        bt.grad = torch.from_numpy(g_b.copy())
        opt.step()
        grads = {"udf": {"w": jnp.asarray(g_w), "b": jnp.asarray(g_b)}}
        params, state = tree_adam_step(params, grads, state, lr_fn, trainable)

    np.testing.assert_allclose(np.asarray(params["udf"]["w"]), wt.detach().numpy(), rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(params["udf"]["b"]), bt.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_adam_group_lrs():
    """geo/main/nerf groups get their own learning rates
    (ref: exp_runner_blending.py:136-139)."""
    p0 = jnp.ones((3,))
    params = {"udf": {"x": p0}, "nerf": {"x": p0}, "variance": {"x": p0}}
    state = init_adam_state(params)
    grads = {k: {"x": jnp.ones((3,))} for k in params}
    lr_fn = make_lr_fn(lr_geo=1e-2, lr_main=1e-3, lr_nerf=1e-4)
    params2, _ = tree_adam_step(params, grads, state, lr_fn, lambda k: 1.0)
    d_geo = float(jnp.abs(params2["udf"]["x"] - p0).mean())
    d_main = float(jnp.abs(params2["variance"]["x"] - p0).mean())
    d_nerf = float(jnp.abs(params2["nerf"]["x"] - p0).mean())
    np.testing.assert_allclose(d_geo, 1e-2, rtol=1e-3)
    np.testing.assert_allclose(d_main, 1e-3, rtol=1e-3)
    np.testing.assert_allclose(d_nerf, 1e-4, rtol=1e-3)


def test_adam_freeze_semantics():
    """A frozen leaf keeps value, moments, and step count (torch
    requires_grad=False equivalence); unfreezing starts from step 0."""
    bcfg = BetaNetworkConfig(requires_grad_gamma=False, requires_grad_zeta=False)
    params = {
        "beta": {
            "beta": jnp.ones((1,)),
            "gamma": jnp.ones((1,)),
            "zeta": jnp.ones((1,)),
        }
    }
    state = init_adam_state(params)
    grads = {"beta": {k: jnp.full((1,), 0.5) for k in ("beta", "gamma", "zeta")}}
    lr_fn = make_lr_fn(1e-3, 1e-3, 1e-3)

    # beta frozen at first
    fn = make_trainable_fn(bcfg, variance_trainable=1.0, beta_trainable=0.0)
    params, state = tree_adam_step(params, grads, state, lr_fn, fn)
    assert float(params["beta"]["beta"][0]) == 1.0
    assert float(state["beta"]["beta"]["t"]) == 0.0
    assert float(params["beta"]["gamma"][0]) == 1.0  # gamma frozen by config

    # unfreeze beta: first update has bias correction of step 1
    fn = make_trainable_fn(bcfg, variance_trainable=1.0, beta_trainable=1.0)
    params, state = tree_adam_step(params, grads, state, lr_fn, fn)
    assert float(state["beta"]["beta"]["t"]) == 1.0
    np.testing.assert_allclose(float(params["beta"]["beta"][0]), 1.0 - 1e-3, rtol=1e-4)
