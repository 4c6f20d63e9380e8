"""Optimizer parity: our per-leaf Adam vs torch.optim.Adam, including
per-group learning rates and runtime freezing semantics."""

import numpy as np
import torch

import jax.numpy as jnp

from neuraludf_tpu.config import BetaNetworkConfig
from neuraludf_tpu.train.optim import (
    flat_adam_step,
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


def test_flat_adam_matches_tree():
    """The flattened single-kernel Adam is bit-identical to the per-leaf
    version on a real-shaped mixed tree (group lrs, frozen leaves, multiple
    steps) and produces the same per-leaf state layout."""
    import jax

    rng = np.random.RandomState(1)
    bcfg = BetaNetworkConfig(requires_grad_gamma=False, requires_grad_zeta=True)
    mk = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32))
    params = {
        "udf": {"lin0": {"v": mk(39, 256), "g": mk(256), "b": mk(256)},
                "lin1": {"v": mk(256, 257), "g": mk(257), "b": mk(257)}},
        "color": {"lin0": {"v": mk(259, 128), "b": mk(128)}},
        "nerf": {"lin0": {"v": mk(84, 64), "b": mk(64)}},
        "variance": mk(1),
        "beta": {"beta": mk(1), "gamma": mk(1), "zeta": mk(1)},
    }
    state_t = init_adam_state(params)
    state_f = init_adam_state(params)
    p_t, p_f = params, params
    lr_fn = make_lr_fn(1e-3, 5e-4, 1e-4)
    for step in range(4):
        grads = jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.randn(*p.shape).astype(np.float32)), p_t
        )
        # flip variance trainability mid-run like the reference's it>20000 gate
        fn = make_trainable_fn(bcfg, variance_trainable=float(step >= 2),
                               beta_trainable=1.0)
        p_t, state_t = tree_adam_step(p_t, grads, state_t, lr_fn, fn)
        p_f, state_f = flat_adam_step(p_f, grads, state_f, lr_fn, fn)
    for (ka, a), (kb, b) in zip(
        jax.tree_util.tree_leaves_with_path(p_t),
        jax.tree_util.tree_leaves_with_path(p_f),
    ):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(ka))
    for a, b in zip(jax.tree_util.tree_leaves(state_t),
                    jax.tree_util.tree_leaves(state_f)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
