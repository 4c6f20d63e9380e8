"""Adam with torch-compatible semantics, per-group learning rates, and
runtime trainability gating.

The reference uses one torch Adam over three param groups — geo (UDF net),
main (variance + color + beta), nerf — with per-group LR schedules
(ref: exp_runner_blending.py:136-139, :167-191) and flips
``requires_grad`` on beta/variance at runtime
(ref: exp_runner_blending.py:353-359).

In JAX we keep Adam state as a pytree mirroring the params and gate both
the moment updates and the step counter with a per-leaf trainability
scalar: a frozen leaf behaves exactly like torch's ``requires_grad=False``
(no update, moments and bias-correction step frozen), and flipping the
flag is a traced scalar — no recompilation.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

BETA1, BETA2, EPS = 0.9, 0.999, 1e-8


def init_adam_state(params: Params) -> Params:
    zeros = lambda p: {
        "m": jnp.zeros_like(p),
        "v": jnp.zeros_like(p),
        "t": jnp.zeros((), jnp.float32),
    }
    return jax.tree_util.tree_map(zeros, params)


def adam_update(params, grads, state, lr, trainable):
    """One Adam step on a single leaf.

    lr, trainable: scalars (trainable in {0., 1.}). Frozen leaves keep
    m, v, t and the value unchanged.
    """
    t = state["t"] + trainable
    m = trainable * (BETA1 * state["m"] + (1 - BETA1) * grads) + (1 - trainable) * state["m"]
    v = trainable * (BETA2 * state["v"] + (1 - BETA2) * grads ** 2) + (1 - trainable) * state["v"]
    t_safe = jnp.maximum(t, 1.0)
    m_hat = m / (1 - BETA1 ** t_safe)
    v_hat = v / (1 - BETA2 ** t_safe)
    new_p = params - trainable * lr * m_hat / (jnp.sqrt(v_hat) + EPS)
    return new_p, {"m": m, "v": v, "t": t}


def tree_adam_step(
    params: Params,
    grads: Params,
    state: Params,
    lr_fn: Callable[[tuple], jnp.ndarray],
    trainable_fn: Callable[[tuple], jnp.ndarray],
):
    """Apply Adam over the whole tree. lr_fn/trainable_fn map a leaf path
    (tuple of keys) to the scalar for that leaf."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    flat_grads = jax.tree_util.tree_leaves(grads)
    new_params, new_state = [], []
    state_flat, _ = jax.tree_util.tree_flatten_with_path(
        state, is_leaf=lambda x: isinstance(x, dict) and "m" in x
    )
    for (path, p), g, (_, s) in zip(flat, flat_grads, state_flat):
        keys = tuple(
            k.key if hasattr(k, "key") else getattr(k, "idx", None) for k in path
        )
        np_, ns_ = adam_update(p, g, s, lr_fn(keys), trainable_fn(keys))
        new_params.append(np_)
        new_state.append(ns_)
    return (
        jax.tree_util.tree_unflatten(treedef, new_params),
        jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(
                state, is_leaf=lambda x: isinstance(x, dict) and "m" in x
            ),
            new_state,
        ),
    )


def make_lr_fn(lr_geo, lr_main, lr_nerf):
    """Reference param groups: geo=udf net, nerf=background, main=rest
    (ref: exp_runner_blending.py:130-139)."""

    def lr_fn(path_keys):
        top = path_keys[0]
        if top == "udf":
            return lr_geo
        if top == "nerf":
            return lr_nerf
        return lr_main

    return lr_fn


def make_trainable_fn(beta_cfg, variance_trainable, beta_trainable):
    """Trainability per leaf: gamma/zeta follow the static config flags,
    beta and variance follow runtime scalars (ref: exp_runner:353-359)."""

    def fn(path_keys):
        top = path_keys[0]
        if top == "variance":
            return variance_trainable
        if top == "beta":
            leaf = path_keys[-1]
            if leaf == "beta":
                return beta_trainable
            if leaf == "gamma":
                return 1.0 if beta_cfg.requires_grad_gamma else 0.0
            if leaf == "zeta":
                return 1.0 if beta_cfg.requires_grad_zeta else 0.0
        return 1.0

    return fn
