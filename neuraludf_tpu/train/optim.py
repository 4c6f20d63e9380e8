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


def flat_adam_step(
    params: Params,
    grads: Params,
    state: Params,
    lr_fn: Callable[[tuple], jnp.ndarray],
    trainable_fn: Callable[[tuple], jnp.ndarray],
):
    """`tree_adam_step`, computed as ONE fused elementwise update over the
    concatenated parameter vector.

    Numerically identical per element (same ops, same order, same dtype —
    `test_optim.py::test_flat_adam_matches_tree`); the payoff is the XLA
    schedule: the per-leaf version puts ~85 small fusions on the
    backward→optimizer→next-forward critical path inside the scan window
    (the round-4 trace's ~3.6 ms/step weight-restaging stall, DESIGN.md
    §7c), the flat version replaces them with concat → one update kernel
    → split. State layout (per-leaf m/v/t) is unchanged, so checkpoints
    are interchangeable with the tree path.
    """
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    flat_grads = jax.tree_util.tree_leaves(grads)
    is_state_leaf = lambda x: isinstance(x, dict) and "m" in x
    state_flat, _ = jax.tree_util.tree_flatten_with_path(state, is_leaf=is_state_leaf)
    if any(p.dtype != jnp.float32 for _, p in flat):  # pragma: no cover
        return tree_adam_step(params, grads, state, lr_fn, trainable_fn)

    sizes = [int(p.size) for _, p in flat]
    shapes = [p.shape for _, p in flat]
    p_f = jnp.concatenate([p.ravel() for _, p in flat])
    g_f = jnp.concatenate([g.ravel() for g in flat_grads])
    m_f = jnp.concatenate([s["m"].ravel() for _, s in state_flat])
    v_f = jnp.concatenate([s["v"].ravel() for _, s in state_flat])
    lr_parts, tr_parts, t_parts, t_new = [], [], [], []
    for (path, p), (_, s) in zip(flat, state_flat):
        keys = tuple(
            k.key if hasattr(k, "key") else getattr(k, "idx", None) for k in path
        )
        ones = jnp.ones((p.size,), jnp.float32)
        tr = trainable_fn(keys)
        lr_parts.append(ones * lr_fn(keys))
        tr_parts.append(ones * tr)
        t_parts.append(ones * (s["t"] + tr))
        t_new.append(s["t"] + tr)
    lr_f = jnp.concatenate(lr_parts)
    tr_f = jnp.concatenate(tr_parts)
    t_f = jnp.concatenate(t_parts)

    m = tr_f * (BETA1 * m_f + (1 - BETA1) * g_f) + (1 - tr_f) * m_f
    v = tr_f * (BETA2 * v_f + (1 - BETA2) * g_f ** 2) + (1 - tr_f) * v_f
    t_safe = jnp.maximum(t_f, 1.0)
    m_hat = m / (1 - BETA1 ** t_safe)
    v_hat = v / (1 - BETA2 ** t_safe)
    new_p_f = p_f - tr_f * lr_f * m_hat / (jnp.sqrt(v_hat) + EPS)

    def unflat(vec):
        out, off = [], 0
        for size, shape in zip(sizes, shapes):
            out.append(jax.lax.slice(vec, (off,), (off + size,)).reshape(shape))
            off += size
        return out

    new_params = jax.tree_util.tree_unflatten(treedef, unflat(new_p_f))
    new_state = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(state, is_leaf=is_state_leaf),
        [
            {"m": mi, "v": vi, "t": ti}
            for mi, vi, ti in zip(unflat(m), unflat(v), t_new)
        ],
    )
    return new_params, new_state


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
