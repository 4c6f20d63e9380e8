"""Rematerialization switches (config.UDFRendererConfig.remat): recomputing
the color-net / background-NeRF activations in backward must be bit-exact
with the spill path — remat changes scheduling, never math."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

import __graft_entry__ as g
from neuraludf_tpu.render.renderer import UDFRenderer
from neuraludf_tpu.train.optim import init_adam_state
from neuraludf_tpu.train.runner import init_params
from neuraludf_tpu.train.schedules import compute_step_schedules
from neuraludf_tpu.train.step import build_step_body


def test_remat_step_identical():
    cfg = g._tiny_config(batch_size=16)
    scene, pairs = g._synthetic_scene_arrays(jax.random.PRNGKey(0))
    s = compute_step_schedules(
        5, cfg.train, 0.01, 1.0, 0.0, 0.0,
        is_finetune=False, reg_weights_schedule=False, same_lr=False,
        beta_trainable=True, variance_trainable=True,
    )
    results = {}
    for remat in ("none", "color+bg"):
        c = dataclasses.replace(cfg, model=dataclasses.replace(
            cfg.model, udf_renderer=dataclasses.replace(
                cfg.model.udf_renderer, remat=remat)))
        body = build_step_body(c, UDFRenderer(c.model), blending=False)
        p = init_params(jax.random.PRNGKey(0), c)
        o = init_adam_state(p)
        p2, _, m = jax.jit(body)(
            p, o, scene, pairs, jnp.asarray(0), jax.random.PRNGKey(2),
            dict(s.__dict__),
        )
        results[remat] = (p2, float(m["loss"]))
    assert results["none"][1] == results["color+bg"][1]
    for a, b in zip(jax.tree_util.tree_leaves(results["none"][0]),
                    jax.tree_util.tree_leaves(results["color+bg"][0])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)
