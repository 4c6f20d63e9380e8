"""RendererConfig.sparse_depth_gate (TPU-repo extension, see config.py):
with gate > 0, ray samples at the rendered depth on confident-surface rays
are excluded from the sparse penalty; every other render output must be
bit-identical to the ungated render (the gate multiplies only the sparse
term and all gate inputs are stop-gradient).

Reference behavior (gate = 0.0) is the plain udf_renderer_blending.py
:597-599 sum over every sample — covered by the golden parity tests."""

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from neuraludf_tpu.render.renderer import RenderOptions, UDFRenderer

from test_renderer_parity import build_pair, make_rays


def _render(rend, params, seed=3):
    rays_o, rays_d, near, far = make_rays(batch=6, seed=seed)
    return rend.render(
        params, jnp.asarray(rays_o), jnp.asarray(rays_d),
        jnp.asarray(near), jnp.asarray(far),
        key=jax.random.PRNGKey(0), cos_anneal_ratio=0.9,
        opts=RenderOptions(perturb=False, compute_random_sparse=False),
    )


def test_gate_zeroes_only_the_sparse_term():
    _, j_rend, params = build_pair()
    mcfg = j_rend.cfg
    gated = UDFRenderer(dataclasses.replace(
        mcfg, udf_renderer=dataclasses.replace(
            mcfg.udf_renderer, sparse_depth_gate=0.05)))

    ret0 = _render(j_rend, params)
    ret1 = _render(gated, params)

    # the gate must touch NOTHING but sparse_error
    for k in ("color", "depth", "weights", "udf", "gradient_error",
              "weight_sum", "s_val"):
        np.testing.assert_array_equal(
            np.asarray(ret0[k]), np.asarray(ret1[k]), err_msg=k)

    s0 = float(ret0["sparse_error"])
    s1 = float(ret1["sparse_error"])
    assert s1 <= s0 + 1e-12  # gating only removes non-negative terms

    # premise: the geometric-init sphere makes these rays confident
    # surface hits with near-zero udf at the rendered depth, so the gate
    # must actually bind (strictly smaller sparse loss). If this ever
    # becomes vacuous the test should fail, not silently pass.
    wsum = np.asarray(ret0["weight_sum"])[:, 0]
    assert (wsum > 0.5).any(), "premise lost: no confident surface ray"
    assert s1 < s0 * 0.999, (s0, s1)


def test_gate_respects_confidence_threshold():
    # with an enormous gate, low-confidence rays (weight_sum <= 0.5) must
    # keep their full sparse contribution: gate the whole ray span and
    # check the gated sparse equals the ungated sparse restricted to
    # confident rays' terms being dropped — i.e. it stays positive as long
    # as any unconfident ray has near-surface samples.
    _, j_rend, params = build_pair()
    mcfg = j_rend.cfg
    gated = UDFRenderer(dataclasses.replace(
        mcfg, udf_renderer=dataclasses.replace(
            mcfg.udf_renderer, sparse_depth_gate=1e9)))
    ret0 = _render(j_rend, params)
    ret1 = _render(gated, params)
    wsum = np.asarray(ret0["weight_sum"])[:, 0]
    sparse_rows = np.exp(
        -mcfg.udf_renderer.sparse_scale_factor
        * np.maximum(np.asarray(ret0["udf"]), 0.0)).sum(axis=1)
    expect = sparse_rows[wsum <= 0.5].sum() / len(wsum)
    np.testing.assert_allclose(float(ret1["sparse_error"]), expect,
                               rtol=1e-5, atol=1e-7)
