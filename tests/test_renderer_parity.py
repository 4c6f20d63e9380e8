"""End-to-end golden parity: our JAX renderer vs the reference torch
UDFRendererBlending with identical parameters and inputs (deterministic
sampling, perturb disabled)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from neuraludf_tpu.config import (
    BetaNetworkConfig,
    ModelConfig,
    NeRFConfig,
    RendererConfig,
    RenderingNetworkConfig,
    UDFNetworkConfig,
    VarianceConfig,
)
from neuraludf_tpu.render.renderer import RenderOptions, UDFRenderer

from reference_torch import (
    import_reference,
    nerf_state_to_jax,
    residual_color_state_to_jax,
    to_np,
    udf_state_to_jax,
)

ref_fields, ref_renderer_mod, _ = import_reference()

torch.manual_seed(0)

# small-but-real configuration (full depth matters for skip connections)
UDF_KW = dict(d_in=3, d_out=65, d_hidden=64, n_layers=4, skip_in=(2,), multires=6,
              bias=0.5, scale=1.0, geometric_init=True, weight_norm=True)
COLOR_KW = dict(d_feature=64, mode="no_normal", d_in=6, d_out=3, d_hidden=32,
                n_layers=2, weight_norm=True, multires_view=4, squeeze_out=True,
                blending_cand_views=10)
NERF_KW = dict(D=2, d_in=4, d_in_view=3, W=32, multires=4, multires_view=2,
               output_ch=4, skips=[0], use_viewdirs=True)


def build_pair(upsampling_type="classical", n_outside=4, sdf2alpha_type="numerical",
               use_norm_grad=False, h_patch_size=3):
    """Build (torch renderer, jax renderer, jax params) with shared weights."""
    torch.manual_seed(0)  # independent of test execution order
    t_udf = ref_fields.UDFNetwork(udf_type="abs", **UDF_KW)
    t_color = ref_fields.ResidualRenderingNetwork(**COLOR_KW)
    t_nerf = ref_fields.NeRF(**NERF_KW)
    t_var = ref_fields.SingleVarianceNetwork(init_val=0.3)
    t_beta = ref_fields.BetaNetwork()

    t_rend = ref_renderer_mod.UDFRendererBlending(
        t_nerf, t_udf, t_var, t_color, t_beta,
        n_samples=16, n_importance=10, n_outside=n_outside, up_sample_steps=5,
        perturb=1.0, sdf2alpha_type=sdf2alpha_type, upsampling_type=upsampling_type,
        sparse_scale_factor=25000, h_patch_size=h_patch_size,
        use_norm_grad_for_cosine=use_norm_grad,
    )

    mcfg = ModelConfig(
        nerf=NeRFConfig(D=2, W=32, multires=4, multires_view=2, skips=(0,)),
        udf_network=UDFNetworkConfig(d_out=65, d_hidden=64, n_layers=4, skip_in=(2,), multires=6),
        variance_network=VarianceConfig(init_val=0.3),
        rendering_network=RenderingNetworkConfig(
            d_feature=64, d_hidden=32, n_layers=2, multires_view=4
        ),
        beta_network=BetaNetworkConfig(),
        udf_renderer=RendererConfig(
            n_samples=16, n_importance=10, n_outside=n_outside, up_sample_steps=5,
            sdf2alpha_type=sdf2alpha_type, upsampling_type=upsampling_type,
            h_patch_size=h_patch_size, use_norm_grad_for_cosine=use_norm_grad,
        ),
    )
    params = {
        "udf": udf_state_to_jax(t_udf),
        "color": residual_color_state_to_jax(t_color),
        "nerf": nerf_state_to_jax(t_nerf),
        "variance": {"variance": jnp.asarray(t_var.variance.detach().numpy())},
        "beta": {k: jnp.asarray(getattr(t_beta, k).detach().numpy()) for k in ("beta", "gamma", "zeta")},
    }
    return t_rend, UDFRenderer(mcfg), params


def make_rays(batch=6, seed=0):
    rng = np.random.RandomState(seed)
    rays_o = np.array([[0.0, 0.0, -1.5]], np.float32).repeat(batch, 0)
    rays_o += rng.uniform(-0.1, 0.1, (batch, 3)).astype(np.float32)
    d = np.array([[0.0, 0.0, 1.0]], np.float32) + rng.uniform(-0.2, 0.2, (batch, 3)).astype(np.float32)
    rays_d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    # near/far from unit sphere (ref: dataset.py:329-335)
    a = np.sum(rays_d ** 2, -1, keepdims=True)
    b = 2.0 * np.sum(rays_o * rays_d, -1, keepdims=True)
    mid = 0.5 * (-b) / a
    return rays_o.astype(np.float32), rays_d.astype(np.float32), (mid - 1.0).astype(np.float32), (mid + 1.0).astype(np.float32)


KEYS = [
    "color_base", "color", "weight_sum", "weight_sum_fg_bg", "depth",
    "gradient_error", "gradient_error_near_surface", "sparse_error",
    "normals", "udf", "alpha", "alpha_plus", "alpha_minus", "vis_prob",
    "z_vals", "mid_z_vals", "true_cos", "alpha_occ",
]


@pytest.mark.parametrize(
    "upsampling_type,n_outside,sdf2alpha_type,use_norm_grad",
    [
        ("classical", 4, "numerical", False),   # DTU mode
        ("mix", 0, "numerical", True),          # garment mode
        ("classical", 0, "theorical", False),
    ],
)
@pytest.mark.slow
def test_render_parity(upsampling_type, n_outside, sdf2alpha_type, use_norm_grad):
    t_rend, j_rend, params = build_pair(upsampling_type, n_outside, sdf2alpha_type, use_norm_grad)
    rays_o, rays_d, near, far = make_rays()

    ret_t = t_rend.render(
        torch.from_numpy(rays_o), torch.from_numpy(rays_d),
        torch.from_numpy(near), torch.from_numpy(far),
        cos_anneal_ratio=0.7, perturb_overwrite=0, flip_saturation=0.8,
    )
    ret_j = j_rend.render(
        params, jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(near), jnp.asarray(far),
        key=jax.random.PRNGKey(0), cos_anneal_ratio=0.7, flip_saturation=0.8,
        opts=RenderOptions(perturb=False, compute_random_sparse=False),
    )
    for k in KEYS:
        ref_v, our_v = to_np(ret_t[k]), np.asarray(ret_j[k])
        if k in ("weight_sum", "weight_sum_fg_bg") and upsampling_type == "mix":
            # reference over-slices by the mix-mode rounding discrepancy;
            # the slice is a no-op so values still agree
            pass
        assert our_v.shape == ref_v.shape, (k, our_v.shape, ref_v.shape)
        # f32 noise through 5 upsampling rounds occasionally shifts one
        # z-sample onto a sigmoid knife edge: isolated elements deviate up
        # to ~2.5e-3 while the other 99.4% match to ~1e-5
        np.testing.assert_allclose(our_v, ref_v, rtol=4e-3, atol=3e-3, err_msg=k)


@pytest.mark.slow
def test_render_gradients_flow():
    """Nested AD: gradient of (color + eikonal) loss w.r.t. params is finite."""
    _, j_rend, params = build_pair()
    rays_o, rays_d, near, far = make_rays(batch=4)

    def loss_fn(p):
        ret = j_rend.render(
            p, jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(near), jnp.asarray(far),
            key=jax.random.PRNGKey(0), cos_anneal_ratio=0.5, flip_saturation=0.5,
            opts=RenderOptions(perturb=False, compute_random_sparse=False),
        )
        return (
            jnp.mean(jnp.abs(ret["color"])) + ret["gradient_error"] + 0.01 * ret["sparse_error"]
        )

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    # the UDF net must receive gradient through the eikonal double-backprop
    udf_norm = sum(float(jnp.sum(jnp.abs(l))) for l in jax.tree_util.tree_leaves(grads["udf"]))
    assert udf_norm > 0
