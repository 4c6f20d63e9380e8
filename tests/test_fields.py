"""Golden parity tests: our JAX fields vs the reference torch networks with
identical parameters (converted from torch state_dicts)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from neuraludf_tpu.config import (
    NeRFConfig,
    RenderingNetworkConfig,
    UDFNetworkConfig,
)
from neuraludf_tpu.nets import fields
from neuraludf_tpu.nets.embedder import embed_dim, positional_encoding

from reference_torch import (
    import_reference,
    nerf_state_to_jax,
    residual_color_state_to_jax,
    to_np,
    udf_state_to_jax,
)

ref_fields, _, _ = import_reference()

torch.manual_seed(0)
RTOL, ATOL = 1e-5, 1e-5


def test_embedder_matches_reference():
    from models.embedder import get_embedder

    x = np.random.RandomState(0).randn(17, 3).astype(np.float32)
    for multires in [1, 4, 6, 10]:
        emb_fn, out_dim = get_embedder(multires, input_dims=3)
        ref = emb_fn(torch.from_numpy(x)).numpy()
        ours = np.asarray(positional_encoding(jnp.asarray(x), multires))
        assert out_dim == embed_dim(multires, 3)
        np.testing.assert_allclose(ours, ref, rtol=RTOL, atol=ATOL)


@pytest.mark.parametrize("udf_type", ["abs", "square"])
def test_udf_network_forward_parity(udf_type):
    cfg = UDFNetworkConfig(udf_type=udf_type)
    net = ref_fields.UDFNetwork(
        d_in=3, d_out=257, d_hidden=256, n_layers=8, skip_in=(4,), multires=6,
        bias=0.5, scale=1.0, geometric_init=True, weight_norm=True, udf_type=udf_type,
    )
    params = udf_state_to_jax(net)
    x = np.random.RandomState(1).uniform(-1, 1, (33, 3)).astype(np.float32)
    ref = to_np(net(torch.from_numpy(x)))
    ours = np.asarray(fields.distance_field_apply(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_udf_gradient_parity():
    cfg = UDFNetworkConfig()
    net = ref_fields.UDFNetwork(
        d_in=3, d_out=257, d_hidden=256, n_layers=8, skip_in=(4,), multires=6,
        bias=0.5, scale=1.0, geometric_init=True, weight_norm=True, udf_type="abs",
    )
    params = udf_state_to_jax(net)
    x = np.random.RandomState(2).uniform(-1, 1, (21, 3)).astype(np.float32)
    ref = to_np(net.gradient(torch.from_numpy(x)))[:, 0, :]
    ours = np.asarray(fields.distance_gradient(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_geometric_init_is_spherical():
    """Sphere init: udf(x) ≈ | |x| - bias | near init (SAL geometric init)."""
    cfg = UDFNetworkConfig()
    params = fields.init_distance_field(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(3)
    x = rng.uniform(-1, 1, (256, 3)).astype(np.float32)
    udf = np.asarray(fields.distance_value(params, jnp.asarray(x), cfg))[:, 0]
    target = np.abs(np.linalg.norm(x, axis=-1) - cfg.bias)
    # loose tolerance: the geometric init approximates the sphere SDF
    # loose threshold: the torch reference init scores ~0.87 on the same probe
    corr = np.corrcoef(udf, target)[0, 1]
    assert corr > 0.85, f"geometric init not spherical (corr={corr})"


def test_residual_color_parity():
    cfg = RenderingNetworkConfig()
    net = ref_fields.ResidualRenderingNetwork(
        d_feature=256, mode="no_normal", d_in=6, d_out=3, d_hidden=128,
        n_layers=4, weight_norm=True, multires_view=4, squeeze_out=True,
        blending_cand_views=10,
    )
    params = residual_color_state_to_jax(net)
    rng = np.random.RandomState(4)
    pts = rng.uniform(-1, 1, (29, 3)).astype(np.float32)
    normals = rng.randn(29, 3).astype(np.float32)
    dirs = rng.randn(29, 3).astype(np.float32)
    feats = rng.randn(29, 256).astype(np.float32)
    ref_base, ref_color, ref_blend = net(
        torch.from_numpy(pts), torch.from_numpy(normals),
        torch.from_numpy(dirs), torch.from_numpy(feats),
    )
    base, color, blend = fields.residual_color_apply(
        params, jnp.asarray(pts), jnp.asarray(normals), jnp.asarray(dirs),
        jnp.asarray(feats), cfg,
    )
    np.testing.assert_allclose(np.asarray(base), to_np(ref_base), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(color), to_np(ref_color), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(blend), to_np(ref_blend), rtol=1e-4, atol=1e-5)


def test_background_nerf_parity():
    cfg = NeRFConfig()
    net = ref_fields.NeRF(
        D=8, d_in=4, d_in_view=3, W=256, multires=10, multires_view=4,
        output_ch=4, skips=[4], use_viewdirs=True,
    )
    params = nerf_state_to_jax(net)
    rng = np.random.RandomState(5)
    pts = rng.uniform(-1, 1, (19, 4)).astype(np.float32)
    views = rng.randn(19, 3).astype(np.float32)
    ref_alpha, ref_rgb = net(torch.from_numpy(pts), torch.from_numpy(views))
    alpha, rgb = fields.background_nerf_apply(params, jnp.asarray(pts), jnp.asarray(views), cfg)
    np.testing.assert_allclose(np.asarray(alpha), to_np(ref_alpha), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rgb), to_np(ref_rgb), rtol=1e-4, atol=1e-5)


def test_scalar_nets():
    from neuraludf_tpu.config import BetaNetworkConfig, VarianceConfig

    var = fields.init_variance(VarianceConfig(init_val=0.3))
    np.testing.assert_allclose(np.asarray(fields.variance_inv_s(var)), np.exp(3.0), rtol=1e-6)
    beta = fields.init_beta(BetaNetworkConfig())
    np.testing.assert_allclose(np.asarray(fields.beta_value(beta)), np.exp(5.0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(fields.gamma_value(beta)), np.exp(3.0), rtol=1e-6)


def test_color_blend_parity():
    B, S, V, NPX = 4, 6, 8, 9
    rng = np.random.RandomState(6)
    logits = rng.randn(B, S, 10).astype(np.float32)
    pix_color = rng.rand(B, S, V, 3).astype(np.float32)
    pix_mask = (rng.rand(B, S, V) > 0.3).astype(np.float32)
    patch_color = rng.rand(B, S, V, NPX, 3).astype(np.float32)
    patch_mask = (rng.rand(B, S, V, NPX) > 0.1).astype(np.float32)

    ref_pix, ref_pixm, ref_patch, ref_patchm = ref_fields.color_blend(
        torch.from_numpy(logits), None,
        pts_pixel_color=torch.from_numpy(pix_color),
        pts_pixel_mask=torch.from_numpy(pix_mask),
        pts_patch_color=torch.from_numpy(patch_color[None].squeeze(0)),
        pts_patch_mask=torch.from_numpy(patch_mask),
    )
    pix, pixm, patch, patchm = fields.color_blend(
        jnp.asarray(logits), None,
        pts_pixel_color=jnp.asarray(pix_color),
        pts_pixel_mask=jnp.asarray(pix_mask),
        # ours takes/returns the channel-packed patch layout (patch axis
        # minor — TPU tiling, see PatchProjector.patch_warp)
        pts_patch_color=jnp.asarray(patch_color).transpose(0, 1, 2, 4, 3),
        pts_patch_mask=jnp.asarray(patch_mask),
    )
    patch = jnp.moveaxis(patch, -2, -1)  # [B, S, 3, Npx] -> [B, S, Npx, 3]
    np.testing.assert_allclose(np.asarray(pix), to_np(ref_pix), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(patch), to_np(ref_patch), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pixm), to_np(ref_pixm))
    np.testing.assert_allclose(np.asarray(patchm), to_np(ref_patchm))


def test_sdf_network_parity():
    """The NeuS-compatible SDF variant (ref: models/fields.py:10-112)."""
    cfg = UDFNetworkConfig(udf_type="sdf", inside_outside=True, d_out=65,
                           d_hidden=64, n_layers=4, skip_in=(2,), multires=6, bias=0.5)
    net = ref_fields.SDFNetwork(
        d_in=3, d_out=65, d_hidden=64, n_layers=4, skip_in=(2,), multires=6,
        bias=0.5, scale=1.0, geometric_init=True, weight_norm=True, inside_outside=True,
    )
    params = udf_state_to_jax(net)
    x = np.random.RandomState(7).uniform(-1, 1, (25, 3)).astype(np.float32)
    ref = to_np(net(torch.from_numpy(x)))
    ours = np.asarray(fields.distance_field_apply(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
    ref_g = to_np(net.gradient(torch.from_numpy(x)))[:, 0]
    ours_g = np.asarray(fields.distance_gradient(params, jnp.asarray(x), cfg))
    np.testing.assert_allclose(ours_g, ref_g, rtol=1e-3, atol=1e-4)


def test_sdf_inside_outside_init_sign():
    """inside_outside geometric init gives negative-outward signed field."""
    cfg = UDFNetworkConfig(udf_type="sdf", inside_outside=True)
    params = fields.init_distance_field(jax.random.PRNGKey(1), cfg)
    x = np.random.RandomState(8).uniform(-1, 1, (128, 3)).astype(np.float32)
    sdf = np.asarray(fields.distance_value(params, jnp.asarray(x), cfg))[:, 0]
    r = np.linalg.norm(x, axis=-1)
    corr = np.corrcoef(sdf, -(r - cfg.bias))[0, 1]
    assert corr > 0.85, corr
