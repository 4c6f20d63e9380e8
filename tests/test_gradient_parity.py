"""Full-graph gradient parity: d(loss)/d(params) via torch autograd on the
reference renderer vs JAX AD on ours — the composition test that single
forward-pass parity can't cover (including the eikonal double backprop)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from reference_torch import to_np
from test_renderer_parity import build_pair, make_rays


pytestmark = pytest.mark.slow  # full-suite acceptance lane


def loss_from_render(ret, true_rgb, *, torch_mode):
    """The reference loss assembly (ref: exp_runner_blending.py:330-371)
    with stage-1 weights: color L1 (mean) + 0.1*eikonal + 0.001*sparse."""
    if torch_mode:
        color_l = torch.abs(ret["color"] - true_rgb).mean()
        return color_l + 0.1 * ret["gradient_error"] + 0.001 * ret["sparse_error"]
    color_l = jnp.abs(ret["color"] - true_rgb).mean()
    return color_l + 0.1 * ret["gradient_error"] + 0.001 * ret["sparse_error"]


def test_gradient_parity():
    t_rend, j_rend, params = build_pair(upsampling_type="classical", n_outside=4)
    rays_o, rays_d, near, far = make_rays(batch=5, seed=11)
    rng = np.random.RandomState(12)
    true_rgb = rng.rand(5, 3).astype(np.float32)

    # ---- torch side
    ret_t = t_rend.render(
        torch.from_numpy(rays_o), torch.from_numpy(rays_d),
        torch.from_numpy(near), torch.from_numpy(far),
        cos_anneal_ratio=0.6, perturb_overwrite=0, flip_saturation=0.7,
    )
    loss_t = loss_from_render(ret_t, torch.from_numpy(true_rgb), torch_mode=True)
    loss_t.backward()

    # ---- jax side
    from neuraludf_tpu.render.renderer import RenderOptions

    def loss_fn(p):
        ret = j_rend.render(
            p, jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(near), jnp.asarray(far),
            key=jax.random.PRNGKey(0), cos_anneal_ratio=0.6, flip_saturation=0.7,
            opts=RenderOptions(perturb=False, compute_random_sparse=False),
        )
        return loss_from_render(ret, jnp.asarray(true_rgb), torch_mode=False)

    loss_j, grads = jax.value_and_grad(loss_fn)(params)
    np.testing.assert_allclose(float(loss_j), float(loss_t.detach()), rtol=2e-3)

    # compare per-parameter gradients on the torch modules we track
    t_udf = t_rend.udf_network
    checks = []
    for l in range(t_udf.num_layers - 1):
        lin = getattr(t_udf, f"lin{l}")
        checks.append((f"udf.lin{l}.v", lin.weight_v.grad.numpy().T, grads["udf"][f"lin{l}"]["v"]))
        checks.append((f"udf.lin{l}.g", lin.weight_g.grad.numpy()[:, 0], grads["udf"][f"lin{l}"]["g"]))
        checks.append((f"udf.lin{l}.b", lin.bias.grad.numpy(), grads["udf"][f"lin{l}"]["b"]))
    t_var = t_rend.deviation_network
    checks.append(("variance", t_var.variance.grad.numpy(), grads["variance"]["variance"]))
    t_beta = t_rend.beta_network
    checks.append(("beta", t_beta.beta.grad.numpy(), grads["beta"]["beta"]))
    t_color = t_rend.color_network
    lin0 = getattr(t_color, "lin_base0")
    checks.append(("color.base0.v", lin0.weight_v.grad.numpy().T, grads["color"]["base"]["lin0"]["v"]))
    t_nerf = t_rend.nerf
    checks.append(("nerf.pts0.w", t_nerf.pts_linears[0].weight.grad.numpy().T, grads["nerf"]["pts"]["lin0"]["w"]))

    for name, ref_g, our_g in checks:
        our_g = np.asarray(our_g)
        assert our_g.shape == ref_g.shape, name
        scale = np.abs(ref_g).max() + 1e-8
        np.testing.assert_allclose(
            our_g / scale, ref_g / scale, rtol=5e-2, atol=5e-3,
            err_msg=f"gradient mismatch: {name}",
        )
