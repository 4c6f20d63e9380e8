"""Parity of the full blended render (pixel + patch warps through
render_core) — the finetune-stage path."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from neuraludf_tpu.render.renderer import RenderOptions

from reference_torch import to_np
from test_projector_losses import make_cameras
from test_renderer_parity import build_pair, make_rays


pytestmark = pytest.mark.slow  # full-suite acceptance lane


def test_render_blending_parity():
    t_rend, j_rend, params = build_pair(
        upsampling_type="classical", n_outside=4, h_patch_size=2
    )
    rays_o, rays_d, near, far = make_rays(batch=4, seed=7)
    imgs, intrinsics, c2ws = make_cameras(n_views=3, H=48, W=56, seed=8)
    w2cs = np.linalg.inv(c2ws)
    ref_c2w = np.eye(4, dtype=np.float32)
    ref_c2w[:3, 3] = [0, 0, -2.0]
    rng = np.random.RandomState(9)
    rays_uv = rng.uniform(-0.5, 0.5, (4, 2)).astype(np.float32)

    ret_t = t_rend.render(
        torch.from_numpy(rays_o), torch.from_numpy(rays_d),
        torch.from_numpy(near), torch.from_numpy(far),
        cos_anneal_ratio=0.9, perturb_overwrite=0, flip_saturation=1.0,
        color_maps=torch.from_numpy(imgs),
        w2cs=torch.from_numpy(w2cs),
        intrinsics=torch.from_numpy(intrinsics),
        query_c2w=torch.from_numpy(ref_c2w),
        img_index=None,
        rays_uv=torch.from_numpy(rays_uv.copy()),
    )
    blending = {
        "color_maps": jnp.asarray(imgs),
        "w2cs": jnp.asarray(w2cs),
        "intrinsics": jnp.asarray(intrinsics),
        "query_c2w": jnp.asarray(ref_c2w),
        "rays_uv": jnp.asarray(rays_uv),
        "img_index": None,
    }
    ret_j = j_rend.render(
        params, jnp.asarray(rays_o), jnp.asarray(rays_d), jnp.asarray(near), jnp.asarray(far),
        key=jax.random.PRNGKey(0), cos_anneal_ratio=0.9, flip_saturation=1.0,
        blending=blending,
        opts=RenderOptions(
            perturb=False, compute_random_sparse=False,
            pixel_blending=True, patch_blending=True,
        ),
    )
    for k in ["color", "color_pixel", "patch_colors", "weight_sum", "depth"]:
        ref_v = to_np(ret_t[k])
        our_v = np.asarray(ret_j[k])
        assert our_v.shape == ref_v.shape, (k, our_v.shape, ref_v.shape)
        np.testing.assert_allclose(our_v, ref_v, rtol=2e-3, atol=2e-3, err_msg=k)
    # patch_mask: reference returns weighted float mask [B]
    np.testing.assert_allclose(
        np.asarray(ret_j["patch_mask"]), to_np(ret_t["patch_mask"]), rtol=2e-3, atol=2e-3
    )
