"""The gather-free strip sampler (ops/strip_sample.py) and its renderer
integration (warp_sampler='strip').

Run on CPU in Pallas interpret mode. Test images are exactly one strip
(64 x 256), so strip escapes are impossible and the strip path must match
the gather path everywhere up to the bf16 image quantization the kernel
uses (the gather oracle samples in f32).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neuraludf_tpu.ops.strip_sample import (
    prepare_images, strip_sample, strip_sample_reference,
)
from neuraludf_tpu.render.renderer import RenderOptions, UDFRenderer

from test_projector_losses import make_cameras
from test_renderer_parity import build_pair, make_rays

H, W = 64, 256  # one strip exactly


def _clustered_positions(key, v=2, nw=6, p=128):
    kc, ko = jax.random.split(key)
    cx = jax.random.uniform(kc, (v, nw, 1), minval=30.0, maxval=W - 30.0)
    cy = jax.random.uniform(jax.random.fold_in(kc, 1), (v, nw, 1),
                            minval=10.0, maxval=H - 10.0)
    ox = jax.random.uniform(ko, (v, nw, p), minval=-25.0, maxval=25.0)
    oy = jax.random.uniform(jax.random.fold_in(ko, 1), (v, nw, p),
                            minval=-9.0, maxval=9.0)
    return cx + ox, cy + oy


@pytest.mark.slow
def test_strip_sample_matches_gather_oracle():
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (2, 3, H, W), jnp.float32)
    imgs4 = prepare_images(imgs)
    gx, gy = _clustered_positions(jax.random.fold_in(key, 1))

    ref, in_img = strip_sample_reference(imgs4, gx, gy)
    for fused in (False, True):
        out, in_strip = strip_sample(imgs4, gx, gy, interpret=True,
                                     fused_dot=fused)
        np.testing.assert_array_equal(np.asarray(in_strip), np.asarray(in_img))
        m = np.broadcast_to(np.asarray(in_strip)[:, :, None, :], out.shape)
        d = np.abs(np.asarray(out) - np.asarray(ref))[m]
        assert d.max() < 5e-3, (fused, d.max())  # bf16 quantization bound


def test_strip_placement_large_image():
    """Origin placement on an image many strips wide/tall: clusters within
    the documented extent (<=126 px wide, <=46 px tall) must land fully
    inside their strip at ANY position, and values must match the oracle.
    Guards the round-to-nearest origin rule (floor biased clusters off the
    strip's right/bottom edge ~half the time)."""
    bigH, bigW = 512, 1024
    key = jax.random.PRNGKey(21)
    imgs4 = prepare_images(jax.random.uniform(key, (2, 3, bigH, bigW), jnp.float32))
    kc, ko = jax.random.split(jax.random.fold_in(key, 1))
    v, nw, p = 2, 32, 128
    # centers anywhere the full cluster stays in-image (incl. near borders)
    cx = jax.random.uniform(kc, (v, nw, 1), minval=63.0, maxval=bigW - 64.0)
    cy = jax.random.uniform(jax.random.fold_in(kc, 1), (v, nw, 1),
                            minval=23.0, maxval=bigH - 24.0)
    gx = cx + jax.random.uniform(ko, (v, nw, p), minval=-63.0, maxval=63.0)
    gy = cy + jax.random.uniform(jax.random.fold_in(ko, 1), (v, nw, p),
                                 minval=-23.0, maxval=23.0)
    ref, _ = strip_sample_reference(imgs4, gx, gy)
    out, in_strip = strip_sample(imgs4, gx, gy, interpret=True)
    assert bool(np.asarray(in_strip).all()), (
        f"cluster escaped its strip: cover={np.asarray(in_strip).mean():.4f}"
    )
    assert np.abs(np.asarray(out) - np.asarray(ref)).max() < 5e-3


def test_strip_placement_zero_width_cluster_far_right():
    """A degenerate (zero-extent) cluster far from x=0 must never escape —
    the floor rule lost these when cx-x0 crossed 255."""
    bigH, bigW = 256, 2048
    imgs4 = prepare_images(
        jax.random.uniform(jax.random.PRNGKey(3), (1, 3, bigH, bigW), jnp.float32))
    xs = jnp.linspace(1.0, bigW - 2.0, 64).reshape(1, 64, 1)
    ys = jnp.full((1, 64, 1), 100.0)
    _, in_strip = strip_sample(imgs4, jnp.repeat(xs, 8, -1),
                               jnp.repeat(ys, 8, -1), interpret=True)
    assert bool(np.asarray(in_strip).all())


def test_strip_sample_out_of_image_masked():
    key = jax.random.PRNGKey(2)
    imgs4 = prepare_images(jax.random.uniform(key, (1, 3, H, W), jnp.float32))
    gx = jnp.array([[[-5.0, 10.0, W + 3.0, 128.0]]])
    gy = jnp.array([[[12.0, -1.0, 30.0, H + 2.0]]])
    out, in_strip = strip_sample(imgs4, gx, gy, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(in_strip)[0, 0], [False, False, False, False]
    )
    assert np.isfinite(np.asarray(out)).all()


def _strip_renderer(j_rend, **kw):
    rcfg = dataclasses.replace(j_rend.cfg.udf_renderer, warp_sampler="strip", **kw)
    return UDFRenderer(dataclasses.replace(j_rend.cfg, udf_renderer=rcfg))


@pytest.mark.parametrize("n_outside", [0, 4])
def test_render_strip_matches_gather_path(n_outside):
    """With blend_top_k == all fg samples, the strip path must equal the
    gather path (same masks, same composite) up to bf16 sampling error."""
    _, j_rend, params = build_pair(
        upsampling_type="classical", n_outside=n_outside, h_patch_size=2
    )
    n_fg = j_rend.n_fg_samples()  # 26
    rays_o, rays_d, near, far = make_rays(batch=4, seed=7)
    imgs, intrinsics, c2ws = make_cameras(n_views=3, H=H, W=W, seed=8)
    w2cs = np.linalg.inv(c2ws)
    ref_c2w = np.eye(4, dtype=np.float32)
    ref_c2w[:3, 3] = [0, 0, -2.0]
    rng = np.random.RandomState(9)
    rays_uv = rng.uniform(-0.5, 0.5, (4, 2)).astype(np.float32)
    blending = {
        "color_maps": jnp.asarray(imgs),
        "w2cs": jnp.asarray(w2cs),
        "intrinsics": jnp.asarray(intrinsics),
        "query_c2w": jnp.asarray(ref_c2w),
        "rays_uv": jnp.asarray(rays_uv),
        "img_index": None,
    }
    opts = RenderOptions(
        perturb=False, compute_random_sparse=False,
        pixel_blending=True, patch_blending=True,
    )
    kwargs = dict(
        key=jax.random.PRNGKey(0), cos_anneal_ratio=0.9, flip_saturation=1.0,
        blending=blending, opts=opts,
    )
    ret_g = j_rend.render(
        params, jnp.asarray(rays_o), jnp.asarray(rays_d),
        jnp.asarray(near), jnp.asarray(far), **kwargs
    )
    s_rend = _strip_renderer(j_rend, blend_top_k=n_fg, blend_chunk=13)
    ret_s = s_rend.render(
        params, jnp.asarray(rays_o), jnp.asarray(rays_d),
        jnp.asarray(near), jnp.asarray(far), **kwargs
    )
    assert float(ret_s["blend_strip_cover"]) == 1.0
    for k in ["color", "color_pixel", "patch_colors", "patch_mask", "weight_sum"]:
        np.testing.assert_allclose(
            np.asarray(ret_s[k]), np.asarray(ret_g[k]),
            rtol=5e-3, atol=5e-3, err_msg=k,
        )


@pytest.mark.slow
def test_render_strip_gradients_match_gather_path():
    """Gradients (through blending logits + compositing weights) must agree
    between samplers — sampling is forward-only in both."""
    _, j_rend, params = build_pair(
        upsampling_type="classical", n_outside=0, h_patch_size=2
    )
    n_fg = j_rend.n_fg_samples()
    rays_o, rays_d, near, far = make_rays(batch=3, seed=3)
    imgs, intrinsics, c2ws = make_cameras(n_views=3, H=H, W=W, seed=4)
    blending = {
        "color_maps": jnp.asarray(imgs),
        "w2cs": jnp.asarray(np.linalg.inv(c2ws)),
        "intrinsics": jnp.asarray(intrinsics),
        "query_c2w": jnp.asarray(np.eye(4, dtype=np.float32)),
        "rays_uv": jnp.asarray(
            np.random.RandomState(5).uniform(-0.5, 0.5, (3, 2)).astype(np.float32)
        ),
        "img_index": None,
    }
    opts = RenderOptions(
        perturb=False, compute_random_sparse=False,
        pixel_blending=True, patch_blending=True,
    )
    s_rend = _strip_renderer(j_rend, blend_top_k=n_fg, blend_chunk=13)

    def make_loss(rend):
        def loss(p):
            ret = rend.render(
                p, jnp.asarray(rays_o), jnp.asarray(rays_d),
                jnp.asarray(near), jnp.asarray(far),
                key=jax.random.PRNGKey(0), cos_anneal_ratio=0.9,
                flip_saturation=1.0, blending=blending, opts=opts,
            )
            return (
                jnp.mean(ret["patch_colors"] ** 2)
                + jnp.mean(ret["color_pixel"] ** 2)
            )
        return loss

    g_gather = jax.grad(make_loss(j_rend))(params)
    g_strip = jax.grad(make_loss(s_rend))(params)
    leaves_g, _ = jax.tree_util.tree_flatten(g_gather)
    leaves_s, _ = jax.tree_util.tree_flatten(g_strip)
    norm_g = float(sum(jnp.sum(x * x) for x in leaves_g)) ** 0.5
    assert norm_g > 0.0
    num = float(sum(jnp.sum((a - b) ** 2) for a, b in zip(leaves_g, leaves_s))) ** 0.5
    assert num / norm_g < 0.05, num / norm_g


@pytest.mark.slow
def test_render_strip_topk_truncation_close():
    """With a small top-k the composite should still be close to the dense
    path: the dropped samples carry little transmittance weight."""
    _, j_rend, params = build_pair(
        upsampling_type="classical", n_outside=0, h_patch_size=2
    )
    rays_o, rays_d, near, far = make_rays(batch=4, seed=11)
    imgs, intrinsics, c2ws = make_cameras(n_views=3, H=H, W=W, seed=12)
    blending = {
        "color_maps": jnp.asarray(imgs),
        "w2cs": jnp.asarray(np.linalg.inv(c2ws)),
        "intrinsics": jnp.asarray(intrinsics),
        "query_c2w": jnp.asarray(np.eye(4, dtype=np.float32)),
        "rays_uv": jnp.asarray(
            np.random.RandomState(13).uniform(-0.5, 0.5, (4, 2)).astype(np.float32)
        ),
        "img_index": None,
    }
    opts = RenderOptions(
        perturb=False, compute_random_sparse=False,
        pixel_blending=True, patch_blending=True,
    )
    kwargs = dict(
        key=jax.random.PRNGKey(0), cos_anneal_ratio=0.9, flip_saturation=1.0,
        blending=blending, opts=opts,
    )
    ret_g = j_rend.render(
        params, jnp.asarray(rays_o), jnp.asarray(rays_d),
        jnp.asarray(near), jnp.asarray(far), **kwargs
    )
    s_rend = _strip_renderer(j_rend, blend_top_k=16, blend_chunk=8)
    ret_s = s_rend.render(
        params, jnp.asarray(rays_o), jnp.asarray(rays_d),
        jnp.asarray(near), jnp.asarray(far), **kwargs
    )
    # dropped weight mass bounds the composite deviation
    w = np.sort(np.asarray(ret_g["weights"]), axis=-1)
    dropped = w[:, :-16].sum(axis=-1).max()
    for k in ["patch_colors", "color_pixel"]:
        d = np.abs(np.asarray(ret_s[k]) - np.asarray(ret_g[k])).max()
        assert d <= dropped + 5e-3, (k, d, dropped)


def test_strip_sample_nw_segmented(monkeypatch):
    """The SMEM guard splits large-NW calls into several pallas_calls of
    whole wb-groups (full-frame validation reaches NW=16384/view). Shrink
    the budget so a small input takes the segmented path and must agree
    with the single-call result."""
    import neuraludf_tpu.ops.strip_sample as ss

    key = jax.random.PRNGKey(4)
    imgs4 = prepare_images(jax.random.uniform(key, (2, 3, H, W), jnp.float32))
    gx, gy = _clustered_positions(jax.random.fold_in(key, 1), v=2, nw=12, p=128)

    whole, in_a = strip_sample(imgs4, gx, gy, wb=4, interpret=True)
    # budget of one wb-group of origins per view: 2 views * 4 strips * 4 B
    monkeypatch.setattr(ss, "_SMEM_ORIGIN_BUDGET", 2 * 4 * 4)
    seg, in_b = strip_sample(imgs4, gx, gy, wb=4, interpret=True)
    np.testing.assert_array_equal(np.asarray(in_a), np.asarray(in_b))
    np.testing.assert_allclose(np.asarray(whole), np.asarray(seg), atol=1e-6)
