"""Multi-view pixel/patch warping (SparseNeuS/NeuralWarp-style).

TPU-native batched-einsum redesign of the reference projector
(ref: models/patch_projector.py:11-214, models/projector_utils.py:8-85):
per-sample tangent-plane homographies H = K_src (R_rel + t_rel·nᵀ/d) K_ref⁻¹
warp reference-patch pixels into source views; colors come from bilinear
gathers (ops.interp.grid_sample_2d). Everything is one fused einsum chain —
no loops, no data-dependent shapes.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.interp import grid_sample_2d, grid_sample_2d_xy


def build_patch_offset(h_patch_size: int) -> np.ndarray:
    """(2h+1)² integer pixel offsets, x-major pairs (ref: patch_projector.py:212)."""
    off = np.arange(-h_patch_size, h_patch_size + 1)
    gy, gx = np.meshgrid(off, off, indexing="ij")
    return np.stack([gx, gy], axis=-1).reshape(-1, 2).astype(np.float32)


def cam2pixel_abs(pts, proj_rot, proj_tr) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Project world points to ABSOLUTE pixel coordinates for every view.

    pts: [B, S, 3]; proj_rot: [V, 3, 3]; proj_tr: [V, 3, 1].
    Returns (x, y) [V, B, S] in pixels (ref: projector_utils.py:8-48).
    """
    pc = jnp.einsum("vij,bsj->vbsi", proj_rot, pts) + proj_tr[:, None, None, :, 0]
    X, Y, Z = pc[..., 0], pc[..., 1], jnp.maximum(pc[..., 2], 1e-3)
    return X / Z, Y / Z


def cam2pixel_grid(pts, proj_rot, proj_tr, size_wh) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Project world points into normalized pixel grids for every view.

    pts: [B, S, 3]; proj_rot: [V, 3, 3]; proj_tr: [V, 3, 1].
    Returns grid [V, B, S, 2] in [-1, 1] (align_corners=True convention,
    out-of-frame set to 2 for zeros padding) and valid mask [V, B, S]
    (ref: projector_utils.py:8-48).
    """
    W, H = size_wh
    x_abs, y_abs = cam2pixel_abs(pts, proj_rot, proj_tr)
    x_norm = 2.0 * x_abs / (W - 1) - 1.0
    y_norm = 2.0 * y_abs / (H - 1) - 1.0
    valid = (jnp.abs(x_norm) < 1.0) & (jnp.abs(y_norm) < 1.0)
    x_norm = jnp.where(jnp.abs(x_norm) > 1.0, 2.0, x_norm)
    y_norm = jnp.where(jnp.abs(y_norm) > 1.0, 2.0, y_norm)
    return jnp.stack([x_norm, y_norm], axis=-1), valid


class PatchProjector:
    def __init__(self, h_patch_size: int):
        self.h_patch_size = h_patch_size
        self.offsets = jnp.asarray(build_patch_offset(h_patch_size))  # [Npx, 2]
        self.plane_dist_thresh = 0.001

    def pixel_warp_positions(self, pts, intrinsics, w2cs, size_hw):
        """Absolute warp positions for pixel_warp: pts [B, S, 3] →
        (gx, gy) [V, B, S] pixels, valid [V, B, S] (strictly in-frame,
        matching cam2pixel_grid's `< 1.0` bound)."""
        H, W = size_hw
        proj = jnp.einsum("vij,vjk->vik", intrinsics[:, :3, :3], w2cs[:, :3, :])
        gx, gy = cam2pixel_abs(pts, proj[:, :3, :3], proj[:, :3, 3:])
        valid = (gx > 0.0) & (gx < W - 1.0) & (gy > 0.0) & (gy < H - 1.0)
        return gx, gy, valid

    def pixel_warp(self, pts, imgs, intrinsics, w2cs):
        """pts: [B, S, 3]; imgs: [V, 3, H, W]; intrinsics/w2cs: [V, 4, 4].
        Returns colors [B, S, V, 3], mask [B, S, V]
        (ref: patch_projector.py:21-43)."""
        V, _, H, W = imgs.shape
        proj = jnp.einsum("vij,vjk->vik", intrinsics[:, :3, :3], w2cs[:, :3, :])
        grid, valid = cam2pixel_grid(pts, proj[:, :3, :3], proj[:, :3, 3:], (W, H))
        colors = jax.vmap(grid_sample_2d)(imgs, grid)  # [V, B, S, 3]
        return colors.transpose(1, 2, 0, 3), valid.transpose(1, 2, 0)

    def patch_warp_positions(
        self, pts, uv, normals, size_hw, ref_intrinsic, src_intrinsics,
        ref_c2w, src_c2ws, *, detach_normal: bool = False,
    ):
        """Absolute homography-warp positions (ref: patch_projector.py:45-150).

        pts: [B, S, 3]; uv: [B, 2] in (-1, 1); normals: [B, S, 3] world;
        size_hw = (H, W) of the source images. Returns gx, gy [V, B, S, Npx]
        in pixels and mask [V, B, S, Npx] (z>0 and h_patch_size inside the
        frame). Position math is shared by the gather and strip samplers.
        """
        sizeH, sizeW = size_hw
        if detach_normal:
            normals = jax.lax.stop_gradient(normals)
        B, S, _ = pts.shape
        V = src_intrinsics.shape[0]
        npx = self.offsets.shape[0]

        uv_px = jnp.stack(
            [(uv[:, 0] + 1.0) * 0.5 * (sizeW - 1), (uv[:, 1] + 1.0) * 0.5 * (sizeH - 1)],
            axis=-1,
        )

        ref_intr = ref_intrinsic[:3, :3]
        inv_ref_intr = jnp.linalg.inv(ref_intr)
        src_intrs = src_intrinsics[:, :3, :3]

        inv_ref_pose = jnp.linalg.inv(ref_c2w)
        inv_src_poses = jnp.linalg.inv(src_c2ws)

        ref_cam_loc = ref_c2w[:3, 3]
        pts_flat = pts.reshape(-1, 3)  # [N, 3], N = B*S
        normals_flat = normals.reshape(-1, 3)
        sampled_dists = jnp.linalg.norm(pts_flat - ref_cam_loc[None], axis=-1)  # [N]

        rel = jnp.einsum("vij,jk->vik", inv_src_poses, ref_c2w)  # [V,4,4]
        R_rel = rel[:, :3, :3]
        t_rel = rel[:, :3, 3]
        R_ref = inv_ref_pose[:3, :3]
        t_ref = inv_ref_pose[:3, 3]

        # plane geometry (in the reference camera frame), gradient-free
        rot_normals = jax.lax.stop_gradient(
            jnp.einsum("ij,nj->ni", R_ref, normals_flat)
        )  # [N, 3]
        points_in_ref = jnp.einsum("ij,nj->ni", R_ref, pts_flat) + t_ref[None]  # [N,3]
        d1 = jnp.sum(rot_normals * points_in_ref, axis=-1)  # [N]
        src_centers_in_ref = -jnp.einsum("vji,vj->vi", R_rel, t_rel)  # [V, 3]
        d2 = jnp.einsum("ni,vi->nv", rot_normals, src_centers_in_ref)  # [N, V]

        valid_hom = (
            (jnp.abs(d1)[:, None] > self.plane_dist_thresh)
            & (jnp.abs(d1[:, None] - d2) > self.plane_dist_thresh)
            & ((d2 / d1[:, None]) < 1.0)
        )  # [N, V]

        sign = jnp.where(jnp.sign(d1) == 0, 1.0, jnp.sign(d1))
        d = jnp.maximum(jnp.abs(d1), 1e-8) * sign  # [N]

        # H p = K_src (R_rel + t_rel nᵀ/d) K_ref⁻¹ p, applied WITHOUT ever
        # materializing a [V,N,3,3] homography stack or a [V,B,S,Npx,3]
        # warped-point tensor: on TPU any production-shape tensor whose
        # minor dimension is 2 or 3 tiles to 128 lanes (a 42-64x HBM
        # padding blowup, measured 28.9 GB for one fusion output at the
        # DTU config — an instant chip OOM). Instead: q = K_ref⁻¹ p is
        # tiny, K(R q) and K t are small, and the plane coefficient
        # nᵀq/d is a scalar per (view, point, patch-pixel) — every big
        # tensor below is [V, B, S, Npx] with the patch axis minor
        # (~6% padding).
        pixels = uv_px[:, None, :] + self.offsets[None, :, :]  # [B, Npx, 2]
        pix_h = jnp.concatenate([pixels, jnp.ones((B, npx, 1), pts.dtype)], axis=-1)
        q = jnp.einsum("kl,bol->bko", inv_ref_intr, pix_h)  # [B, 3, Npx] (tiny)

        KR = jnp.einsum("vij,vjk->vik", src_intrs, R_rel)  # [V, 3, 3]
        KRq = jnp.einsum("vik,bko->vbio", KR, q)  # [V, B, 3, Npx] (small)
        Kt = jnp.einsum("vij,vj->vi", src_intrs, t_rel)  # [V, 3]

        # plane coefficient per (v, n, o): nᵀq/d for valid homographies,
        # the fronto-parallel q_z/dist fallback otherwise
        nq = jnp.einsum("bsj,bjo->bso", rot_normals.reshape(B, S, 3), q)  # [B,S,Npx]
        coef_valid = nq / d.reshape(B, S)[..., None]
        coef_fp = q[:, None, 2, :] / sampled_dists.reshape(B, S)[..., None]
        coef = jnp.where(
            valid_hom.T.reshape(V, B, S)[..., None], coef_valid[None], coef_fp[None]
        )  # [V, B, S, Npx]

        wx = KRq[:, :, None, 0, :] + Kt[:, None, None, None, 0] * coef
        wy = KRq[:, :, None, 1, :] + Kt[:, None, None, None, 1] * coef
        wz = KRq[:, :, None, 2, :] + Kt[:, None, None, None, 2] * coef
        gx = wx / jnp.maximum(wz, 1e-8)
        gy = wy / jnp.maximum(wz, 1e-8)
        mask = wz > 0

        h = self.h_patch_size
        mask = mask & (gx < (sizeW - h)) & (gy < (sizeH - h)) & (gx >= h) & (gy >= h)
        return gx, gy, mask

    def patch_warp(
        self, pts, uv, normals, src_imgs, ref_intrinsic, src_intrinsics,
        ref_c2w, src_c2ws, *, detach_normal: bool = False,
    ):
        """Homography patch warp (ref: patch_projector.py:45-150).

        pts: [B, S, 3]; uv: [B, 2] in (-1, 1); normals: [B, S, 3] world;
        src_imgs: [V, 3, H, W]. Returns colors [B, S, V, 3, Npx] —
        CHANNEL-PACKED, patch axis minor (a channel-minor layout tiles a
        production-shape [B·S·V·Npx, 3] intermediate to 128 lanes on TPU:
        a 42x padding blowup that OOMs the chip) — and mask [B, S, V, Npx].
        """
        V, _, sizeH, sizeW = src_imgs.shape
        gx, gy, mask = self.patch_warp_positions(
            pts, uv, normals, (sizeH, sizeW), ref_intrinsic, src_intrinsics,
            ref_c2w, src_c2ws, detach_normal=detach_normal,
        )
        gx = jnp.clip(2.0 * gx / (sizeW - 1) - 1.0, -10.0, 10.0)
        gy = jnp.clip(2.0 * gy / (sizeH - 1) - 1.0, -10.0, 10.0)

        colors = jax.vmap(
            lambda im, x, y: grid_sample_2d_xy(im, x, y, channels_last=False)
        )(src_imgs, gx, gy)  # [V, 3, B, S, Npx]
        return colors.transpose(2, 3, 0, 1, 4), mask.transpose(1, 2, 0, 3)
