"""Dataset: IDR-convention scene loading + jittable ray generation.

TPU-native split of the reference Dataset (ref: dataset/dataset.py:40-344):

* **Host side** (`Dataset`): file I/O, P-matrix decomposition, view pairing.
  All per-view arrays are stacked into one `scene` pytree that lives in HBM
  — images [V,H,W,3] (BGR, /256 like the reference, ref: dataset.py:69-70),
  masks, intrinsics(+inverses), c2w poses.
* **Device side** (pure functions): `sample_random_rays`, `rays_at`,
  `ref_src_info`, `near_far_from_sphere` are jit-traceable gathers/matmuls
  with static shapes, so ray sampling fuses into the training step instead
  of being a host round trip per iteration.

Pixel convention is the reference's: a ray for pixel (x, y) is
``normalize(pose_R @ K^-1 [x, y, 1])`` from the camera center
(ref: dataset/dataset.py:151-164).
"""

from __future__ import annotations

import os
from glob import glob
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DatasetConfig
from .cameras import decompose_projection

Scene = Dict[str, jnp.ndarray]


# ----------------------------------------------------------------------
# pure, jittable ray generation
# ----------------------------------------------------------------------


def near_far_from_sphere(rays_o: jnp.ndarray, rays_d: jnp.ndarray):
    """Analytic near/far for a unit-sphere-normalized scene: the midpoint of
    the ray's closest approach to the origin, ∓1 (ref: dataset.py:329-335)."""
    a = jnp.sum(rays_d ** 2, axis=-1, keepdims=True)
    b = 2.0 * jnp.sum(rays_o * rays_d, axis=-1, keepdims=True)
    mid = 0.5 * (-b) / a
    return mid - 1.0, mid + 1.0


def pixels_to_rays(pixels_x, pixels_y, intrinsics_inv, pose):
    """World-space rays through pixel centers (ref: dataset.py:219-225).

    pixels_*: [...] float; intrinsics_inv/pose: [4,4]. Returns (rays_o,
    rays_v) of shape [..., 3] with unit directions.
    """
    p = jnp.stack([pixels_x, pixels_y, jnp.ones_like(pixels_x)], axis=-1)
    p = jnp.einsum("ij,...j->...i", intrinsics_inv[:3, :3], p)
    rays_v = p / jnp.linalg.norm(p, axis=-1, keepdims=True)
    rays_v = jnp.einsum("ij,...j->...i", pose[:3, :3], rays_v)
    rays_o = jnp.broadcast_to(pose[:3, 3], rays_v.shape)
    return rays_o, rays_v


def _draw_pixels(scene: Scene, img_idx, key, batch_size: int, importance_sample: bool):
    """Integer pixel draws; with importance sampling, 3/4 of the batch is
    drawn uniformly from in-mask pixels (ref: dataset.py:234-251) via an
    inverse-CDF over the flattened mask — static shapes, no host sync."""
    _, H, W, _ = scene["images"].shape
    kx, ky, km = jax.random.split(key, 3)
    if not importance_sample:
        px = jax.random.randint(kx, (batch_size,), 0, W)
        py = jax.random.randint(ky, (batch_size,), 0, H)
        return px, py
    n_uni = batch_size // 4
    n_mask = batch_size - n_uni
    px_u = jax.random.randint(kx, (n_uni,), 0, W)
    py_u = jax.random.randint(ky, (n_uni,), 0, H)
    m = (jnp.take(scene["masks"], img_idx, axis=0)[..., 0] > 0).astype(jnp.float32)
    cdf = jnp.cumsum(m.reshape(-1))
    u = jax.random.uniform(km, (n_mask,)) * cdf[-1]
    flat = jnp.clip(jnp.searchsorted(cdf, u, side="right"), 0, H * W - 1)
    px = jnp.concatenate([px_u, (flat % W).astype(jnp.int32)])
    py = jnp.concatenate([py_u, (flat // W).astype(jnp.int32)])
    return px, py


def sample_random_rays(
    scene: Scene,
    img_idx,
    key: jax.Array,
    batch_size: int,
    crop_patch: bool = False,
    h_patch_size: int = 3,
    importance_sample: bool = False,
) -> Dict[str, Optional[jnp.ndarray]]:
    """Random training rays from one view (ref: dataset.py:228-294).

    Returns {"rays": [B,10] (o, d, rgb, mask), "rays_ndc_uv": [B,2] in
    (-1,1), "rays_patch_color": [B,(2h+1)²,3] or None, "rays_patch_mask":
    [B,1] or None}. Fully jittable: `img_idx` may be a traced scalar.
    """
    from ..ops.interp import grid_sample_2d
    from ..render.projector import build_patch_offset

    _, H, W, _ = scene["images"].shape
    px, py = _draw_pixels(scene, img_idx, key, batch_size, importance_sample)

    image = jnp.take(scene["images"], img_idx, axis=0)
    mask_img = jnp.take(scene["masks"], img_idx, axis=0)
    intr_inv = jnp.take(scene["intrinsics_inv"], img_idx, axis=0)
    pose = jnp.take(scene["poses"], img_idx, axis=0)

    color = image[py, px]  # [B, 3]
    mask = (mask_img[py, px] > 0).astype(jnp.float32)
    pxf, pyf = px.astype(jnp.float32), py.astype(jnp.float32)
    rays_o, rays_v = pixels_to_rays(pxf, pyf, intr_inv, pose)
    rays = jnp.concatenate([rays_o, rays_v, color, mask[:, :1]], axis=-1)

    ndc_uv = jnp.stack(
        [2.0 * pxf / (W - 1) - 1.0, 2.0 * pyf / (H - 1) - 1.0], axis=-1
    )

    patch_color = patch_mask = None
    if crop_patch:
        offsets = jnp.asarray(build_patch_offset(h_patch_size))  # [Npx, 2]
        grid = jnp.stack([pxf, pyf], axis=-1)[:, None, :] + offsets[None]  # [B,Npx,2]
        grid_uv = jnp.stack(
            [2.0 * grid[..., 0] / (W - 1) - 1.0, 2.0 * grid[..., 1] / (H - 1) - 1.0],
            axis=-1,
        )
        patch_color = grid_sample_2d(image.transpose(2, 0, 1), grid_uv)  # [B,Npx,3]
        h = h_patch_size
        patch_mask = (
            (px > h) & (px < W - h) & (py > h) & (py < H - h)
        ).reshape(-1, 1)

    return {
        "rays": rays,
        "rays_ndc_uv": ndc_uv,
        "rays_patch_color": patch_color,
        "rays_patch_mask": patch_mask,
    }


def rays_at(scene: Scene, img_idx, resolution_level: int = 1):
    """Full-image ray grid at a resolution level (ref: dataset.py:151-164).
    Returns (rays_o, rays_v) of shape [H//l, W//l, 3]."""
    _, H, W, _ = scene["images"].shape
    l = resolution_level
    tx = jnp.linspace(0, W - 1, W // l)
    ty = jnp.linspace(0, H - 1, H // l)
    pixels_x, pixels_y = jnp.meshgrid(tx, ty, indexing="xy")  # [H', W']
    intr_inv = jnp.take(scene["intrinsics_inv"], img_idx, axis=0)
    pose = jnp.take(scene["poses"], img_idx, axis=0)
    return pixels_to_rays(pixels_x, pixels_y, intr_inv, pose)


def ref_src_info(scene: Scene, ref_src_pairs: jnp.ndarray, img_idx, num: int = 8):
    """Blending inputs for a reference view: its c2w plus the `num` nearest
    source views' c2ws, intrinsics, and CHW images
    (ref: dataset.py:141-149). Jittable gathers."""
    row = jnp.take(ref_src_pairs, img_idx, axis=0)
    src_idx = row[: min(num, row.shape[0])]
    ref_c2w = jnp.take(scene["poses"], img_idx, axis=0)
    src_c2ws = jnp.take(scene["poses"], src_idx, axis=0)
    src_intr = jnp.take(scene["intrinsics"], src_idx, axis=0)
    src_images = jnp.take(scene["images"], src_idx, axis=0).transpose(0, 3, 1, 2)
    return ref_c2w, src_c2ws, src_intr, src_images


# ----------------------------------------------------------------------
# host-side loader
# ----------------------------------------------------------------------


class Dataset:
    """Loads an IDR-convention scene directory into a device-resident scene
    pytree (ref: dataset/dataset.py:41-127)."""

    def __init__(self, conf: DatasetConfig):
        import cv2 as cv

        self.conf = conf
        self.data_dir = conf.data_dir
        self.dataset_name = conf.dataset_name
        self.downsample_factor = conf.downsample_factor
        self.camera_outside_sphere = conf.camera_outside_sphere
        self.scale_mat_scale = conf.scale_mat_scale

        camera_dict = np.load(os.path.join(self.data_dir, conf.render_cameras_name))
        if self.dataset_name == "bmvs":
            self.images_lis = sorted(glob(os.path.join(self.data_dir, "blended_images/*.jpg")))
            self.masks_lis = sorted(glob(os.path.join(self.data_dir, "masks/*.jpg")))
        else:  # dtu / deepfashion3d / general: png layout (ref: dataset.py:61-66)
            self.images_lis = sorted(glob(os.path.join(self.data_dir, "image/*.png")))
            self.masks_lis = sorted(glob(os.path.join(self.data_dir, "mask/*.png")))
        self.n_images = len(self.images_lis)
        if self.n_images == 0:
            raise FileNotFoundError(f"no images found under {self.data_dir}")

        # BGR, /256 — the reference convention (ref: dataset.py:69-70)
        self.images_np = np.stack([cv.imread(p) for p in self.images_lis]) / 256.0
        self.masks_np = np.stack([cv.imread(p) for p in self.masks_lis]) / 256.0

        self.world_mats_np = [
            camera_dict[f"world_mat_{i}"].astype(np.float32) for i in range(self.n_images)
        ]
        self.scale_mats_np = [
            camera_dict[f"scale_mat_{i}"].astype(np.float32) for i in range(self.n_images)
        ]

        intrinsics_all, pose_all = [], []
        for scale_mat, world_mat in zip(self.scale_mats_np, self.world_mats_np):
            P = (world_mat @ scale_mat)[:3, :4]
            intrinsics, pose = decompose_projection(P)
            intrinsics[:2] *= self.downsample_factor  # ref: dataset.py:87
            intrinsics_all.append(intrinsics)
            pose_all.append(pose)
        intrinsics_all = np.stack(intrinsics_all)
        pose_all = np.stack(pose_all)

        if self.downsample_factor != 1.0:
            f = self.downsample_factor
            self.images_np = np.stack(
                [cv.resize(im, None, fx=f, fy=f, interpolation=cv.INTER_LINEAR)
                 for im in self.images_np]
            )
            self.masks_np = np.stack(
                [cv.resize(m, None, fx=f, fy=f, interpolation=cv.INTER_LINEAR)
                 for m in self.masks_np]
            )

        self.H, self.W = self.images_np.shape[1], self.images_np.shape[2]
        self.image_pixels = self.H * self.W
        self.focal = float(intrinsics_all[0][0, 0])

        # mesh-extraction region of interest (ref: dataset.py:112-123)
        object_scale_mat = np.load(
            os.path.join(self.data_dir, conf.object_cameras_name)
        )["scale_mat_0"]
        lo = np.array([-1.01, -1.01, -1.01, 1.0])
        hi = np.array([1.01, 1.01, 1.01, 1.0])
        inv0 = np.linalg.inv(self.scale_mats_np[0])
        self.object_bbox_min = (inv0 @ object_scale_mat @ lo[:, None])[:3, 0]
        self.object_bbox_max = (inv0 @ object_scale_mat @ hi[:, None])[:3, 0]

        self.scene: Scene = {
            "images": jnp.asarray(self.images_np, jnp.float32),
            "masks": jnp.asarray(self.masks_np, jnp.float32),
            "intrinsics": jnp.asarray(intrinsics_all),
            "intrinsics_inv": jnp.asarray(np.linalg.inv(intrinsics_all)),
            "poses": jnp.asarray(pose_all),
        }
        self.ref_src_pairs = jnp.asarray(self._prepare_ref_src_pairs(pose_all))

    def _prepare_ref_src_pairs(self, pose_all: np.ndarray) -> np.ndarray:
        """Up to 9 nearest cameras (by center distance) per reference view
        (ref: dataset.py:129-139)."""
        centers = pose_all[:, :3, 3]
        d = np.linalg.norm(centers[:, None] - centers[None], axis=-1)
        order = np.argsort(d, axis=1)
        return order[:, 1:10].astype(np.int32)

    # -- ray generators -------------------------------------------------

    def gen_rays_at(self, img_idx: int, resolution_level: int = 1):
        return rays_at(self.scene, img_idx, resolution_level)

    def gen_random_rays_patches_at(
        self, img_idx, key, batch_size: int,
        crop_patch: bool = False, h_patch_size: int = 3,
        importance_sample: bool = False,
    ):
        return sample_random_rays(
            self.scene, img_idx, key, batch_size,
            crop_patch=crop_patch, h_patch_size=h_patch_size,
            importance_sample=importance_sample,
        )

    def gen_one_ray_at(self, img_idx: int, x: int, y: int) -> jnp.ndarray:
        """One [1,10] ray row through pixel (x, y) (ref: dataset.py:166-193)."""
        image = jnp.take(self.scene["images"], img_idx, axis=0)
        mask_img = jnp.take(self.scene["masks"], img_idx, axis=0)
        color = image[y, x][None]
        mask = (mask_img[y, x] > 0).astype(jnp.float32)[None]
        rays_o, rays_v = pixels_to_rays(
            jnp.asarray([float(x)]), jnp.asarray([float(y)]),
            self.scene["intrinsics_inv"][img_idx], self.scene["poses"][img_idx],
        )
        return jnp.concatenate([rays_o, rays_v, color, mask[:, :1]], axis=-1)

    def gen_rays_between(self, idx_0: int, idx_1: int, ratio: float,
                         resolution_level: int = 1):
        """Full-image rays from a pose slerp-interpolated between two views
        (ref: dataset.py:296-327). Host-side pose math, device ray grid."""
        from scipy.spatial.transform import Rotation as Rot
        from scipy.spatial.transform import Slerp

        l = resolution_level
        tx = jnp.linspace(0, self.W - 1, self.W // l)
        ty = jnp.linspace(0, self.H - 1, self.H // l)
        pixels_x, pixels_y = jnp.meshgrid(tx, ty, indexing="xy")
        # the reference uses view 0's intrinsics for in-between renders
        intr_inv = self.scene["intrinsics_inv"][0]

        pose_0 = np.linalg.inv(np.asarray(self.scene["poses"][idx_0]))
        pose_1 = np.linalg.inv(np.asarray(self.scene["poses"][idx_1]))
        rots = Rot.from_matrix(np.stack([pose_0[:3, :3], pose_1[:3, :3]]))
        rot = Slerp([0, 1], rots)(ratio)
        pose = np.eye(4, dtype=np.float32)
        pose[:3, :3] = rot.as_matrix()
        pose[:3, 3] = ((1.0 - ratio) * pose_0 + ratio * pose_1)[:3, 3]
        pose = np.linalg.inv(pose)
        return pixels_to_rays(pixels_x, pixels_y, intr_inv, jnp.asarray(pose))

    # -- misc ------------------------------------------------------------

    def get_ref_src_info(self, img_idx, num: int = 8):
        return ref_src_info(self.scene, self.ref_src_pairs, img_idx, num=num)

    def near_far_from_sphere(self, rays_o, rays_d):
        return near_far_from_sphere(rays_o, rays_d)

    def image_at(self, idx: int, resolution_level: int) -> np.ndarray:
        """GT image at a resolution level, 0-255 BGR (ref: dataset.py:337-339)."""
        import cv2 as cv

        img = (self.images_np[idx] * 256).astype(np.uint8)
        return cv.resize(
            img, (self.W // resolution_level, self.H // resolution_level)
        ).clip(0, 255)
