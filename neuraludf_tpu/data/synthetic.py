"""Synthetic multi-view scenes with exact ground-truth geometry.

Analytically ray-traced checkerboard scenes written in the IDR layout the
framework loads (cameras.npz + image/ + mask/, see docs/DATA.md). No
external data is needed for the test suite or bench.py. Two kinds:

* ``sphere``  — closed surface: radius-0.5 sphere at the origin.
* ``capsule`` — open surface: the same sphere with the cap above y = 0.2
  removed (an open half-shell with a rim), exercising the UDF open-surface
  path end-to-end.

The reference ships no synthetic scenes (it trains on DTU/DeepFashion3D
only); this module is the framework's hermetic stand-in for those datasets.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

SPHERE_RADIUS = 0.5
CAPSULE_CUT_Y = 0.2


def look_at_pose(
    loc, target=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0)
) -> np.ndarray:
    """Camera-to-world pose (OpenCV convention: +z forward) looking from
    `loc` toward `target`."""
    loc = np.asarray(loc, np.float32)
    z = np.asarray(target, np.float32) - loc
    z = z / np.linalg.norm(z)
    upv = np.asarray(up, np.float32)
    x = np.cross(upv, z)
    if np.linalg.norm(x) < 1e-6:  # looking straight along `up`
        x = np.cross(np.asarray([1.0, 0.0, 0.0], np.float32), z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 0], pose[:3, 1], pose[:3, 2], pose[:3, 3] = x, y, z, loc
    return pose


def _camera_ring(n_views: int, dist: float = 2.2) -> np.ndarray:
    locs = []
    for i in range(n_views):
        ang = 2.0 * np.pi * i / n_views
        d = np.array(
            [np.sin(ang), 0.3 * np.sin(2.0 * ang + 0.7) + 0.15, -np.cos(ang)],
            np.float32,
        )
        locs.append(d / np.linalg.norm(d) * dist)
    return np.stack(locs)


def _trace(rays_o, rays_d, kind: str):
    """Closest valid hit with a radius-0.5 sphere (capsule: cap removed).
    Returns (hit mask, hit points, normals) — all [N, ...]."""
    r = SPHERE_RADIUS
    b = np.sum(rays_o * rays_d, axis=-1)
    c = np.sum(rays_o * rays_o, axis=-1) - r * r
    disc = b * b - c
    ok = disc > 0.0
    sq = np.sqrt(np.maximum(disc, 0.0))
    t1, t2 = -b - sq, -b + sq

    def valid(t):
        pts = rays_o + t[:, None] * rays_d
        v = ok & (t > 0.0)
        if kind == "capsule":
            v &= pts[:, 1] <= CAPSULE_CUT_Y
        return v, pts

    v1, p1 = valid(t1)
    v2, p2 = valid(t2)
    hit = v1 | v2
    pts = np.where(v1[:, None], p1, p2)
    normals = pts / np.maximum(np.linalg.norm(pts, axis=-1, keepdims=True), 1e-8)
    # back faces (inside of the open shell) flip toward the viewer
    facing = np.sum(normals * rays_d, axis=-1, keepdims=True)
    normals = np.where(facing > 0, -normals, normals)
    return hit, pts, normals


_LIGHT = np.array([0.48, 0.6, -0.64], np.float32)
_LIGHT = _LIGHT / np.linalg.norm(_LIGHT)


def _shade(pts, normals, rays_d, hit):
    """Checkerboard albedo + fixed-light double-sided Lambertian, [N, 3].

    View-INDEPENDENT surface color: every camera sees the same radiance at
    a surface point, so the photometric loss pins depth unambiguously (a
    headlight term would make the target color a function of the viewing
    ray and slow geometric convergence)."""
    u = np.arctan2(pts[:, 2], pts[:, 0])
    v = np.arccos(np.clip(pts[:, 1] / SPHERE_RADIUS, -1.0, 1.0))
    checker = (np.floor(u / np.pi * 4.0) + np.floor(v / np.pi * 4.0)) % 2.0
    c0 = np.array([0.25, 0.35, 0.75], np.float32)  # BGR-ish warm
    c1 = np.array([0.70, 0.55, 0.25], np.float32)
    albedo = np.where(checker[:, None] > 0.5, c0[None], c1[None])
    # double-sided so the inside of the open shell is lit too; the geometric
    # normal (not the flipped one) keeps it view-independent
    n_geo = pts / np.maximum(np.linalg.norm(pts, axis=-1, keepdims=True), 1e-8)
    lambert = np.abs(n_geo @ _LIGHT)[:, None]
    color = albedo * (0.35 + 0.65 * lambert)
    # smooth direction-dependent background (learnable by the NeRF bg net)
    bg = 0.12 + 0.25 * np.abs(rays_d)
    return np.where(hit[:, None], color, bg)


def generate_scene(
    out_dir: str,
    kind: str = "sphere",
    n_views: int = 16,
    H: int = 600,
    W: int = 800,
    focal: float = 900.0,
) -> None:
    """Ray-trace and write an IDR-layout scene directory."""
    import cv2 as cv

    assert kind in ("sphere", "capsule"), kind
    os.makedirs(os.path.join(out_dir, "image"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "mask"), exist_ok=True)

    K = np.eye(4, dtype=np.float32)
    K[0, 0] = K[1, 1] = focal
    K[0, 2], K[1, 2] = W / 2.0, H / 2.0

    xs, ys = np.meshgrid(
        np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32), indexing="xy"
    )
    pix = np.stack([xs, ys, np.ones_like(xs)], axis=-1).reshape(-1, 3)
    K_inv = np.linalg.inv(K[:3, :3])
    dirs_cam = pix @ K_inv.T
    dirs_cam /= np.linalg.norm(dirs_cam, axis=-1, keepdims=True)

    cams = {}
    for i, loc in enumerate(_camera_ring(n_views)):
        pose = look_at_pose(loc)
        rays_d = dirs_cam @ pose[:3, :3].T
        rays_o = np.broadcast_to(pose[:3, 3], rays_d.shape)
        hit, pts, normals = _trace(rays_o, rays_d, kind)
        color = _shade(pts, normals, rays_d, hit)

        img = (color.reshape(H, W, 3) * 255.0).clip(0, 255).astype(np.uint8)
        msk = (hit.reshape(H, W).astype(np.uint8) * 255)[..., None].repeat(3, axis=-1)
        cv.imwrite(os.path.join(out_dir, "image", f"{i:03d}.png"), img)
        cv.imwrite(os.path.join(out_dir, "mask", f"{i:03d}.png"), msk)

        cams[f"world_mat_{i}"] = (K @ np.linalg.inv(pose)).astype(np.float32)
        cams[f"scale_mat_{i}"] = np.eye(4, dtype=np.float32)

    np.savez(os.path.join(out_dir, "cameras.npz"), **cams)


def gt_surface_points(kind: str, n: int = 200_000, seed: int = 0) -> np.ndarray:
    """Exact GT surface samples (for Chamfer evaluation of trained scenes)."""
    rng = np.random.RandomState(seed)
    v = rng.normal(size=(int(n * 1.6), 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    if kind == "capsule":
        v = v[v[:, 1] <= CAPSULE_CUT_Y / SPHERE_RADIUS * 1.0]
    return (v[:n] * SPHERE_RADIUS).astype(np.float32)
