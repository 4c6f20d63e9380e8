"""Format fixtures for real-data day (VERDICT r3 missing #3): synthesize
the official DTU eval artifacts (`ObsMask{scan}_10.mat`, `Plane{scan}.mat`)
and an IDR `cameras.npz` in the reference's EXACT layouts, and push them
through our loaders + eval. A format drift (key rename, shape change,
transposed BB, non-normalized world_mat) fails here instead of on real data.

Layouts replicated from the reference consumers:
  - eval: /root/reference/evaluation/eval_dtu_python.py:102-137 (keys
    ObsMask/BB/Res from loadmat; Plane key 'P'; grid = round((x-BB[0])/Res))
  - cameras: /root/reference/dataset/dataset.py:59-97 (world_mat_%d 4x4
    projection K@W2C, scale_mat_%d unit-sphere normalization; P = world @
    scale decomposed via cv2-style RQ)
"""

import os

import numpy as np
import pytest

from neuraludf_tpu.eval.chamfer import eval_mesh, load_dtu_obs_mask
from neuraludf_tpu.mesh.ply import export_ply


SCAN = 118


@pytest.fixture()
def obsmask_dir(tmp_path):
    """ObsMask/Plane .mat pair in the official DTU SampleSet layout.

    Grid: 40x40x40 at Res=10mm covering BB=[0,400)^3; observable = the
    x<200mm half. Plane z=50mm (P=[0,0,1,-50]: keeps GT with z>50)."""
    from scipy.io import savemat

    d = tmp_path / "MVS_Data"
    (d / "ObsMask").mkdir(parents=True)
    n = 40
    mask = np.zeros((n, n, n), dtype=np.uint8)
    mask[: n // 2] = 1  # x-half observable
    bb = np.array([[0.0, 0.0, 0.0], [400.0, 400.0, 400.0]])  # [2,3] min/max
    savemat(
        str(d / "ObsMask" / f"ObsMask{SCAN}_10.mat"),
        {"ObsMask": mask, "BB": bb, "Res": np.array([[10.0]])},
    )
    savemat(
        str(d / "ObsMask" / f"Plane{SCAN}.mat"),
        {"P": np.array([[0.0], [0.0], [1.0], [-50.0]])},
    )
    return str(d)


def test_load_dtu_obs_mask_official_layout(obsmask_dir):
    (obs, bb, res), plane = load_dtu_obs_mask(obsmask_dir, SCAN)
    assert obs.shape == (40, 40, 40)
    assert bb.shape == (2, 3)
    assert float(np.asarray(res).reshape(-1)[0]) == 10.0
    assert np.asarray(plane).reshape(-1).shape == (4,)


def _square_mesh(tmp_path, *patches):
    """Axis-aligned 10x10mm quads at (cx, cy, z)."""
    verts, faces = [], []
    for n, (cx, cy, z) in enumerate(patches):
        verts.append(np.array(
            [[cx - 5, cy - 5, z], [cx + 5, cy - 5, z],
             [cx + 5, cy + 5, z], [cx - 5, cy + 5, z]], np.float64))
        faces.append(np.array([[0, 1, 2], [0, 2, 3]], np.int64) + 4 * n)
    mesh_path = str(tmp_path / "pred.ply")
    export_ply(mesh_path, np.concatenate(verts).astype(np.float32),
               np.concatenate(faces).astype(np.int32))
    return mesh_path


def _gt_cluster(cx, cy, z):
    gx, gy = np.meshgrid(np.linspace(cx - 4.5, cx + 4.5, 10),
                         np.linspace(cy - 4.5, cy + 4.5, 10))
    return np.stack([gx.ravel(), gy.ravel(), np.full(gx.size, z)], -1)


def test_eval_mesh_applies_official_obsmask(obsmask_dir, tmp_path):
    """A mesh patch in the UNOBSERVABLE half, 15mm off its GT (inside the
    20mm truncation), must be excluded from data->GT by the ObsMask."""
    (obs, bb, res), _ = load_dtu_obs_mask(obsmask_dir, SCAN)
    # observable patch (x=100) on-GT; hidden patch (x=300) 15mm off-GT
    mesh_path = _square_mesh(tmp_path, (100.0, 200.0, 100.0), (300.0, 200.0, 115.0))
    gt = np.concatenate([_gt_cluster(100, 200, 100.0), _gt_cluster(300, 200, 100.0)])

    r = eval_mesh(
        mesh_path, gt, downsample_density=1.0,
        obs_mask=(obs, bb, float(np.asarray(res).reshape(-1)[0])),
        patch_size=60.0, scan=SCAN,
    )
    assert r.mean_d2s < 1.0, r  # hidden patch's 15mm error filtered out
    r0 = eval_mesh(mesh_path, gt, downsample_density=1.0, scan=SCAN)
    assert r0.mean_d2s > 5.0, r0  # control: ~half the points at ~15mm


def test_eval_mesh_applies_official_plane(obsmask_dir, tmp_path):
    """GT below the official ground plane must not contribute to GT->data.
    Plane z=50: decoy GT at z=40, 12mm below a mesh patch at z=52."""
    from scipy.io import savemat

    savemat(os.path.join(obsmask_dir, "ObsMask", f"Plane{SCAN}.mat"),
            {"P": np.array([[0.0], [0.0], [1.0], [-50.0]])})
    _, plane = load_dtu_obs_mask(obsmask_dir, SCAN)
    mesh_path = _square_mesh(tmp_path, (100.0, 200.0, 52.0))
    gt = np.concatenate([
        _gt_cluster(100, 200, 52.0),  # above plane, on-mesh
        _gt_cluster(100, 200, 40.0),  # below plane, 12mm off-mesh
    ])
    r = eval_mesh(mesh_path, gt, downsample_density=1.0,
                  ground_plane=np.asarray(plane).reshape(4), scan=SCAN)
    assert r.mean_s2d < 1.0, r
    r0 = eval_mesh(mesh_path, gt, downsample_density=1.0, scan=SCAN)
    assert r0.mean_s2d > 5.0, r0  # control: decoy contributes ~12mm


def test_cameras_npz_official_layout(tmp_path):
    """IDR cameras.npz with NON-TRIVIAL world/scale mats: world_mat_%d is an
    arbitrarily-scaled K@[R|t] projection, scale_mat_%d a unit-sphere
    normalization with offset center. Our Dataset must recover K and the
    normalized pose (the synthetic scenes ship identity-like scale mats, so
    this is the only test of the real DTU decomposition path)."""
    import cv2 as cv

    from neuraludf_tpu.config import DatasetConfig
    from neuraludf_tpu.data.dataset import Dataset

    rng = np.random.RandomState(0)
    H, W, n_views = 32, 40, 3
    K = np.array([[290.0, 0.0, 20.0], [0.0, 285.0, 16.0], [0.0, 0.0, 1.0]])
    center = np.array([12.0, -7.0, 30.0])
    radius = 25.0

    d = tmp_path / "scan"
    (d / "image").mkdir(parents=True)
    (d / "mask").mkdir()
    cams = {}
    poses = []
    for i in range(n_views):
        # camera on a ring looking at `center`
        ang = 2 * np.pi * i / n_views
        eye = center + np.array([60.0 * np.cos(ang), 60.0 * np.sin(ang), 25.0])
        fwd = center - eye
        fwd = fwd / np.linalg.norm(fwd)
        right = np.cross(fwd, [0.0, 0.0, 1.0])
        right /= np.linalg.norm(right)
        down = np.cross(fwd, right)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, down, fwd, eye
        poses.append(c2w)
        w2c = np.linalg.inv(c2w)
        world = np.eye(4)
        world[:3] = K @ w2c[:3]
        world *= 1.0 + 0.3 * i  # projections are homogeneous; DTU mats are not normalized
        scale = np.eye(4)
        scale[:3, :3] *= radius
        scale[:3, 3] = center
        cams[f"world_mat_{i}"] = world
        cams[f"scale_mat_{i}"] = scale
        img = rng.randint(0, 255, (H, W, 3), np.uint8)
        cv.imwrite(str(d / "image" / f"{i:03d}.png"), img)
        cv.imwrite(str(d / "mask" / f"{i:03d}.png"),
                   np.full((H, W, 3), 255, np.uint8))
    np.savez(str(d / "cameras.npz"), **cams)

    ds = Dataset(DatasetConfig(data_dir=str(d), dataset_name="dtu"))
    assert ds.n_images == n_views
    got_K = np.asarray(ds.scene["intrinsics"])[:, :3, :3]
    np.testing.assert_allclose(got_K, np.stack([K] * n_views), rtol=1e-4, atol=1e-3)
    got_pose = np.asarray(ds.scene["poses"])
    for i in range(n_views):
        # normalized pose: same rotation, center mapped to (eye-center)/radius
        np.testing.assert_allclose(
            got_pose[i, :3, :3], poses[i][:3, :3], rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            got_pose[i, :3, 3], (poses[i][:3, 3] - center) / radius,
            rtol=1e-4, atol=1e-5)
    # object bbox derives from scale_mat_0 in the normalized frame
    np.testing.assert_allclose(ds.object_bbox_min, [-1.01] * 3, atol=1e-5)
    np.testing.assert_allclose(ds.object_bbox_max, [1.01] * 3, atol=1e-5)
