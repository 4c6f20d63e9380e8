"""Tests for the offline evaluation subsystem."""

import numpy as np

from neuraludf_tpu.eval.chamfer import eval_mesh, greedy_downsample, sample_mesh_to_pcd
from neuraludf_tpu.eval.clean_mesh import connected_components
from neuraludf_tpu.mesh.mc import marching_cubes_classic
from neuraludf_tpu.mesh.ply import export_ply


def sphere_mesh(N=48, radius=0.5):
    xs = np.linspace(-1, 1, N, dtype=np.float32)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    sdf = np.sqrt(gx ** 2 + gy ** 2 + gz ** 2) - radius
    verts, faces = marching_cubes_classic(sdf, 0.0)
    return verts * (2.0 / (N - 1)) - 1.0, faces


def fib_sphere(n, radius=0.5):
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5 ** 0.5) * i
    return radius * np.stack(
        [np.sin(phi) * np.cos(theta), np.sin(phi) * np.sin(theta), np.cos(phi)], -1
    )


def test_sample_mesh_density():
    verts, faces = sphere_mesh()
    pcd = sample_mesh_to_pcd(verts.astype(np.float64), faces, density=0.02)
    assert len(pcd) > len(verts)  # triangles got lattice samples
    r = np.linalg.norm(pcd, axis=-1)
    assert abs(r.mean() - 0.5) < 0.01


def test_greedy_downsample_spacing():
    pts = np.random.RandomState(0).rand(2000, 3)
    down = greedy_downsample(pts, radius=0.2)
    from scipy.spatial import cKDTree

    d, _ = cKDTree(down).query(down, k=2)
    assert d[:, 1].min() >= 0.2 - 1e-9
    assert len(down) < len(pts)


def test_eval_mesh_sphere_chamfer(tmp_path):
    verts, faces = sphere_mesh()
    p = str(tmp_path / "sphere.ply")
    export_ply(p, verts, faces)
    gt = fib_sphere(20000)
    r = eval_mesh(p, gt, downsample_density=0.02, max_dist=0.5, thresh1=0.01, thresh2=0.02)
    # MC on a 48³ grid: expect Chamfer well under half a voxel (~0.02);
    # s2d is measured against the 0.02-spaced downsampled point set, so the
    # f-score at exactly that spacing is protocol-limited, not mesh-limited
    assert r.chamfer < 0.01, r
    assert r.fscore_2 > 0.85, r
    assert r.precision_1 > 0.99, r
    # offset mesh scores proportionally worse
    p2 = str(tmp_path / "sphere_off.ply")
    export_ply(p2, verts + np.array([0.05, 0, 0]), faces)
    r2 = eval_mesh(p2, gt, downsample_density=0.02, max_dist=0.5, thresh1=0.01, thresh2=0.02)
    assert r2.chamfer > r.chamfer * 2


def test_connected_components():
    # two disjoint triangles
    faces = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    comp = connected_components(faces, 6)
    assert comp[0] != comp[1]
