"""Mesh-cleaning subsystem on a synthetic scene with real cameras/masks."""

import numpy as np
import pytest

from neuraludf_tpu.data.synthetic import generate_scene
from neuraludf_tpu.eval.clean_mesh import (
    clean_mesh_faces_by_mask,
    clean_mesh_faces_by_visualhull,
    clean_outliers,
)
from neuraludf_tpu.mesh.mc import marching_cubes_classic
from neuraludf_tpu.mesh.ply import export_ply, load_ply


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("scene_clean") / "sphere"
    generate_scene(str(d), kind="sphere", n_views=16, H=80, W=96, focal=70.0)
    return str(d)


def make_sphere_with_floater(tmp_path):
    """Sphere mesh + a spurious blob far outside the visual hull."""
    N = 40
    xs = np.linspace(-1, 1, N, dtype=np.float32)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    sdf = np.sqrt(gx ** 2 + gy ** 2 + gz ** 2) - 0.5
    verts, faces = marching_cubes_classic(sdf, 0.0)
    verts = verts * (2.0 / (N - 1)) - 1.0
    # floater: a small triangle cluster near the corner, outside the hull
    off = len(verts)
    extra_v = np.array(
        [[0.8, 0.2, 0.1], [0.82, 0.2, 0.1], [0.8, 0.22, 0.1], [0.8, 0.2, 0.12]],
        np.float32,
    )
    extra_f = np.array([[off, off + 1, off + 2], [off, off + 2, off + 3]], np.int32)
    verts = np.concatenate([verts, extra_v])
    faces = np.concatenate([faces, extra_f])
    p = str(tmp_path / "m.ply")
    export_ply(p, verts, faces)
    return p, len(extra_f)


def test_visualhull_removes_floaters(scene_dir, tmp_path):
    p, n_extra = make_sphere_with_floater(tmp_path)
    v0, f0 = load_ply(p)
    out = str(tmp_path / "hull.ply")
    clean_mesh_faces_by_visualhull(p, out, scene_dir, mask_dilated_size=11, border=5)
    v1, f1 = load_ply(out)
    # the floater is gone, the sphere is kept
    assert len(f1) <= len(f0) - n_extra
    assert len(f1) > len(f0) * 0.8
    assert np.linalg.norm(v1, axis=1).max() < 0.75


def test_mask_filter_keeps_visible_geometry(scene_dir, tmp_path):
    p, _ = make_sphere_with_floater(tmp_path)
    out = str(tmp_path / "clean.ply")
    clean_mesh_faces_by_mask(p, out, scene_dir, minimal_vis=2, mask_dilated_size=11)
    v1, f1 = load_ply(out)
    assert len(f1) > 1000  # sphere retained
    r = np.linalg.norm(v1, axis=1)
    assert abs(np.median(r) - 0.5) < 0.05


def test_clean_outliers_keep_largest(tmp_path):
    p, n_extra = make_sphere_with_floater(tmp_path)
    out = str(tmp_path / "largest.ply")
    clean_outliers(p, out, keep_largest=True)
    v1, f1 = load_ply(out)
    v0, f0 = load_ply(p)
    assert len(f1) == len(f0) - n_extra


def test_shard_grid_query():
    import jax
    import jax.numpy as jnp

    from neuraludf_tpu.config import UDFNetworkConfig
    from neuraludf_tpu.nets import fields
    from neuraludf_tpu.parallel.sharding import make_mesh, shard_grid_query

    cfg = UDFNetworkConfig(d_out=33, d_hidden=32, n_layers=4, skip_in=(2,), multires=4)
    params = fields.init_distance_field(jax.random.PRNGKey(0), cfg)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (8 * 64, 3), minval=-1, maxval=1)
    mesh = make_mesh(8)
    fn = lambda p, x: fields.distance_value(p, x, cfg)[:, 0]
    sharded = shard_grid_query(mesh, fn)
    with mesh:
        out = sharded(params, pts)
    ref = fn(params, pts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)
