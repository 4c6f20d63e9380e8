"""Golden tests for the native marching-cubes engine on analytic UDFs."""

import numpy as np
import pytest

from neuraludf_tpu.mesh import process
from neuraludf_tpu.mesh.mc import marching_cubes_classic, marching_cubes_udf
from neuraludf_tpu.mesh.ply import export_ply, load_ply

R = 0.5


def sphere_udf_grid(N):
    xs = np.linspace(-1, 1, N, dtype=np.float32)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    r = np.sqrt(gx ** 2 + gy ** 2 + gz ** 2)
    udf = np.abs(r - R)
    # -normalized gradient of the UDF (points toward the surface)
    grad_dir = np.stack([gx, gy, gz], -1) / np.maximum(r[..., None], 1e-9)
    sign = np.sign(r - R)[..., None]
    normals = -(sign * grad_dir)
    return udf.astype(np.float32), normals.astype(np.float32)


def open_disk_udf_grid(N):
    """UDF of an open half-sphere shell (z <= 0 part of the sphere)."""
    xs = np.linspace(-1, 1, N, dtype=np.float32)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    r = np.linalg.norm(pts, axis=-1)
    below = pts[:, 2] <= 0
    d_shell = np.abs(r - R)
    # distance to the rim circle (radius R in plane z=0)
    rho = np.linalg.norm(pts[:, :2], axis=-1)
    d_rim = np.sqrt((rho - R) ** 2 + pts[:, 2] ** 2)
    udf = np.where(below, d_shell, d_rim)
    # finite-difference gradients
    udf3 = udf.reshape(N, N, N)
    g = np.stack(np.gradient(udf3, 2.0 / (N - 1)), axis=-1)
    g = g / np.maximum(np.linalg.norm(g, axis=-1, keepdims=True), 1e-9)
    return udf3.astype(np.float32), (-g).astype(np.float32)


def test_classic_mc_sphere():
    N = 64
    udf, _ = sphere_udf_grid(N)
    # classic extraction of the band |r - R| < t gives two shells; instead
    # extract the signed field r - R at iso 0
    xs = np.linspace(-1, 1, N, dtype=np.float32)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    sdf = np.sqrt(gx ** 2 + gy ** 2 + gz ** 2) - R
    verts, faces = marching_cubes_classic(sdf, 0.0)
    assert len(verts) > 500 and len(faces) > 500
    world = verts * (2.0 / (N - 1)) - 1.0
    r = np.linalg.norm(world, axis=-1)
    assert abs(r.mean() - R) < 0.01
    assert r.std() < 0.01
    # closed surface: no boundary edges
    assert len(process.boundary_edges(faces)) == 0


def test_udf_mc_sphere():
    N = 64
    udf, normals = sphere_udf_grid(N)
    verts, faces = marching_cubes_udf(udf, normals, 2.0 / (N - 1))
    assert len(verts) > 500 and len(faces) > 500
    world = verts * (2.0 / (N - 1)) - 1.0
    r = np.linalg.norm(world, axis=-1)
    assert abs(r.mean() - R) < 0.01, r.mean()
    assert r.std() < 0.02


def test_udf_mc_open_surface():
    """The defining capability: open meshes from an unsigned field."""
    N = 64
    udf, normals = open_disk_udf_grid(N)
    verts, faces = marching_cubes_udf(udf, normals, 2.0 / (N - 1))
    assert len(faces) > 200
    world = verts * (2.0 / (N - 1)) - 1.0
    r = np.linalg.norm(world, axis=-1)
    # vertices lie on the shell
    assert abs(r.mean() - R) < 0.03, r.mean()
    # open surface: must have boundary edges near the rim (z ≈ 0)
    verts2, faces2 = process.merge_duplicate_vertices(world, faces)
    faces2 = process.remove_bad_faces(verts2, faces2)
    be = process.boundary_edges(faces2)
    assert len(be) > 10, "no open boundary found"
    rim = verts2[np.unique(be)]
    assert np.abs(rim[:, 2]).mean() < 0.15, "boundary is not at the rim"
    # and no significant surface above the rim plane
    assert verts2[:, 2].max() < 0.2


def test_mesh_cleanup_and_ply_roundtrip(tmp_path):
    N = 48
    udf, normals = sphere_udf_grid(N)
    verts, faces = marching_cubes_udf(udf, normals, 2.0 / (N - 1))
    verts, faces = process.merge_duplicate_vertices(verts, faces)
    faces = process.remove_bad_faces(verts, faces)
    verts, faces = process.process_until_stable(verts, faces)
    p = str(tmp_path / "m.ply")
    export_ply(p, verts, faces)
    v2, f2 = load_ply(p)
    np.testing.assert_allclose(v2, verts.astype(np.float32), rtol=1e-6)
    np.testing.assert_array_equal(f2, faces)


def test_incremental_extraction_matches_full():
    """Incremental grid re-query (ref: extract_mesh.py:108-166): a second
    extraction through the cache must match a fresh full-fill extraction —
    exactly when the field is unchanged, closely when it drifted slightly."""
    import jax
    import jax.numpy as jnp

    from neuraludf_tpu.config import UDFNetworkConfig
    from neuraludf_tpu.mesh.meshudf import get_mesh_udf
    from neuraludf_tpu.nets import fields

    cfg = UDFNetworkConfig(d_out=17, d_hidden=16, n_layers=3, skip_in=(), multires=2)
    params = {"udf": fields.init_distance_field(jax.random.PRNGKey(0), cfg)}
    res = 40

    cache = {}
    v0, f0 = get_mesh_udf(params, cfg, resolution=res, cache=cache)
    assert len(v0) > 0 and cache.get("indices") is not None

    # unchanged field: cached re-query reproduces the same surface.
    # (Vertex enumeration is not bit-stable: the host-rebuilt query points
    # differ from the device-built ones by ~1 ulp, and the sign-vote BFS
    # ordering cascades; geometry is the contract.)
    from scipy.spatial import cKDTree

    v1, f1 = get_mesh_udf(params, cfg, resolution=res, cache=cache)
    voxel = 2.0 / (res - 1)
    assert abs(len(f1) - len(f0)) < 0.03 * len(f0)
    d01 = cKDTree(v0).query(v1, k=1)[0]
    assert d01.mean() < voxel / 100 and d01.max() < voxel, (d01.mean(), d01.max())

    # small parameter drift: incremental tracks the full refill closely
    drift = jax.tree_util.tree_map(
        lambda x: x + 1e-3 * jax.random.normal(jax.random.PRNGKey(1), x.shape), params
    )
    vi, fi = get_mesh_udf(drift, cfg, resolution=res, cache=cache)
    vf, ff = get_mesh_udf(drift, cfg, resolution=res)  # full fill
    d = cKDTree(vf).query(vi, k=1)[0]
    assert d.mean() < voxel / 4, float(d.mean())


def test_differentiable_vertices():
    """The re-plug trick: vertex positions are a differentiable function of
    the field parameters (the reference's version evaluates under no_grad —
    ours closes the loop); the border term is value-wise zero but routes
    gradient (ref: extract_mesh.py:276-352)."""
    import jax
    import jax.numpy as jnp

    from neuraludf_tpu.config import UDFNetworkConfig
    from neuraludf_tpu.mesh.meshudf import differentiable_vertices, get_mesh_udf
    from neuraludf_tpu.nets import fields

    cfg = UDFNetworkConfig(d_out=17, d_hidden=16, n_layers=3, skip_in=(), multires=2)
    params = {"udf": fields.init_distance_field(jax.random.PRNGKey(0), cfg)}
    verts, faces = get_mesh_udf(params, cfg, resolution=32, refine=False)
    assert len(verts) > 0

    def centroid_y(p):
        nv = differentiable_vertices(p["udf"], cfg, verts, faces, border_gradients=True)
        return jnp.mean(nv[:, 1])

    val, grads = jax.value_and_grad(centroid_y)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
    assert np.isfinite(float(val)) and np.isfinite(total)
    assert total > 0  # gradient actually flows into the field parameters

    # the border term is value-wise a no-op (ref: s_border == 0 numerically)
    nv_plain = differentiable_vertices(params["udf"], cfg, verts, faces)
    nv_border = differentiable_vertices(params["udf"], cfg, verts, faces, border_gradients=True)
    np.testing.assert_allclose(np.asarray(nv_border), np.asarray(nv_plain), atol=1e-6)
