"""Golden mesh-level cross-check: our native pseudo-sign marching-cubes
engine (mesh/csrc/udf_mc.cpp, marching-tetrahedra triangulation) vs the
REFERENCE Cython extractor (custom_mc/_marching_cubes_lewiner_cy.pyx:1115,
Lewiner-table triangulation), run on identical analytic UDF grids.

Asserts (VERDICT r1 next-round #3): bidirectional Chamfer < voxel/2,
boundary-edge behavior parity (closed stays closed, open rims agree in
length), and nearest-face normal consistency.
"""

import numpy as np
import pytest

from neuraludf_tpu.mesh.mc import marching_cubes_udf

from reference_mc import build_reference_mc

ref_wrapper = build_reference_mc()

pytestmark = pytest.mark.skipif(
    ref_wrapper is None, reason="reference Cython extractor could not be built"
)

N = 64
VOXEL = 2.0 / (N - 1)
CENTER = np.array([0.08, -0.05, 0.13], np.float32)  # asymmetric: catches axis mixups
RADIUS = 0.55
CUT_N = np.array([0.3, 0.9, 0.2], np.float32) / np.linalg.norm([0.3, 0.9, 0.2])
CUT_D = 0.2 * RADIUS


def _shell_udf(p, open_shell: bool):
    """Exact UDF of a sphere shell, optionally cut by the plane
    n·(p-c) <= d (open shell with a circular rim)."""
    q = p - CENTER
    rad = np.linalg.norm(q, axis=-1)
    d_sphere = np.abs(rad - RADIUS)
    if not open_shell:
        return d_sphere
    h = q @ CUT_N
    v = q - h[:, None] * CUT_N[None]
    rho = np.linalg.norm(v, axis=-1)
    # nearest point on the full sphere is at height r*h/rad; kept iff <= d
    keep = RADIUS * h / np.maximum(rad, 1e-9) <= CUT_D
    s = np.sqrt(RADIUS ** 2 - CUT_D ** 2)
    d_rim = np.sqrt((h - CUT_D) ** 2 + (rho - s) ** 2)
    return np.where(keep, d_sphere, d_rim)


def _grid(open_shell: bool):
    xs = np.linspace(-1, 1, N, dtype=np.float32)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    udf = _shell_udf(pts, open_shell).astype(np.float32)
    # numerical gradients (central differences), -normalized, masked to the
    # near band like the reference grid fill (ref: extract_mesh.py:77-98)
    eps = 1e-4
    g = np.zeros((len(pts), 3), np.float32)
    for a in range(3):
        dp = np.zeros(3, np.float32)
        dp[a] = eps
        g[:, a] = (_shell_udf(pts + dp, open_shell) - _shell_udf(pts - dp, open_shell)) / (2 * eps)
    g = -g / np.maximum(np.linalg.norm(g, axis=-1, keepdims=True), 1e-9)
    g[udf >= 2 * VOXEL] = 0.0
    return udf.reshape(N, N, N), g.reshape(N, N, N, 3), pts


def _filter_far_faces(verts, faces, open_shell):
    d = _shell_udf(verts.astype(np.float32), open_shell)
    keep = np.max(d[faces], axis=1) < VOXEL  # dist_threshold_ratio=1 both sides
    return faces[keep]


def _ours(udf, grads, open_shell):
    verts, faces = marching_cubes_udf(udf, grads, VOXEL)
    verts = verts * VOXEL - 1.0
    return verts, _filter_far_faces(verts, faces, open_shell)


def _reference(udf, grads, open_shell):
    verts, faces, _, _ = ref_wrapper.udf_mc_lewiner(udf, grads, spacing=[VOXEL] * 3)
    verts = verts - 1.0
    return verts.astype(np.float32), _filter_far_faces(verts, faces.astype(np.int64), open_shell)


def _surface_samples(verts, faces):
    mids = verts[faces].mean(axis=1)
    return np.concatenate([verts, mids])


def _boundary_edges(faces):
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    e = np.sort(e, axis=1)
    _, idx, counts = np.unique(e, axis=0, return_index=True, return_counts=True)
    return e[idx[counts == 1]]


def _face_normals(verts, faces):
    a, b, c = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    n = np.cross(b - a, c - a)
    return n / np.maximum(np.linalg.norm(n, axis=-1, keepdims=True), 1e-12)


@pytest.mark.parametrize("open_shell", [False, True], ids=["closed_sphere", "open_shell"])
def test_engine_matches_reference_extractor(open_shell):
    from scipy.spatial import cKDTree

    udf, grads, _ = _grid(open_shell)
    v_o, f_o = _ours(udf, grads, open_shell)
    v_r, f_r = _reference(udf, grads, open_shell)
    assert len(f_o) > 100 and len(f_r) > 100

    # --- bidirectional Chamfer < voxel/2
    s_o = _surface_samples(v_o, f_o)
    s_r = _surface_samples(v_r, f_r)
    d_or = cKDTree(s_r).query(s_o, k=1)[0]
    d_ro = cKDTree(s_o).query(s_r, k=1)[0]
    chamfer = 0.5 * (d_or.mean() + d_ro.mean())
    assert chamfer < VOXEL / 2, (chamfer, VOXEL)
    # no stray geometry: worst-case deviation bounded too
    assert max(d_or.max(), d_ro.max()) < 3 * VOXEL

    # --- boundary-edge parity
    be_o = _boundary_edges(f_o)
    be_r = _boundary_edges(f_r)

    def rim_length(verts, be):
        return float(np.linalg.norm(verts[be[:, 0]] - verts[be[:, 1]], axis=1).sum())

    if not open_shell:
        # closed surface: boundary edges are rare cleanup debris on both
        assert len(be_o) <= 0.02 * len(f_o) * 3
        assert len(be_r) <= 0.02 * len(f_r) * 3
    else:
        # open shell: a real rim on both sides, with matching total length
        gt_rim = 2 * np.pi * np.sqrt(RADIUS ** 2 - CUT_D ** 2)
        len_o, len_r = rim_length(v_o, be_o), rim_length(v_r, be_r)
        assert len_o > 0.5 * gt_rim and len_r > 0.5 * gt_rim
        assert abs(len_o - len_r) < 0.35 * max(len_o, len_r), (len_o, len_r, gt_rim)
        # rims lie on the same circle: boundary verts of ours are close to
        # boundary verts of the reference
        bv_o = v_o[np.unique(be_o)]
        bv_r = v_r[np.unique(be_r)]
        d_rim = cKDTree(bv_r).query(bv_o, k=1)[0]
        assert np.median(d_rim) < VOXEL, float(np.median(d_rim))

    # --- normal consistency: nearest-face normals agree (winding-agnostic)
    n_o = _face_normals(v_o, f_o)
    n_r = _face_normals(v_r, f_r)
    c_o = v_o[f_o].mean(axis=1)
    c_r = v_r[f_r].mean(axis=1)
    nearest = cKDTree(c_r).query(c_o, k=1)[1]
    dots = np.abs(np.sum(n_o * n_r[nearest], axis=1))
    assert dots.mean() > 0.9, float(dots.mean())


def test_classic_mc_recovers_reference_surface():
    """Our classic (signed) MC on the SDF vs the reference UDF extractor on
    the matching unsigned field: both must recover the same closed surface.
    (The reference's compiled module only exports `marching_cubes_udf`;
    its signed classic path goes through PyMCubes, ref: exp_runner:746-761.)"""
    from scipy.spatial import cKDTree

    from neuraludf_tpu.mesh.mc import marching_cubes_classic

    xs = np.linspace(-1, 1, N, dtype=np.float32)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    sdf = (
        np.sqrt((gx - CENTER[0]) ** 2 + (gy - CENTER[1]) ** 2 + (gz - CENTER[2]) ** 2)
        - RADIUS
    ).astype(np.float32)

    v_o, _ = marching_cubes_classic(sdf, 0.0)
    v_o = v_o * VOXEL - 1.0

    udf, grads, _ = _grid(open_shell=False)
    v_r, _ = _reference(udf, grads, open_shell=False)
    d = cKDTree(v_r).query(np.asarray(v_o), k=1)[0]
    assert d.mean() < VOXEL / 2
