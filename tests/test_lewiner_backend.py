"""Lewiner-table triangulation backend (VERDICT r2 #5).

Validates the native Lewiner engine (mesh/csrc/lewiner.cpp behind the same
C ABI, selectable via algorithm='lewiner') at the TOPOLOGY level — connected
components, Euler characteristics, boundary loops — against the reference
Cython extractor on ambiguous-config adversarial grids, where marching
tetrahedra may tile differently (ref: _marching_cubes_lewiner_cy.pyx:
1847-2569 the_big_switch, :2403 test_face, :2435 test_internal).
"""

import numpy as np
import pytest

from neuraludf_tpu.mesh.mc import marching_cubes_classic, marching_cubes_udf

from reference_mc import build_reference_mc

ref_wrapper = build_reference_mc()

N = 48
VOXEL = 2.0 / (N - 1)


# ---------------------------------------------------------------------------
# topology helpers
# ---------------------------------------------------------------------------

def _components(n_verts, faces):
    parent = np.arange(n_verts)

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for f in faces:
        a, b, c = find(f[0]), find(f[1]), find(f[2])
        parent[a] = b
        parent[find(b)] = find(c)
    roots = np.array([find(v) for v in range(n_verts)])
    return roots


def _boundary_edges(faces):
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    e = np.sort(e, axis=1)
    uniq, counts = np.unique(e, axis=0, return_counts=True)
    return uniq[counts == 1]


def _boundary_loop_count(be):
    if len(be) == 0:
        return 0
    vids = np.unique(be)
    remap = {v: i for i, v in enumerate(vids)}
    parent = np.arange(len(vids))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in be:
        parent[find(remap[u])] = find(remap[v])
    return len({find(i) for i in range(len(vids))})


def topology_signature(verts, faces):
    """(n_components, sorted per-component Euler characteristics,
    total boundary loops) — orientation- and tessellation-agnostic."""
    faces = np.asarray(faces, np.int64)
    used = np.unique(faces)
    roots = _components(len(verts), faces)
    comp_of_face = roots[faces[:, 0]]
    chis = []
    n_loops = 0
    for comp in np.unique(comp_of_face):
        f = faces[comp_of_face == comp]
        vs = np.unique(f)
        e = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]])
        e = np.unique(np.sort(e, axis=1), axis=0)
        chi = len(vs) - len(e) + len(f)
        chis.append(int(chi))
        n_loops += _boundary_loop_count(_boundary_edges(f))
    return len(chis), tuple(sorted(chis)), n_loops


# ---------------------------------------------------------------------------
# adversarial fields: band-limited random trig fields produce saddle-rich
# iso-surfaces (handles, tunnels, multiple blobs) that exercise the
# ambiguous MC cases 3/4/6/7/10/12/13
# ---------------------------------------------------------------------------

def _random_field(seed):
    rng = np.random.RandomState(seed)
    xs = np.linspace(-1, 1, N, dtype=np.float64)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    f = np.zeros_like(gx)
    for _ in range(6):
        k = rng.uniform(1.0, 3.0, 3) * np.pi
        ph = rng.uniform(0, 2 * np.pi, 3)
        amp = rng.uniform(0.5, 1.0)
        f += amp * np.cos(k[0] * gx + ph[0]) * np.cos(k[1] * gy + ph[1]) * np.cos(k[2] * gz + ph[2])
    f -= f.mean()
    # kill the volume boundary so surfaces close inside the grid
    envelope = ((1 - gx ** 2) * (1 - gy ** 2) * (1 - gz ** 2)) ** 0.5
    return (f * envelope + 0.05).astype(np.float32)


def _udf_inputs(sdf):
    """|sdf| + banded -normalized gradients of |sdf| (the MeshUDF grid
    contract) from central differences."""
    udf = np.abs(sdf)
    g = np.stack(np.gradient(udf.astype(np.float64), 2.0 / (N - 1)), axis=-1)
    g = g / np.maximum(np.linalg.norm(g, axis=-1, keepdims=True), 1e-9)
    g = (-g).astype(np.float32)
    g[udf >= 2 * VOXEL] = 0.0
    return udf.astype(np.float32), g


def _ambiguous_cases_present(sdf):
    """Count cubes whose sign config is NOT one of the trivially
    unambiguous Lewiner classes (0, 1, 2, 5, 8, 9, 11, 14)."""
    inside = sdf > 0
    cfg = np.zeros((N - 1, N - 1, N - 1), np.int32)
    corners = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
               (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)]
    for bit, (i, j, k) in enumerate(corners):
        cfg |= inside[i:N - 1 + i, j:N - 1 + j, k:N - 1 + k].astype(np.int32) << bit
    # case lookup via the same published table the engine uses
    import re, base64
    # trivially-unambiguous classes
    trivial = {0, 1, 2, 5, 8, 9, 11, 14}
    # parse CASES from the generated header
    hdr = open("neuraludf_tpu/mesh/csrc/lewiner_luts.h").read()
    m = re.search(r"CASES\[256\]\[2\] = \{(.*?)\};", hdr, re.S)
    rows = re.findall(r"\{(-?\d+), (-?\d+)\}", m.group(1))
    case_of = np.array([int(a) for a, _ in rows], np.int32)
    cases = case_of[cfg.reshape(-1)]
    return int(np.sum(~np.isin(cases, list(trivial))))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_lewiner_classic_topology_matches_tets_geometry(seed):
    """Both backends extract the same surface geometrically; the Lewiner
    tiling is minimal (fewer faces) and at least as clean topologically."""
    from scipy.spatial import cKDTree

    sdf = _random_field(seed)
    assert _ambiguous_cases_present(sdf) > 20  # the grids ARE adversarial

    v_t, f_t = marching_cubes_classic(sdf, 0.0, algorithm="tets")
    v_l, f_l = marching_cubes_classic(sdf, 0.0, algorithm="lewiner")
    assert len(f_l) > 100
    assert len(f_l) < len(f_t)  # minimal tiling

    d = cKDTree(v_t).query(v_l, k=1)[0]
    assert d.mean() < VOXEL / 4

    # closed field -> closed surface from the Lewiner tables (topological
    # guarantee); tets can leave no boundary either on classic grids
    assert len(_boundary_edges(np.asarray(f_l, np.int64))) == 0


def _torus_inputs(rot):
    xs = np.linspace(-1, 1, N, dtype=np.float64)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    pts = np.stack([gx, gy, gz], -1)
    if rot is not None:
        from scipy.spatial.transform import Rotation

        Rm = Rotation.from_rotvec(rot).as_matrix()
        pts = pts @ Rm.T
    R0, r0 = 0.55, 0.2
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    rho = np.sqrt(x ** 2 + y ** 2)
    d = np.sqrt((rho - R0) ** 2 + z ** 2)
    udf = np.abs(d - r0)
    s = np.sign(d - r0)
    dd = np.stack([
        (rho - R0) / np.maximum(d, 1e-9) * np.where(rho > 1e-9, x / np.maximum(rho, 1e-9), 0),
        (rho - R0) / np.maximum(d, 1e-9) * np.where(rho > 1e-9, y / np.maximum(rho, 1e-9), 0),
        z / np.maximum(d, 1e-9),
    ], -1)
    g = s[..., None] * dd
    if rot is not None:
        g = g @ Rm
    g = -(g / np.maximum(np.linalg.norm(g, axis=-1, keepdims=True), 1e-9))
    g[udf >= 2 * VOXEL] = 0
    return udf.astype(np.float32), g.astype(np.float32)


def _two_spheres_inputs(gap_voxels):
    """Two spheres along the grid DIAGONAL at a controlled surface gap —
    the near-tangency region is saddle-rich (ambiguous cases 3/6/10/12),
    where the face/interior tests decide merge vs split."""
    xs = np.linspace(-1, 1, N, dtype=np.float64)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    R = 0.4
    d = (2 * R + gap_voxels * VOXEL) / 2
    u = np.array([1.0, 1.0, 1.0]) / np.sqrt(3)
    c1, c2 = d * u, -d * u
    d1 = np.sqrt((gx - c1[0]) ** 2 + (gy - c1[1]) ** 2 + (gz - c1[2]) ** 2) - R
    d2 = np.sqrt((gx - c2[0]) ** 2 + (gy - c2[1]) ** 2 + (gz - c2[2]) ** 2) - R
    sdf = np.minimum(d1, d2)
    return _udf_inputs(sdf.astype(np.float32))


@pytest.mark.skipif(ref_wrapper is None,
                    reason="reference Cython extractor could not be built")
@pytest.mark.parametrize("rot", [None, (0.3, 0.5, 0.2)],
                         ids=["axis_aligned", "rotated"])
def test_lewiner_topology_matches_reference_torus(rot):
    """Full pipeline (pseudo-sign BFS + Lewiner tiling) vs the reference
    extractor on a true-distance torus: identical topology signature —
    1 component, Euler characteristic 0 (genus 1), 0 boundary loops."""
    udf, grads = _torus_inputs(rot)
    v_o, f_o = marching_cubes_udf(udf, grads, VOXEL, algorithm="lewiner")
    v_r, f_r, _, _ = ref_wrapper.udf_mc_lewiner(udf, grads, spacing=[VOXEL] * 3)
    sig_o = topology_signature(v_o, f_o)
    sig_r = topology_signature(v_r, np.asarray(f_r, np.int64))
    assert sig_o == sig_r == (1, (0,), 0), (sig_o, sig_r)


@pytest.mark.skipif(ref_wrapper is None,
                    reason="reference Cython extractor could not be built")
def test_lewiner_topology_matches_reference_near_tangency():
    """Near-tangent diagonal spheres at decisive gaps: the Lewiner backend
    reproduces the reference's ambiguous-case resolutions EXACTLY (identical
    component count / Euler characteristics / boundary loops), while the
    tets backend resolves at least one of them differently — demonstrating
    the test discriminates tilings, and the backend closes the topology gap
    (VERDICT r2 missing #2). Knife-edge gaps (<~0.3 voxel) are excluded:
    there the |min|-field's pseudo-sign votes are numerically borderline
    and both pipelines fragment nondeterministically."""
    tets_differs = 0
    for gap in (-0.6, 0.6, 1.5):
        udf, grads = _two_spheres_inputs(gap)
        v_o, f_o = marching_cubes_udf(udf, grads, VOXEL, algorithm="lewiner")
        v_t, f_t = marching_cubes_udf(udf, grads, VOXEL, algorithm="tets")
        v_r, f_r, _, _ = ref_wrapper.udf_mc_lewiner(udf, grads, spacing=[VOXEL] * 3)
        sig_o = topology_signature(v_o, f_o)
        sig_t = topology_signature(v_t, f_t)
        sig_r = topology_signature(v_r, np.asarray(f_r, np.int64))
        assert sig_o == sig_r, (gap, sig_o, sig_r)
        if sig_t != sig_r:
            tets_differs += 1
    assert tets_differs >= 1  # the scenes DO discriminate the tilings
