"""Host-side mesh cleanup (numpy/scipy; trimesh is unavailable).

Implements the subset of trimesh operations the reference MeshUDF pipeline
relies on (ref: extract_mesh.py:216-265): duplicate-vertex merging,
degenerate/duplicate-face removal, single-triangle hole filling, border
Laplacian smoothing, and area-weighted vertex normals.
"""

from __future__ import annotations

from collections import defaultdict
import numpy as np
from scipy.sparse import coo_matrix


def merge_duplicate_vertices(verts: np.ndarray, faces: np.ndarray, decimals: int = 8):
    key = np.round(verts, decimals)
    _, first_idx, inverse = np.unique(key, axis=0, return_index=True, return_inverse=True)
    inverse = inverse.reshape(-1)
    new_verts = verts[first_idx]
    new_faces = inverse[faces]
    return new_verts, new_faces


def remove_bad_faces(verts: np.ndarray, faces: np.ndarray):
    """Drop degenerate (repeated-index or zero-area) and duplicate faces."""
    if len(faces) == 0:
        return faces
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    faces = faces[ok]
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    area2 = np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1)
    faces = faces[area2 > 1e-16]
    # duplicates irrespective of winding (packed 1-D keys: axis=0 unique
    # on millions of rows is far slower)
    s = np.sort(faces, axis=1).astype(np.int64)
    if s.max(initial=0) < (1 << 21):
        key = (s[:, 0] << 42) | (s[:, 1] << 21) | s[:, 2]
        _, keep = np.unique(key, return_index=True)
    else:  # >2M vertices: fall back to row-wise unique
        _, keep = np.unique(s, axis=0, return_index=True)
    return faces[np.sort(keep)]


def remove_unreferenced(verts: np.ndarray, faces: np.ndarray):
    used = np.unique(faces)
    remap = -np.ones(len(verts), np.int64)
    remap[used] = np.arange(len(used))
    return verts[used], remap[faces].astype(faces.dtype)


def boundary_edges(faces: np.ndarray) -> np.ndarray:
    """Edges referenced by exactly one face: [E, 2] sorted vertex pairs.

    Edges are packed into int64 keys — np.unique(axis=0) over millions of
    rows costs ~100x more than a 1-D unique."""
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    e = np.sort(e, axis=1).astype(np.int64)
    key = e[:, 0] << 32 | e[:, 1]
    uniq, counts = np.unique(key, return_counts=True)
    single = uniq[counts == 1]
    return np.stack([single >> 32, single & 0xFFFFFFFF], axis=1).astype(faces.dtype)


def fill_single_triangle_holes(verts: np.ndarray, faces: np.ndarray):
    """Close boundary loops of length 3 (trimesh.fill_holes subset)."""
    be = boundary_edges(faces)
    if len(be) == 0:
        return faces
    adj = defaultdict(set)
    for u, v in be:
        adj[u].add(v)
        adj[v].add(u)
    new_faces = []
    seen = set()
    for u, vs in adj.items():
        for v in vs:
            for w in adj[v]:
                if w != u and w in adj[u]:
                    tri = tuple(sorted((u, v, w)))
                    if tri not in seen:
                        seen.add(tri)
                        new_faces.append(tri)
    if new_faces:
        faces = np.concatenate([faces, np.array(new_faces, faces.dtype)])
    return faces


def process_until_stable(verts: np.ndarray, faces: np.ndarray, max_iter: int = 10):
    """Reference cleanup loop (ref: extract_mesh.py:218-236)."""
    prev = (-1, -1)
    for _ in range(max_iter):
        verts, faces = merge_duplicate_vertices(verts, faces)
        faces = remove_bad_faces(verts, faces)
        faces = fill_single_triangle_holes(verts, faces)
        verts, faces = remove_unreferenced(verts, faces)
        if (len(verts), len(faces)) == prev:
            break
        prev = (len(verts), len(faces))
    return verts, faces


def smooth_borders(verts: np.ndarray, faces: np.ndarray, lam: float = 0.3, iters: int = 5):
    """Laplacian smoothing of open-boundary vertices
    (ref: extract_mesh.py:238-265)."""
    be = boundary_edges(faces)
    if len(be) == 0:
        return verts
    neighbours = defaultdict(list)
    for u, v in be:
        neighbours[u].append(v)
        neighbours[v].append(u)
    border_vertices = np.array(list(neighbours.keys()))
    pos_i, pos_j = [], []
    for k, ns in enumerate(neighbours.values()):
        for j in ns:
            pos_i.append(k)
            pos_j.append(j)
    sparse = coo_matrix(
        (np.ones(len(pos_i)), (pos_i, pos_j)), shape=(len(border_vertices), len(verts))
    )
    verts = verts.copy()
    for _ in range(iters):
        avg = np.asarray(sparse @ verts) / np.asarray(sparse.sum(axis=1))
        lap = avg - verts[border_vertices]
        verts[border_vertices] = verts[border_vertices] + lam * lap
    return verts


def vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals (stand-in for trimesh's angle-weighted
    ones, ref: extract_mesh.py:272-275)."""
    fn = np.cross(
        verts[faces[:, 1]] - verts[faces[:, 0]], verts[faces[:, 2]] - verts[faces[:, 0]]
    )
    vn = np.zeros_like(verts)
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    norm = np.linalg.norm(vn, axis=-1, keepdims=True)
    return vn / np.maximum(norm, 1e-12)
