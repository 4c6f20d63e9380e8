"""MeshUDF: gradient-aware open-mesh extraction from a trained UDF.

Pipeline (ref: extract_mesh.py:169-354):
  1. TPU grid fill: UDF + near-surface negated normalized gradients
  2. native pseudo-sign voting marching cubes (C++: csrc/udf_mc.cpp)
  3. drop faces whose re-queried vertex UDF exceeds voxel*dist_threshold
  4. cleanup loop (dedupe / degenerate / fill holes until stable)
  5. border Laplacian smoothing
  6. vertex refinement v' = v + eps*(f(v-eps n) - f(v+eps n))*n
     (the reference's differentiable-vertex trick; positionally identical)
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..config import UDFNetworkConfig
from . import grid as grid_mod
from . import process
from .mc import marching_cubes_udf


def next_update_indices(verts: np.ndarray, resolution: int) -> np.ndarray:
    """Linear grid indices to re-query at the next incremental extraction:
    the voxel of every mesh vertex plus its 6 axis neighbors
    (ref: extract_mesh.py:289-304)."""
    N = resolution
    voxel_size = 2.0 / (N - 1)
    ijk = np.clip(((verts + 1.0) / voxel_size).astype(np.int64), 0, N - 1)
    i, j, k = ijk[:, 0], ijk[:, 1], ijk[:, 2]
    lin = lambda a, b, c: a * N * N + b * N + c
    return np.concatenate([
        lin(i, j, k),
        lin(np.minimum(i + 1, N - 1), j, k),
        lin(i, np.minimum(j + 1, N - 1), k),
        lin(i, j, np.minimum(k + 1, N - 1)),
        lin(np.maximum(i - 1, 0), j, k),
        lin(i, np.maximum(j - 1, 0), k),
        lin(i, j, np.maximum(k - 1, 0)),
    ])


def get_mesh_udf(
    params,
    cfg: UDFNetworkConfig,
    *,
    resolution: int = 128,
    eps: float = 0.005,
    dist_threshold_ratio: float = 1.0,
    smooth: bool = True,
    refine: bool = True,
    cache: dict = None,
    signed: bool = False,
    algorithm: str = "tets",
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (verts [V,3] in normalized scene coords, faces [F,3]).

    Pass a dict as `cache` (persist it between calls) to enable the
    incremental grid re-query between successive extractions of the same
    field (ref: extract_mesh.py:108-166): after the first full fill, only
    voxels around the previous surface are re-evaluated.

    `signed=True` extracts from a signed field (model_type='neus'): the
    grid holds |sdf| with ∇|sdf| gradients, exactly the unsigned pattern
    the pseudo-sign BFS expects (ref: exp_runner_blending.py:773-775).

    `algorithm`: cube triangulation backend — 'tets' (marching tetrahedra)
    or 'lewiner' (the reference's Lewiner-table topology engine).
    """
    N = resolution
    voxel_size = 2.0 / (N - 1)

    if cache is not None:
        udf, normals, new_cache = grid_mod.udf_and_normals_grid_incremental(
            params, cfg, N, cache if cache else None, signed=signed
        )
        cache.clear()
        cache.update(new_cache)
    else:
        udf, normals = grid_mod.udf_and_normals_grid(params, cfg, N, signed)
    udf = np.maximum(udf, 0.0)

    verts, faces = marching_cubes_udf(udf, normals, voxel_size, algorithm=algorithm)
    if len(verts) == 0:
        return verts, faces
    verts = verts * voxel_size - 1.0  # grid-index units -> [-1, 1]³

    # 3: drop faces with any vertex far from the zero level set
    pred_df = grid_mod.query_udf_at(params, cfg, verts, signed)
    dist_threshold = voxel_size * dist_threshold_ratio
    keep = np.max(pred_df[faces], axis=1) < dist_threshold
    faces = faces[keep]
    verts, faces = process.remove_unreferenced(verts, faces)

    # 4: cleanup until stable
    verts, faces = process.process_until_stable(verts, faces)

    # 5: border smoothing
    if smooth and len(faces):
        verts = process.smooth_borders(verts, faces)

    # 6: normal-direction refinement (value part of the reference's
    # differentiable re-plug, ref: extract_mesh.py:276-287)
    if refine and len(faces):
        n = process.vertex_normals(verts, faces)
        s1 = grid_mod.query_udf_at(params, cfg, verts + eps * n, signed)
        s2 = grid_mod.query_udf_at(params, cfg, verts - eps * n, signed)
        verts = verts + eps * (s2 - s1)[:, None] * n

    if cache is not None and len(verts):
        cache["indices"] = next_update_indices(np.asarray(verts), N)

    return verts.astype(np.float32), faces.astype(np.int32)


def differentiable_vertices(
    params,
    cfg: UDFNetworkConfig,
    verts: np.ndarray,
    faces: np.ndarray,
    *,
    eps: float = 0.005,
    border_gradients: bool = False,
):
    """Differentiable mesh vertices for mesh-optimization workflows.

    The MeshUDF re-plug trick (ref: extract_mesh.py:276-287): v' =
    v - eps*f(v+eps*n)*n + eps*f(v-eps*n)*n, evaluated through the live
    field so d(v')/d(params) flows (the reference evaluates under no_grad,
    making its version value-only). With `border_gradients`, rim vertices
    additionally get the reference's tangential term (ref: :306-352):
    s_border = eps*(out_df - stop_gradient(out_df)) — value-wise zero,
    but it routes gradient from the border UDF values into the vertex
    positions along the outward rim direction.

    Returns a jnp array [V,3]; intended for eager (non-jit) use on the
    concrete meshes produced by get_mesh_udf.
    """
    import jax
    import jax.numpy as jnp

    from ..nets import fields

    n = jnp.asarray(process.vertex_normals(np.asarray(verts), np.asarray(faces)))
    v = jnp.asarray(verts, jnp.float32)
    udf = lambda pts: fields.distance_value(params, pts, cfg)
    s1 = udf(v + eps * n)
    s2 = udf(v - eps * n)
    new_verts = v - eps * s1 * n + eps * s2 * n

    if border_gradients:
        faces_np = np.asarray(faces)
        e = np.concatenate([faces_np[:, [0, 1]], faces_np[:, [1, 2]], faces_np[:, [2, 0]]])
        e = np.sort(e, axis=1)
        uniq, idx, counts = np.unique(e, axis=0, return_index=True, return_counts=True)
        border = uniq[counts == 1]
        if len(border):
            # one border edge per border vertex (ref: :311-318)
            d = {}
            for u_, v_ in border:
                d[int(u_)] = int(v_)
                d[int(v_)] = int(u_)
            uv = np.array(list(d.items()), np.int64)
            u_b, v_b = uv[:, 0], uv[:, 1]
            edge = jnp.asarray(verts[v_b] - verts[u_b], jnp.float32)
            out_vec = jnp.cross(edge, n[u_b])
            out_vec = out_vec / (jnp.linalg.norm(out_vec, axis=1, keepdims=True) + 1e-6)
            vb = jnp.asarray(verts[u_b], jnp.float32)
            s1b = udf(vb + 3 * eps * out_vec)
            s2b = udf(vb - 3 * eps * out_vec)
            sign = (-jnp.argmax(jnp.stack([s1b, s2b]), axis=0) * 2 + 1).astype(jnp.float32)
            out_vec = sign * out_vec
            keep = np.asarray(jax.lax.stop_gradient(s1b + s2b))[:, 0] > eps  # real rims only
            if keep.any():
                out_df = jnp.maximum(s1b, s2b)[keep]
                s_border = eps * (out_df - jax.lax.stop_gradient(out_df))
                new_verts = new_verts.at[u_b[keep]].add(-s_border * out_vec[keep])
    return new_verts
