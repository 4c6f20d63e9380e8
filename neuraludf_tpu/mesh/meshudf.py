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


def get_mesh_udf(
    params,
    cfg: UDFNetworkConfig,
    *,
    resolution: int = 128,
    eps: float = 0.005,
    dist_threshold_ratio: float = 1.0,
    smooth: bool = True,
    refine: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Returns (verts [V,3] in normalized scene coords, faces [F,3])."""
    N = resolution
    voxel_size = 2.0 / (N - 1)

    udf, normals = grid_mod.udf_and_normals_grid(params, cfg, N)
    udf = np.maximum(udf, 0.0)

    verts, faces = marching_cubes_udf(udf, normals, voxel_size)
    if len(verts) == 0:
        return verts, faces
    verts = verts * voxel_size - 1.0  # grid-index units -> [-1, 1]³

    # 3: drop faces with any vertex far from the zero level set
    pred_df = grid_mod.query_udf_at(params, cfg, verts)
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
        s1 = grid_mod.query_udf_at(params, cfg, verts + eps * n)
        s2 = grid_mod.query_udf_at(params, cfg, verts - eps * n)
        verts = verts + eps * (s2 - s1)[:, None] * n

    return verts.astype(np.float32), faces.astype(np.int32)
