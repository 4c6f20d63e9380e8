"""Chunked TPU grid queries for mesh extraction.

The massively parallel part of MeshUDF: fill an N³ grid with UDF values and
(where the field is near zero) normalized gradients. Replaces the
reference's chunked torch queries (ref: extract_mesh.py:18-105,
udf_renderer_blending.py:16-49) with fixed-shape jitted evaluations; the
gradient pass only touches near-surface points (gathered host-side, padded
to the chunk size).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import UDFNetworkConfig
from ..nets import fields

CHUNK = 1 << 20  # points per jitted evaluation (matches the reference batch, ref: extract_mesh.py:18)


@lru_cache(maxsize=8)
def _udf_chunk_fn(cfg: UDFNetworkConfig, signed: bool = False):
    """`signed=True` (model_type='neus'): the field is a signed distance;
    MeshUDF consumes |sdf| (ref: exp_runner_blending.py:774)."""

    @jax.jit
    def f(udf_params, pts):
        v = fields.distance_value(udf_params, pts, cfg)[:, 0]
        return jnp.abs(v) if signed else v

    return f


@lru_cache(maxsize=8)
def _udf_grid_chunk_fn(cfg: UDFNetworkConfig, resolution: int, signed: bool = False):
    """Evaluate a contiguous linear-index chunk of the grid with the points
    generated ON DEVICE — uploading grid coordinates over a remote-TPU
    tunnel dominates extraction time otherwise (measured 216 s of a 512-grid
    fill was point upload)."""

    @jax.jit
    def f(udf_params, start, bmin, bmax):
        R = resolution
        lin = start + jnp.arange(CHUNK)
        k = lin % R
        j = (lin // R) % R
        i = (lin // (R * R)) % R
        frac = jnp.stack([i, j, k], axis=-1).astype(jnp.float32) / (R - 1)
        pts = bmin[None, :] + frac * (bmax - bmin)[None, :]
        v = fields.distance_value(udf_params, pts, cfg)[:, 0]
        return jnp.abs(v) if signed else v

    return f


@lru_cache(maxsize=8)
def _grad_chunk_fn(cfg: UDFNetworkConfig, signed: bool = False):
    """Normalized spatial gradient. For a signed field this is the gradient
    of |sdf| (= sign(sdf)·∇sdf) so the pseudo-sign voting BFS sees the same
    opposing-gradient pattern across the surface as a genuine UDF."""

    @jax.jit
    def f(udf_params, pts):
        if signed:
            v = fields.distance_value(udf_params, pts, cfg)[:, 0]
            g = fields.distance_gradient(udf_params, pts, cfg)
            g = g * jnp.sign(v)[:, None]
        else:
            g = fields.distance_gradient(udf_params, pts, cfg)
        return g / (jnp.linalg.norm(g, axis=-1, keepdims=True) + 1e-5)

    return f


def _query_chunked(fn, udf_params, pts: np.ndarray) -> np.ndarray:
    n = pts.shape[0]
    pad = (-n) % CHUNK
    pts_p = np.concatenate([pts, np.zeros((pad, 3), np.float32)]) if pad else pts
    outs = []
    for i in range(0, n + pad, CHUNK):
        outs.append(np.asarray(fn(udf_params, jnp.asarray(pts_p[i : i + CHUNK]))))
    out = np.concatenate(outs)[:n]
    return out


def grid_points(bound_min, bound_max, resolution: int) -> np.ndarray:
    xs = np.linspace(bound_min[0], bound_max[0], resolution, dtype=np.float32)
    ys = np.linspace(bound_min[1], bound_max[1], resolution, dtype=np.float32)
    zs = np.linspace(bound_min[2], bound_max[2], resolution, dtype=np.float32)
    gx, gy, gz = np.meshgrid(xs, ys, zs, indexing="ij")
    return np.stack([gx, gy, gz], axis=-1).reshape(-1, 3)


def extract_fields(params, cfg: UDFNetworkConfig, bound_min, bound_max, resolution: int,
                   signed: bool = False) -> np.ndarray:
    """Distance values on an axis-aligned grid: [R, R, R] (axis0 = x).

    Points are generated on device (only values cross the host boundary).
    `signed=True` returns |value| (neus/SDF MeshUDF route); the raw field
    dump paths (validate_fields/save_hdf5) keep signed=False and so emit
    the signed values for an SDF, like the reference's sdf closures
    (ref: exp_runner_blending.py:810-824)."""
    R = resolution
    n = R ** 3
    fn = _udf_grid_chunk_fn(cfg, R, signed)
    bmin = jnp.asarray(np.asarray(bound_min, np.float32))
    bmax = jnp.asarray(np.asarray(bound_max, np.float32))
    outs = []
    for start in range(0, n, CHUNK):
        outs.append(np.asarray(fn(params["udf"], start, bmin, bmax)))
    u = np.concatenate(outs)[:n]
    return u.reshape(R, R, R)


def extract_gradient_fields(params, cfg: UDFNetworkConfig, bound_min, bound_max, resolution: int) -> np.ndarray:
    pts = grid_points(bound_min, bound_max, resolution)
    g = _query_chunked(_grad_chunk_fn(cfg), params["udf"], pts)
    return g.reshape(resolution, resolution, resolution, 3)


def udf_and_normals_grid(
    params, cfg: UDFNetworkConfig, resolution: int, signed: bool = False
) -> Tuple[np.ndarray, np.ndarray]:
    """MeshUDF grid fill over [-1, 1]³ (ref: extract_mesh.py:18-105).

    Returns (udf [N³ grid], normals [N³ grid, 3]) where normals are the
    NEGATED normalized gradients (pointing toward the surface), evaluated
    only where udf < 2 * voxel_size; zero elsewhere.
    """
    N = resolution
    voxel_size = 2.0 / (N - 1)
    udf = extract_fields(params, cfg, [-1, -1, -1], [1, 1, 1], N, signed).reshape(-1)

    normals = np.zeros((N ** 3, 3), np.float32)
    near = np.where(udf < 2 * voxel_size)[0]
    if near.size:
        # decode linear indices -> coordinates directly (materializing the
        # full N^3 x 3 grid on host costs gigabytes and ~a minute at 512^3)
        k = (near % N).astype(np.float32)
        j = ((near // N) % N).astype(np.float32)
        i = (near // (N * N)).astype(np.float32)
        pts = np.stack([i, j, k], axis=-1) / (N - 1) * 2.0 - 1.0
        g = _query_chunked(_grad_chunk_fn(cfg, signed), params["udf"], pts)
        normals[near] = -g
    return udf.reshape(N, N, N), normals.reshape(N, N, N, 3)


def query_udf_at(params, cfg: UDFNetworkConfig, pts: np.ndarray,
                 signed: bool = False) -> np.ndarray:
    return _query_chunked(_udf_chunk_fn(cfg, signed), params["udf"],
                          pts.astype(np.float32))


def _linear_to_points(idx: np.ndarray, N: int) -> np.ndarray:
    k = (idx % N).astype(np.float32)
    j = ((idx // N) % N).astype(np.float32)
    i = (idx // (N * N)).astype(np.float32)
    return np.stack([i, j, k], axis=-1) / (N - 1) * 2.0 - 1.0


def udf_and_normals_grid_incremental(
    params, cfg: UDFNetworkConfig, resolution: int, cache: dict | None = None,
    *, signed: bool = False,
    full_refill_every: int = 8, drift_refill_ratio: float = 0.5,
) -> Tuple[np.ndarray, np.ndarray, dict]:
    """Incremental MeshUDF grid fill (ref: extract_mesh.py:108-166).

    On the first call (or cache mismatch) this is a full fill; on later
    calls only the cached `indices` — the voxels surrounding the previous
    extraction's surface — are re-queried (UDF value + negated normalized
    gradient), on the assumption that the field changed little between
    extractions. Returns (udf [N³], normals [N³,3], cache); pass the cache
    back in, after `meshudf.next_update_indices` has refreshed its
    "indices" entry.

    Staleness guards (values outside the re-queried band are cached and can
    silently distort the mesh if the field drifts more than a voxel between
    extractions): a full refill is forced every `full_refill_every`
    incremental calls, and immediately when the re-queried band's mean
    |Δudf| exceeds `drift_refill_ratio`·voxel_size.
    """
    N = resolution
    if (
        cache is None
        or cache.get("indices") is None
        or cache.get("udf") is None
        or cache["udf"].size != N ** 3
        or (full_refill_every > 0
            and cache.get("incr_count", 0) >= full_refill_every)
    ):
        udf3, nrm3 = udf_and_normals_grid(params, cfg, N, signed)
        cache = {
            "udf": udf3.reshape(-1).copy(),
            "normals": nrm3.reshape(-1, 3).copy(),
            "indices": None,
            "incr_count": 0,
        }
        return udf3, nrm3, cache

    idx = np.unique(np.asarray(cache["indices"], np.int64))
    idx = idx[(idx >= 0) & (idx < N ** 3)]
    pts = _linear_to_points(idx, N)
    new_udf = _query_chunked(_udf_chunk_fn(cfg, signed), params["udf"], pts)
    voxel = 2.0 / (N - 1)
    drift = float(np.abs(new_udf - cache["udf"][idx]).mean()) if idx.size else 0.0
    if drift > drift_refill_ratio * voxel:
        # the field moved more than the band covers: stale cached values
        # outside the band would distort the mesh — refill everything
        udf3, nrm3 = udf_and_normals_grid(params, cfg, N, signed)
        cache = {
            "udf": udf3.reshape(-1).copy(),
            "normals": nrm3.reshape(-1, 3).copy(),
            "indices": None,
            "incr_count": 0,
        }
        return udf3, nrm3, cache
    cache["incr_count"] = cache.get("incr_count", 0) + 1
    cache["udf"][idx] = new_udf
    g = _query_chunked(_grad_chunk_fn(cfg, signed), params["udf"], pts)
    # keep the slow-fill contract (gradients only inside the 2-voxel band,
    # zero elsewhere) so an unchanged field re-extracts identically; the
    # reference writes gradients at every re-queried index regardless
    # (ref: extract_mesh.py:159) — a fringe-band delta only
    voxel_size = 2.0 / (N - 1)
    band = (new_udf < 2 * voxel_size)[:, None]
    cache["normals"][idx] = np.where(band, -g, 0.0)
    return (
        cache["udf"].reshape(N, N, N),
        cache["normals"].reshape(N, N, N, 3),
        cache,
    )
