"""Camera matrix decomposition.

IDR-convention scenes store, per view, a 3x4 projection ``P = K @ [R|t]``
(the top of ``world_mat_i @ scale_mat_i``). We recover K (normalized so
K[2,2]=1) and the camera-to-world pose. The reference uses
``cv.decomposeProjectionMatrix`` (ref: dataset/dataset.py:14-35); we do the
same when OpenCV is importable and otherwise fall back to a numpy RQ
decomposition (identical result on well-formed projection matrices).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def _rq_decompose(M: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """RQ decomposition of a 3x3 matrix: M = R @ Q with R upper-triangular
    and Q orthonormal. Built from numpy's QR via the flip trick."""
    P = np.fliplr(np.eye(3))
    q, r = np.linalg.qr((P @ M).T)
    R = P @ r.T @ P
    Q = P @ q.T
    # make the diagonal of R positive (absorb signs into Q)
    signs = np.sign(np.diag(R))
    signs[signs == 0] = 1.0
    R = R * signs[None, :]
    Q = Q * signs[:, None]
    return R, Q


def decompose_projection(P: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Split a 3x4 projection into (intrinsics 4x4, c2w pose 4x4).

    Matches the reference's ``load_K_Rt_from_P``
    (ref: dataset/dataset.py:14-35): K is scaled so K[2,2] = 1, the pose is
    camera-to-world (R transposed, camera center as translation).
    """
    P = np.asarray(P, np.float64)[:3, :4]
    try:
        import cv2 as cv

        K, R, t = cv.decomposeProjectionMatrix(P)[:3]
        center = (t[:3] / t[3])[:, 0]
    except Exception:
        K, R = _rq_decompose(P[:3, :3])
        # camera center: P @ [c, 1]^T = 0
        center = -np.linalg.inv(P[:3, :3]) @ P[:3, 3]
        # cv's R is world-to-camera rotation
    K = K / K[2, 2]
    intrinsics = np.eye(4, dtype=np.float32)
    intrinsics[:3, :3] = K.astype(np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = R.T.astype(np.float32)
    pose[:3, 3] = center.astype(np.float32)
    return intrinsics, pose
