"""Zero-level bias probe: evaluate a trained UDF along the analytic GT
surface normals (CPU backend; no chip needed).

Reports (a) UDF value at the true surface, (b) the offset of the per-point
UDF minimum along the normal, (c) the minimum's value. Separates the three
failure modes of a bad Chamfer score:

  - displaced zero-set (argmin offset != 0, min ~ 0): the rendered
    surface converged off the true sheet — typically the NeuS-style
    transition bias at un-annealed variance (expected magnitude ~ the
    logged `variance` scalar; shrinks with longer schedules);
  - lifted minimum (min >> 0): the field never reaches zero — extraction
    (pseudo-sign voting) still works but vertices scatter;
  - extraction artifacts (field unbiased, mesh off): look at the mesh
    pipeline instead.

Usage: python scripts/udf_bias_probe.py <ckpt> <conf> <case> <scene_kind>
e.g.:  python scripts/udf_bias_probe.py \
           exp/benchmark_garment/garment_ft50k/udf_garment/checkpoints/ckpt_050000.ckpt \
           confs/udf_garment_blending.conf garment garment
"""
import pickle
import sys

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np

sys.path.insert(0, ".")
from neuraludf_tpu import config as config_mod
from neuraludf_tpu.data.synthetic import gt_surface_points
from neuraludf_tpu.nets import fields


def main(ckpt, conf, case, kind, n=20000):
    cfg = config_mod.load(conf, case=case)
    with open(ckpt, "rb") as f:
        params = pickle.load(f)["params"]
    udf_p = params["udf"]
    gt = gt_surface_points(kind, n=n).astype(np.float32)
    u, _, g = fields.distance_value_and_gradient(
        udf_p, jax.numpy.asarray(gt), cfg.model.udf_network)
    u = np.asarray(u).ravel()
    print(f"UDF at GT surface: mean {u.mean():.5f} med {np.median(u):.5f} "
          f"p10 {np.percentile(u, 10):.5f} p90 {np.percentile(u, 90):.5f}")
    gn = np.array(np.asarray(g), copy=True)
    gn /= np.linalg.norm(gn, axis=-1, keepdims=True) + 1e-9
    ts = np.linspace(-0.012, 0.012, 13)
    us = []
    for t in ts:
        pts = gt + np.float32(t) * gn
        us.append(np.asarray(fields.distance_value_and_gradient(
            udf_p, jax.numpy.asarray(pts), cfg.model.udf_network)[0]).ravel())
    us = np.stack(us)
    mins = ts[np.argmin(us, axis=0)]
    print(f"argmin offset along normal: mean {mins.mean():+.5f} "
          f"med {np.median(mins):+.5f}, frac |t|<=0.002: {(np.abs(mins) <= 0.002).mean():.3f}")
    print(f"UDF at per-point argmin: mean {us.min(0).mean():.5f} "
          f"med {np.median(us.min(0)):.5f}")
    for i, t in enumerate(ts):
        print(f"  t={t:+.4f}: med UDF {np.median(us[i]):.5f}")


if __name__ == "__main__":
    main(*sys.argv[1:5])
