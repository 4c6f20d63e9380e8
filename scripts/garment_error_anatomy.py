"""Spatial anatomy of a garment benchmark mesh's error, on CPU in seconds.

For every extracted vertex inside the skirt's y-slab, the benchmark
scene's analytic implicit gives a SIGNED normal-direction error
s = f(v)/|grad f(v)| (negative = inside the drape sheet). Splitting its
distribution by height band and by fold phase separates the candidate
stories for the residual ~3.4e-3 Chamfer (RESULTS.md):

  * uniform radial bias (|mean| ~ residual, std small)  -> a global
    training equilibrium (sparse lift / transition bias) — a schedule or
    formulation lever could remove it;
  * zero-mean noise (std ~ residual)                    -> localization
    noise at the photometric limit of the flat-shaded renders;
  * fold- or hem-concentrated error                     -> visibility- or
    curvature-limited, no global lever.

Usage: python scripts/garment_error_anatomy.py --ply <mesh.ply> [--csv out]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from neuraludf_tpu.data import synthetic as syn
from neuraludf_tpu.mesh.ply import load_ply


def signed_error(verts: np.ndarray) -> np.ndarray:
    f = syn._garment_f(verts)
    g = syn._numeric_normal.__wrapped__ if hasattr(syn._numeric_normal, "__wrapped__") else None
    # |grad f| via central differences (the normal helper normalizes, so
    # recompute the magnitude here)
    eps = 1e-4
    grad = np.empty_like(verts)
    for a in range(3):
        off = np.zeros((1, 3), np.float32)
        off[0, a] = eps
        grad[:, a] = (syn._garment_f(verts + off) - syn._garment_f(verts - off)) / (2 * eps)
    mag = np.maximum(np.linalg.norm(grad, axis=-1), 1e-6)
    return f / mag


def stats(tag, s):
    if len(s) == 0:
        print(f"{tag:>28}: (empty)")
        return
    q = np.percentile(s, [5, 50, 95])
    print(f"{tag:>28}: n={len(s):7d} mean={s.mean()*1e3:+7.3f}e-3 "
          f"std={s.std()*1e3:6.3f}e-3 p5/p50/p95={q[0]*1e3:+6.2f}/"
          f"{q[1]*1e3:+6.2f}/{q[2]*1e3:+6.2f}e-3 |s|mean={np.abs(s).mean()*1e3:6.3f}e-3")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ply", required=True)
    ap.add_argument("--band_margin", type=float, default=0.01,
                    help="exclude vertices this close to the open rims")
    args = ap.parse_args()

    verts, _ = load_ply(args.ply)
    verts = verts.astype(np.float32)
    y = verts[:, 1]
    inside = (y >= syn.GARMENT_Y_BOT + args.band_margin) & (
        y <= syn.GARMENT_Y_TOP - args.band_margin)
    v = verts[inside]
    s = signed_error(v)

    # spurious interior geometry (|s| >> surface noise) vs on-surface error
    on = np.abs(s) < 0.02
    print(f"vertices: {len(verts)} total, {inside.sum()} in slab, "
          f"{(~on).sum()} off-surface (|s|>=0.02)")
    stats("slab, all", s)
    stats("slab, on-surface", s[on])

    # height bands (waist -> hem)
    sfrac = (syn.GARMENT_Y_TOP - v[:, 1]) / (syn.GARMENT_Y_TOP - syn.GARMENT_Y_BOT)
    for lo, hi in [(0.0, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0)]:
        m = on & (sfrac >= lo) & (sfrac < hi)
        stats(f"band s=[{lo:.2f},{hi:.2f})", s[m])

    # fold phase: ridges (outward cos>0.5), valleys (cos<-0.5), flanks
    theta = np.arctan2(v[:, 2], v[:, 0])
    phase = np.cos(7.0 * theta + 0.8 * np.sin(2.0 * theta + 1.3))
    for tag, m in [("fold ridge (cos>0.5)", phase > 0.5),
                   ("fold flank", (phase >= -0.5) & (phase <= 0.5)),
                   ("fold valley (cos<-0.5)", phase < -0.5)]:
        stats(tag, s[on & m])

    # rim bands (excluded above) for completeness
    rim = (~inside) & (np.abs(verts[:, 1] - syn.GARMENT_Y_BOT) < 0.02)
    stats("hem rim band", signed_error(verts[rim]) if rim.any() else np.array([]))


if __name__ == "__main__":
    main()
